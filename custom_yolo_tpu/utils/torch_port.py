"""PyTorch-reference checkpoint interop.

The reference implementation saves ``torch.save({"model_state":
model.state_dict(), ...})`` checkpoints (``src/training/utils_train.py:38-56``)
and reloads them with ``Model.load_weights`` (``src/model/model_builder.py:
60-77``). This module converts those state dicts to this framework's flax
variable trees and back, so a user migrating from the reference can carry
their trained weights — and so the test suite can prove numerical parity of
the whole model stack against the *live* reference network rather than a
transcription (``tests/test_torch_port.py``).

Layout rules (torch → flax):

* conv weights: OIHW ``(cout, cin/g, kh, kw)`` → HWIO ``(kh, kw, cin/g,
  cout)`` (pure transpose; holds for grouped/depthwise convs too);
* ``Conv.norm`` (BatchNorm2d) → the ``bn`` sub-tree: ``weight/bias`` into
  ``params``, ``running_mean/running_var`` into ``batch_stats``;
  ``num_batches_tracked`` has no analogue (flax momentum is constant) and is
  regenerated as 0 on export;
* the reference's frozen DFL conv (``model_blocks.py:255-280``, weights
  pinned to ``arange(reg_max)``) is parameter-free here
  (``ops/dfl.py``) — validated on import, synthesized on export;
* module naming: the reference uses ``nn.Sequential`` indices
  (``net.p2.1.res_m.0.conv1.conv.weight``); this framework uses semantic
  names (``net/p2_csp/m0/conv1/conv/kernel``). The map below is exact and
  bidirectional.

Import targets the *standard unfused* tree (what ``Detector.init`` builds).
Fused / merged / quantized / s2d trees are derived from it afterwards via the
usual transforms (``Detector.fuse()`` etc.).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Tuple

import numpy as np

# Backbone stage -> reference nn.Sequential slot (src/model/backbone.py:37-52)
_STAGE = {
    "p1_conv": ("p1", "0"),
    "p2_conv": ("p2", "0"), "p2_csp": ("p2", "1"),
    "p3_conv": ("p3", "0"), "p3_csp": ("p3", "1"),
    "p4_conv": ("p4", "0"), "p4_csp": ("p4", "1"),
    "p5_conv": ("p5", "0"), "p5_csp": ("p5", "1"),
    "p5_sppf": ("p5", "2"), "p5_psa": ("p5", "3"),
}

# PSABlock / Attention sub-module names (src/model/model_blocks.py:200-224,
# :158-198): reference PSABlock.conv1 IS the Attention module, conv2 is the
# two-conv MLP Sequential; reference Attention.conv1/conv2 are the depthwise
# positional conv and the output projection.
_INNER = {
    "attn": ("conv1",),
    "ffn1": ("conv2", "0"),
    "ffn2": ("conv2", "1"),
    "pe": ("conv1",),
    "proj": ("conv2",),
}

# Head tower slots (src/model/head.py:45-61): box = Sequential(Conv, Conv,
# Conv2d); cls = Sequential(Conv dw, Conv pw, Conv dw, Conv pw, Conv2d).
_HEAD_RE = re.compile(r"^(box|cls)(\d+)_(\w+)$")
_HEAD_SLOT = {
    "box": {"conv1": "0", "conv2": "1", "out": "2"},
    "cls": {"dw1": "0", "pw1": "1", "dw2": "2", "pw2": "3", "out": "4"},
}

_SEQ_RE = re.compile(r"^(?:m|res)(\d+)$")  # C3K2/PSA m{i}, C3K res{i}


def _torch_segments(name: str, path: Tuple[str, ...]) -> Tuple[str, ...]:
    """Flax module name → reference state_dict key segment(s)."""
    if len(path) == 1 and path[0] == "net" and name in _STAGE:
        return _STAGE[name]
    if len(path) == 1 and path[0] == "head":
        m = _HEAD_RE.match(name)
        if m:
            tower, level, part = m.groups()
            return (tower, level, _HEAD_SLOT[tower][part])
    m = _SEQ_RE.match(name)
    if m:
        return ("res_m", m.group(1))
    if name in _INNER:
        return _INNER[name]
    # conv1/conv2/conv3/cv1/cv2/qkv, fpn h1..h6: same name on both sides
    return (name,)


Entry = Tuple[Tuple[str, ...], str, str]  # (flax path incl. collection,
#                                            torch key, kind)


def _leaf_entries(params: Dict[str, Any]) -> List[Entry]:
    """Enumerate every weight of the standard (unfused) tree with its
    reference state_dict key. Raises on trees that have been transformed
    (fused/merged/quantized) — import/export work on the init-shaped tree."""
    entries: List[Entry] = []

    def walk(node: Dict[str, Any], flax_path: Tuple[str, ...],
             torch_path: Tuple[str, ...]) -> None:
        if "conv" in node and isinstance(node["conv"], dict) \
                and "kernel" in node["conv"]:
            tp = ".".join(torch_path)
            if "bias" in node["conv"] or "bn" not in node:
                raise ValueError(
                    f"{'/'.join(flax_path)} looks fused/transformed — "
                    "torch interop needs the standard unfused tree "
                    "(Detector.init / pre-fuse checkpoint)")
            entries.append((("params",) + flax_path + ("conv", "kernel"),
                            tp + ".conv.weight", "kernel"))
            entries.append((("params",) + flax_path + ("bn", "scale"),
                            tp + ".norm.weight", "vector"))
            entries.append((("params",) + flax_path + ("bn", "bias"),
                            tp + ".norm.bias", "vector"))
            entries.append((("batch_stats",) + flax_path + ("bn", "mean"),
                            tp + ".norm.running_mean", "vector"))
            entries.append((("batch_stats",) + flax_path + ("bn", "var"),
                            tp + ".norm.running_var", "vector"))
            return
        if "kernel" in node:  # plain conv with bias (head 1x1 finals)
            tp = ".".join(torch_path)
            entries.append((("params",) + flax_path + ("kernel",),
                            tp + ".weight", "kernel"))
            entries.append((("params",) + flax_path + ("bias",),
                            tp + ".bias", "vector"))
            return
        for name in node:
            if not isinstance(node[name], dict):
                raise ValueError(
                    f"unexpected leaf {'/'.join(flax_path + (name,))} — "
                    "transformed trees (quantized/merged) are not "
                    "importable; convert the standard tree instead")
            walk(node[name], flax_path + (name,),
                 torch_path + _torch_segments(name, flax_path))

    walk(params, (), ())
    return entries


def _get(tree: Dict[str, Any], path: Iterable[str]):
    for key in path:
        tree = tree[key]
    return tree


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    for key in path[:-1]:
        tree = tree.setdefault(key, {})
    tree[path[-1]] = value


def normalize_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """torch tensors → numpy; strip DDP/compile wrappers (``module.``,
    ``_orig_mod.``) the way reference users encounter them."""
    out = {}
    for key, value in state_dict.items():
        for prefix in ("module.", "_orig_mod."):
            if key.startswith(prefix):
                key = key[len(prefix):]
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        out[key] = np.asarray(value)
    return out


def from_torch_state_dict(state_dict: Dict[str, Any],
                          template: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``model.state_dict()`` → ``{"params", "batch_stats"}``
    matching ``template`` (a ``Detector.init()`` tree — defines the expected
    structure, shapes, and dtypes). Every template weight must be present in
    the state dict and every state-dict weight must be consumed (the frozen
    DFL conv and ``num_batches_tracked`` counters excepted) — silent partial
    loads are how migrations go wrong."""
    import jax.numpy as jnp

    sd = normalize_state_dict(state_dict)
    params_t = template["params"]
    params_t = params_t.unfreeze() if hasattr(params_t, "unfreeze") \
        else params_t
    entries = _leaf_entries(dict(params_t))

    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    missing, mismatched = [], []
    consumed = set()
    for flax_path, torch_key, kind in entries:
        if torch_key not in sd:
            missing.append(torch_key)
            continue
        consumed.add(torch_key)
        value = sd[torch_key]
        if kind == "kernel":
            value = np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        ref = _get(template, flax_path)
        if tuple(value.shape) != tuple(ref.shape):
            mismatched.append(
                f"{torch_key}: torch {tuple(value.shape)} vs "
                f"expected {tuple(ref.shape)}")
            continue
        _set(out[flax_path[0]], flax_path[1:],
             jnp.asarray(value, dtype=ref.dtype))

    extra = [k for k in sd if k not in consumed
             and not k.endswith("num_batches_tracked")
             and not k.startswith("dfl.") and ".dfl." not in k]
    problems = []
    if missing:
        problems.append(f"missing from state dict: {sorted(missing)[:8]}"
                        f"{' …' if len(missing) > 8 else ''}")
    if extra:
        problems.append(f"unconsumed torch keys: {sorted(extra)[:8]}"
                        f"{' …' if len(extra) > 8 else ''}")
    if mismatched:
        problems.append("shape mismatches: " + "; ".join(mismatched[:8]))
    if problems:
        raise ValueError("torch checkpoint does not match this model "
                         "configuration — " + " | ".join(problems))
    # frozen DFL sanity: if present it must be the arange projection
    for key, value in sd.items():
        if key.endswith("dfl.conv.weight"):
            expect = np.arange(value.shape[1], dtype=np.float32
                               ).reshape(value.shape)
            if not np.allclose(value, expect):
                raise ValueError(
                    f"{key} is not the frozen arange DFL projection — "
                    "this checkpoint is not from the reference architecture")
    return out


def to_torch_state_dict(variables: Dict[str, Any],
                        reg_max: int = 16) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_torch_state_dict`: emit a numpy state dict the
    reference model loads with ``load_state_dict(strict=True)`` (the frozen
    DFL weight and zeroed ``num_batches_tracked`` counters are
    synthesized)."""
    import jax

    variables = jax.device_get(variables)
    params = variables["params"]
    params = params.unfreeze() if hasattr(params, "unfreeze") else params
    if "batch_stats" not in variables:
        raise ValueError("export needs the unfused tree "
                         "(params + batch_stats)")
    out: Dict[str, np.ndarray] = {}
    for flax_path, torch_key, kind in _leaf_entries(dict(params)):
        value = np.asarray(_get(variables, flax_path), dtype=np.float32)
        if kind == "kernel":
            value = np.transpose(value, (3, 2, 0, 1))  # HWIO -> OIHW
        out[torch_key] = value
        if torch_key.endswith(".norm.running_var"):
            out[torch_key.replace("running_var", "num_batches_tracked")] = \
                np.asarray(0, dtype=np.int64)
    out["head.dfl.conv.weight"] = np.arange(
        reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint file (either a bare ``state_dict`` or the
    trainer's ``{"model_state": ...}`` wrapper, utils_train.py:50-56) into a
    numpy state dict. Requires torch (CPU build is enough)."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(checkpoint, dict) and "model_state" in checkpoint:
        checkpoint = checkpoint["model_state"]
    return normalize_state_dict(checkpoint)


def import_torch_weights(detector, path: str):
    """Load a reference torch checkpoint into a :class:`Detector` (the
    migration entry point; see ``scripts/import_torch.py``)."""
    if detector.variables is None:
        detector.init()
    variables = from_torch_state_dict(load_torch_checkpoint(path),
                                      detector.variables)
    detector.load_variables(variables)
    return detector
