"""Full detector composition + user-facing convenience wrapper.

Equivalent of the reference ``Model`` (``src/model/model_builder.py:13-139``):
Backbone + Neck + Head composition, conv-BN fusion for inference (:52-58),
checkpoint weight loading (:60-77), and a single-image ``inference`` API
(:79-139). TPU-first: the model is a pure flax module (params live outside),
fusion is a param-tree transform (no module surgery), and inference runs a
jitted decode + fixed-shape batched NMS instead of the torchvision kernel.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import unfreeze

from custom_yolo_tpu.core.dtypes import DTypePolicy, resolve_policy
from custom_yolo_tpu.models.backbone import Backbone
from custom_yolo_tpu.models.head import Head
from custom_yolo_tpu.models.neck import Neck
from custom_yolo_tpu.nn.blocks import BN_EPS
from custom_yolo_tpu.ops.boxes import dist2bbox
from custom_yolo_tpu.ops.dfl import dfl_decode
from custom_yolo_tpu.ops.nms import batched_nms, nms_to_lists

# ImageNet normalization (reference src/data/transforms.py:12-13)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class YoloModel(nn.Module):
    """Backbone + Neck + Head. Input NHWC float; output
    (preds (N, M, 4*reg_max+nc), anchors (M, 2), strides (M, 1))."""

    width: Tuple[int, ...]
    depth: Tuple[int, ...]
    csp: Tuple[bool, ...]
    num_classes: int
    reg_max: int = 16
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    # PartitionSpec pinning every ConvBN activation batch-sharded under a
    # mesh (see parallel/sharding.py:activation_spec) — kills the GSPMD
    # involuntary-rematerialization pathologies in the fsdp backward pass
    act_spec: Optional[Any] = None
    fused: bool = False
    # rematerialize backbone/neck activations in the backward pass — trades
    # FLOPs for HBM (jax.checkpoint; lets large presets train at batch
    # sizes that would otherwise OOM)
    remat: bool = False
    # MXU-efficient stem: space-to-depth + equivalent 2×2 conv (exact
    # transform of the reference stem — see backbone.stem_kernel_to_s2d)
    s2d_stem: bool = False
    # int8 serving (requires fused=True): params from
    # ops.quant.quantize_fused_params; v5e int8 MXU is 2× bf16
    quantized: bool = False
    # backbone stages kept in bf16 under quantized=True — the measured
    # HBM-bound losers (int8 requant is pure overhead where the MXU is
    # starved; per-stage data in docs/PERF.md). Must match the `skip`
    # passed to quantize_fused_params.
    quant_skip: Tuple[str, ...] = ()
    # horizontal C3K conv1/conv2 merge (exact, serving): params from
    # merge_c3k_params — see nn.blocks.C3K
    merged: bool = False
    # differentiable Pallas PSA attention in training (custom VJP; the
    # fused serving path uses the kernel regardless) — measured train-step
    # delta in docs/PERF.md
    pallas_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        backbone_cls, neck_cls = Backbone, Neck
        if self.remat:
            backbone_cls = nn.remat(Backbone, static_argnums=(2,))
            neck_cls = nn.remat(Neck, static_argnums=(2,))
        x = x.astype(self.policy.compute_dtype)
        feats = backbone_cls(self.width, self.depth, self.csp, name="net",
                             s2d_stem=self.s2d_stem, merged=self.merged,
                             pallas_attention=self.pallas_attention,
                             quant_skip=self.quant_skip, **kw)(x, train)
        feats = neck_cls(self.width, self.depth, self.csp, name="fpn",
                         merged=self.merged, **kw)(feats, train)
        preds, anchors, strides = Head(
            self.num_classes,
            (self.width[3], self.width[4], self.width[5]),
            reg_max=self.reg_max, name="head", **kw)(feats, train)
        return preds, anchors, strides


def _fold_convbn(tree: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively fold BatchNorm into the preceding conv wherever a ConvBN
    {conv, bn} pair exists (math identical to reference ``fuse_conv``,
    model_utils.py:72-118, generalized to grouped convs)."""
    out = {}
    for key, value in tree.items():
        if (isinstance(value, dict) and "conv" in value and "bn" in value
                and isinstance(value["conv"], dict)
                and "kernel" in value["conv"]):
            kernel = value["conv"]["kernel"]  # (kh, kw, cin/g, cout)
            gamma = value["bn"]["scale"]
            beta = value["bn"]["bias"]
            mean = stats[key]["bn"]["mean"]
            var = stats[key]["bn"]["var"]
            scale = gamma / jnp.sqrt(var + BN_EPS)           # (cout,)
            fused_kernel = kernel * scale                     # bcast over cout
            fused_bias = beta - mean * scale
            out[key] = {"conv": {"kernel": fused_kernel,
                                 "bias": fused_bias}}
        elif isinstance(value, dict):
            out[key] = _fold_convbn(value, stats.get(key, {}))
        else:
            out[key] = value
    return out


def fuse_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """{"params", "batch_stats"} → {"params"} with conv+BN folded.

    The fused tree must be applied with modules built with ``fused=True``
    semantics; :class:`Detector` handles this pairing. Inference-only
    (reference ``Model.fuse``, model_builder.py:52-58).
    """
    params = unfreeze(variables["params"]) if hasattr(
        variables["params"], "unfreeze") else dict(variables["params"])
    stats = variables.get("batch_stats", {})
    stats = unfreeze(stats) if hasattr(stats, "unfreeze") else dict(stats)
    return {"params": _fold_convbn(params, stats)}


def convert_stem_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Variables of a standard YoloModel → variables for the same model with
    ``s2d_stem=True`` (exact: only the p1 kernel is re-expressed — works on
    fused and unfused trees alike)."""
    from custom_yolo_tpu.models.backbone import stem_kernel_to_s2d

    def convert(tree):
        out = {}
        for key, value in tree.items():
            if key == "net" and isinstance(value, dict) \
                    and "p1_conv" in value:
                p1 = dict(value["p1_conv"])
                if "conv" in p1 and "kernel" in p1["conv"]:
                    conv = dict(p1["conv"])
                    conv["kernel"] = stem_kernel_to_s2d(conv["kernel"])
                    p1["conv"] = conv
                out[key] = {**value, "p1_conv": p1}
            elif isinstance(value, dict):
                out[key] = convert(value)
            else:
                out[key] = value
        return out

    return convert(unfreeze(variables) if hasattr(variables, "unfreeze")
                   else dict(variables))


def merge_c3k_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fused (optionally quantized) param tree → tree for ``merged=True``
    modules: every C3K's ``conv1``/``conv2`` (two convs reading the SAME
    input, each emitting out_ch/2 channels — nn/blocks.py C3K) become one
    ``conv12`` with kernels/biases/scales concatenated along the output-
    channel axis. Exact: per-output-channel conv(+BN-fold)(+int8 scale) math
    is independent, so concatenation changes nothing but the matmul width.

    C3K2 also owns ``conv1``/``conv2`` but has ``m{i}`` children instead of
    ``res0`` — the ``res0`` key is the C3K discriminator. Mirrors the
    module's ``MERGE_MIN_HALF`` self-gate: narrow C3Ks (half < 64) keep
    their separate convs (the merged split is a measured pessimization
    there — see nn/blocks.py)."""
    from custom_yolo_tpu.nn.blocks import MERGE_MIN_HALF

    def is_c3k(node):
        return (isinstance(node, dict) and "conv1" in node
                and "conv2" in node and "res0" in node
                and node["conv1"]["conv"]["kernel"].shape[-1]
                >= MERGE_MIN_HALF)

    def merge_leaf(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
        out = {k: jnp.concatenate([a[k], b[k]], axis=-1)
               for k in a if k != "in_scale"}
        if "in_scale" in a:
            # conv1/conv2 read the SAME tensor: calibrated input scales are
            # equal; max is exact under any calibration asymmetry
            out["in_scale"] = jnp.maximum(a["in_scale"], b["in_scale"])
        return out

    def walk(tree):
        out = {}
        for key, value in tree.items():
            if not isinstance(value, dict):
                out[key] = value
                continue
            if is_c3k(value):
                node = {k: walk(v) if isinstance(v, dict) else v
                        for k, v in value.items()
                        if k not in ("conv1", "conv2")}
                assert "bn" not in value["conv1"], \
                    "merge_c3k_params expects a fused tree (fuse first)"
                node["conv12"] = {"conv": merge_leaf(value["conv1"]["conv"],
                                                     value["conv2"]["conv"])}
                out[key] = node
            else:
                out[key] = walk(value)
        return out

    return walk(unfreeze(params) if hasattr(params, "unfreeze")
                else dict(params))


def preprocess_image(image, input_size: Tuple[int, int] = (640, 640),
                     letterbox: bool = False, return_geometry: bool = False):
    """Host-side single-image preprocessing matching the reference val
    transform (``src/data/transforms.py:16-24``): squash-resize (or
    aspect-preserving letterbox with 114-gray padding) to input_size, scale
    to [0,1], ImageNet-normalize. Returns NHWC (1,H,W,3), plus
    ``(scale (2,), offset (2,))`` — model = orig*scale + offset — when
    ``return_geometry``."""
    from PIL import Image

    th, tw = input_size
    if isinstance(image, str):
        image = Image.open(image).convert("RGB")
    if isinstance(image, Image.Image):
        orig_w, orig_h = image.size
        if letterbox:
            s = min(th / max(orig_h, 1), tw / max(orig_w, 1))
            nw, nh = int(round(orig_w * s)), int(round(orig_h * s))
            dx, dy = (tw - nw) // 2, (th - nh) // 2
            canvas = np.full((th, tw, 3), 114, np.uint8)
            canvas[dy:dy + nh, dx:dx + nw] = np.asarray(
                image.resize((nw, nh), Image.Resampling.BILINEAR), np.uint8)
            arr = canvas.astype(np.float32) / 255.0
            scale = np.asarray([s, s], np.float32)
            offset = np.asarray([dx, dy], np.float32)
        else:
            arr = np.asarray(
                image.resize((tw, th), Image.Resampling.BILINEAR),
                dtype=np.float32) / 255.0
            scale = np.asarray([tw / max(orig_w, 1), th / max(orig_h, 1)],
                               np.float32)
            offset = np.zeros(2, np.float32)
    else:
        # array input: keep float precision (no uint8 round-trip)
        arr = np.asarray(image, dtype=np.float32)
        if arr.max() > 1.5:  # assume uint8 range
            arr = arr / 255.0
        orig_h, orig_w = arr.shape[:2]
        if letterbox:
            s = min(th / max(orig_h, 1), tw / max(orig_w, 1))
            nw, nh = int(round(orig_w * s)), int(round(orig_h * s))
            dx, dy = (tw - nw) // 2, (th - nh) // 2
            resized = np.asarray(jax.image.resize(
                jnp.asarray(arr), (nh, nw, arr.shape[-1]), "bilinear"))
            canvas = np.full((th, tw, arr.shape[-1]), 114.0 / 255.0,
                             np.float32)
            canvas[dy:dy + nh, dx:dx + nw] = resized
            arr = canvas
            scale = np.asarray([s, s], np.float32)
            offset = np.asarray([dx, dy], np.float32)
        else:
            if arr.shape[:2] != (th, tw):
                arr = np.asarray(jax.image.resize(
                    jnp.asarray(arr), (th, tw, arr.shape[-1]), "bilinear"))
            scale = np.asarray([tw / max(orig_w, 1), th / max(orig_h, 1)],
                               np.float32)
            offset = np.zeros(2, np.float32)
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    if return_geometry:
        return arr[None], scale, offset
    return arr[None]


@functools.partial(jax.jit, static_argnames=("reg_max",))
def decode_raw_predictions(preds: jnp.ndarray, anchors: jnp.ndarray,
                           strides: jnp.ndarray, reg_max: int = 16):
    """Raw head output → (boxes_xyxy (N, M, 4) px, cls_scores (N, M, nc)
    sigmoid). The decode stage of reference ``Model.inference``
    (model_builder.py:123-133): DFL expectation → dist2bbox → ×stride."""
    preds = preds.astype(jnp.float32)
    dist = preds[..., : 4 * reg_max]
    cls_logits = preds[..., 4 * reg_max:]
    ltrb = dfl_decode(dist, reg_max)                  # (N, M, 4)
    boxes = dist2bbox(ltrb, anchors[None], xywh=False) * strides[None]
    return boxes, jax.nn.sigmoid(cls_logits)


class Detector:
    """Stateful convenience wrapper: config + params + jitted apply.

    Mirrors the surface of the reference ``Model`` (build / load_weights /
    fuse / inference) for users migrating from it.
    """

    def __init__(self, width: Sequence[int], depth: Sequence[int],
                 csp: Sequence[bool], num_classes: int, reg_max: int = 16,
                 precision: str = "bfloat16",
                 input_size: Tuple[int, int] = (640, 640)):
        self.policy = resolve_policy(precision)
        self.module = YoloModel(
            width=tuple(width), depth=tuple(depth), csp=tuple(csp),
            num_classes=num_classes, reg_max=reg_max, policy=self.policy)
        self.num_classes = num_classes
        self.reg_max = reg_max
        self.input_size = tuple(input_size)
        self.variables: Optional[Dict[str, Any]] = None
        self._fused = False
        self._tpu_optimized = False
        self._serve_cache: Dict = {}

        self._apply_eval = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))

    def init(self, seed: int = 0, batch_size: int = 1) -> Dict[str, Any]:
        x = jnp.zeros((batch_size, *self.input_size, self.module.width[0]),
                      self.policy.compute_dtype)
        self.variables = self.module.init(jax.random.key(seed), x,
                                          train=False)
        return self.variables

    def load_variables(self, variables: Dict[str, Any]) -> None:
        fused = "batch_stats" not in variables
        self.variables = variables
        if fused != self._fused:
            self.module = self.module.clone(fused=fused)
            self._apply_eval = jax.jit(
                lambda v, x: self.module.apply(v, x, train=False))
            self._serve_cache.clear()
        self._fused = fused

    def _transform_flags(self) -> Dict[str, bool]:
        from custom_yolo_tpu.ops.quant import has_static_scales
        return {"fused": self._fused, "s2d_stem": self.module.s2d_stem,
                "merged": self.module.merged,
                "quantized": self.module.quantized,
                "quant_skip": list(self.module.quant_skip),
                "static_quant": bool(
                    self.variables is not None
                    and self.module.quantized
                    and has_static_scales(self.variables["params"]))}

    def save_weights(self, path: str) -> None:
        """Persist the current variables (params [+ batch_stats]) to an
        orbax checkpoint directory (reference ``torch.save`` analogue).
        A ``transforms.json`` sidecar records fuse/s2d/merge/quantize
        state so :meth:`load_weights` can rebuild the matching tree."""
        import json
        import os

        import orbax.checkpoint as ocp
        assert self.variables is not None
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path),
                       jax.device_get(self.variables))
        with open(os.path.join(path, "transforms.json"), "w") as f:
            json.dump(self._transform_flags(), f)

    def load_weights(self, path: str) -> "Detector":
        """Load variables saved by :meth:`save_weights` (reference
        ``Model.load_weights``, model_builder.py:60-77). Transformed
        checkpoints (fused / s2d / merged / quantized trees) are restored
        by replaying the recorded transforms on a fresh template."""
        import json
        import os

        import orbax.checkpoint as ocp
        if self.variables is None:
            self.init()
        template = jax.device_get(self.variables)
        flags = {}
        sidecar = os.path.join(path, "transforms.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                flags = json.load(f)
        if flags.get("fused") and "batch_stats" in template:
            template = fuse_params(template)
        if flags.get("s2d_stem") and not self.module.s2d_stem:
            template = convert_stem_variables(template)
        if flags.get("merged"):
            template = {**template,
                        "params": merge_c3k_params(template["params"])}
        if flags.get("quantized"):
            from custom_yolo_tpu.ops.quant import (bake_static_scales,
                                                   quantize_fused_params)
            template = {"params": quantize_fused_params(
                template["params"],
                skip=tuple(flags.get("quant_skip", ())))}
            if flags.get("static_quant"):
                template = {"params": bake_static_scales(template["params"])}
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), template)
        self.module = self.module.clone(
            s2d_stem=bool(flags.get("s2d_stem", self.module.s2d_stem)),
            merged=bool(flags.get("merged", False)),
            quantized=bool(flags.get("quantized", False)),
            quant_skip=tuple(flags.get("quant_skip", ())))
        self._tpu_optimized = bool(flags.get("merged")
                                   or flags.get("s2d_stem"))
        self.load_variables(restored)
        # load_weights may clone the module on flags (s2d/merged/quantized)
        # that leave the fused bit unchanged — load_variables then skips its
        # cache clear and stale serve_fn closures would apply the new param
        # tree through the OLD module. Clear unconditionally (mirrors
        # fuse()/quantize()/optimize_for_tpu()).
        self._serve_cache.clear()
        self._apply_eval = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))
        return self

    def fuse(self) -> "Detector":
        """Fold conv+BN for inference (reference model_builder.py:52-58):
        transforms the param tree and swaps in the ``fused=True`` module so
        each ConvBN runs conv(+bias)+act only."""
        assert self.variables is not None
        if self._fused:
            return self
        self.variables = fuse_params(self.variables)
        self.module = self.module.clone(fused=True)
        self._fused = True
        if self._tpu_optimized and not self.module.merged:
            self.variables = {"params": merge_c3k_params(
                self.variables["params"])}
            self.module = self.module.clone(merged=True)
        self._apply_eval = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))
        self._serve_cache.clear()
        return self

    def quantize(self, stochastic: bool = False,
                 skip: Any = "auto") -> "Detector":
        """Switch to int8 serving: fuse (if needed), quantize ConvBN
        kernels per-output-channel to int8 (head logit projections stay
        bf16), and swap in the ``quantized=True`` module. Quality: <1pt
        mAP@50 delta (test-verified on the fixture).

        ``skip`` — backbone stages kept in bf16. ``"auto"`` (default) uses
        the measured set (``ops.quant.DEFAULT_QUANT_SKIP``: the shallow
        HBM-bound stages where int8 is pure overhead); pass ``()`` to
        quantize everything.

        This leaves the model in *dynamic* activation-scale mode — correct
        but measured 2× SLOWER than bf16 at batch sizes ≥64 on v5e (the
        per-conv absmax pass, docs/PERF.md). For int8 *throughput*, follow
        with :meth:`calibrate` to bake static scales (the int8 MXU runs
        convs at ≈1.9× the bf16 rate once the absmax pass is gone)."""
        assert self.variables is not None, "call .init() or load weights"
        if self.module.quantized:
            return self
        if not self._fused:
            self.fuse()
        from custom_yolo_tpu.ops.quant import (DEFAULT_QUANT_SKIP,
                                               quantize_fused_params)
        if skip == "auto":
            skip = DEFAULT_QUANT_SKIP
        skip = tuple(skip)
        self.variables = {"params": quantize_fused_params(
            self.variables["params"], stochastic=stochastic, skip=skip)}
        self.module = self.module.clone(quantized=True, quant_skip=skip)
        self._apply_eval = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))
        self._serve_cache.clear()
        return self

    def calibrate(self, batches) -> "Detector":
        """Post-training static-quantization calibration: run
        representative ``batches`` (an iterable of preprocessed NHWC
        arrays) through the dynamic-int8 graph recording each conv's
        observed input absmax, then bake per-conv static input scales
        (``ops.quant.bake_static_scales``). After this the serving graph
        quantizes activations with compile-time-constant scales — no
        absmax reduce per conv — and activations between convs stay
        cheap elementwise ops XLA fuses into the conv epilogues.

        The reference has no quantized path (model_builder.py:79-139
        serves fp32/fp16); this is TPU-native capability: v5e's MXU
        contracts int8 at ~2× the bf16 rate."""
        assert self.variables is not None, "call .init() or load weights"
        assert self.module.quantized, "call .quantize() before .calibrate()"
        from custom_yolo_tpu.ops.quant import (bake_static_scales,
                                               has_static_scales)
        assert not has_static_scales(self.variables["params"]), \
            "already calibrated"

        module = self.module

        @jax.jit
        def observe(variables, x):
            _, stats = module.apply(variables, x, train=False,
                                    mutable=["quant_stats"])
            return stats["quant_stats"]

        agg = None
        n = 0
        for batch in batches:
            stats = observe(self.variables, jnp.asarray(batch))
            agg = stats if agg is None else jax.tree_util.tree_map(
                jnp.maximum, agg, stats)
            n += 1
        assert agg is not None, "calibrate() needs at least one batch"
        self.variables = {"params": bake_static_scales(
            self.variables["params"], jax.device_get(agg))}
        self._apply_eval = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))
        self._serve_cache.clear()
        return self

    def optimize_for_tpu(self) -> "Detector":
        """Apply the exactly output-preserving TPU serving optimizations:
        the space-to-depth stem (p1 kernel re-expressed, not retrained) and
        — once fused — the horizontal C3K conv1/conv2 merge
        (:func:`merge_c3k_params`). Composes with :meth:`fuse` in either
        order; the merge is applied lazily by :meth:`fuse` when this ran
        first."""
        if not self.module.s2d_stem:
            if self.variables is not None:
                self.variables = convert_stem_variables(self.variables)
            self.module = self.module.clone(s2d_stem=True)
        if self._fused and not self.module.merged:
            self.variables = {"params": merge_c3k_params(
                self.variables["params"])}
            self.module = self.module.clone(merged=True)
        self._tpu_optimized = True
        self._apply_eval = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))
        self._serve_cache.clear()
        return self

    def __call__(self, x: jnp.ndarray):
        assert self.variables is not None, "call .init() or load weights"
        return self._apply_eval(self.variables, x)

    def inference(self, image, conf_thres: float = 0.25,
                  iou_thres: float = 0.45, max_det: int = 300,
                  letterbox: bool = False, original_coords: bool = False):
        """Single-image predict: path / PIL / array → list of (n, 6)
        [x1,y1,x2,y2,conf,cls] per image (reference model_builder.py:79-139).
        Coordinates are model-input pixels (reference behavior); pass
        ``original_coords=True`` to map back to the source image."""
        arr, scale, offset = preprocess_image(
            image, self.input_size, letterbox=letterbox,
            return_geometry=True)
        result = self.serve(jnp.asarray(arr), conf_thres=conf_thres,
                            iou_thres=iou_thres, max_det=max_det)
        lists = nms_to_lists(result)
        if original_coords:
            for det in lists:
                det[:, 0] = (det[:, 0] - offset[0]) / scale[0]
                det[:, 2] = (det[:, 2] - offset[0]) / scale[0]
                det[:, 1] = (det[:, 1] - offset[1]) / scale[1]
                det[:, 3] = (det[:, 3] - offset[1]) / scale[1]
        return lists

    def serve(self, images: jnp.ndarray, conf_thres: float = 0.25,
              iou_thres: float = 0.45, max_det: int = 300,
              top_k: int = 1024, merge: bool = False,
              class_filter: Optional[Tuple[int, ...]] = None,
              multi_label: bool = False,
              device_preprocess: bool = False):
        """Batched serving path: preprocessed NHWC batch → fixed-shape
        :class:`~custom_yolo_tpu.ops.nms.NMSResult`. Forward + DFL decode +
        class argmax + batched NMS compile into ONE XLA program (no host
        round-trips between stages — the reference hops through python
        between forward, decode, and torchvision NMS).

        top_k caps the NMS candidate pool (reference max_nms=30000 analogue,
        model_utils.py:259); merge/class_filter/multi_label mirror the
        reference's non_max_suppression options (:243-252, :266-272).

        ``device_preprocess=True`` takes RESIZED but otherwise raw uint8
        NHWC and folds [0,1]-scale + ImageNet normalization into the XLA
        program (fp32, same arithmetic as :func:`preprocess_image`) — the
        host→device transfer then moves 1 byte/px instead of 4 (fp32) or 2
        (bf16), the dominant cost on bandwidth-limited host links."""
        assert self.variables is not None, "call .init() or load weights"
        key = (float(conf_thres), float(iou_thres), int(max_det),
               int(top_k), bool(merge), class_filter, bool(multi_label),
               bool(device_preprocess))
        fn = self._serve_cache.get(key)
        if fn is None:
            module, reg_max = self.module, self.reg_max

            @jax.jit
            def serve_fn(variables, images):
                if device_preprocess:
                    images = (images.astype(jnp.float32) / 255.0
                              - IMAGENET_MEAN) / IMAGENET_STD
                preds, anchors, strides = module.apply(variables, images,
                                                       train=False)
                boxes, scores = decode_raw_predictions(preds, anchors,
                                                       strides, reg_max)
                best_scores = jnp.max(scores, axis=-1)
                best_classes = jnp.argmax(scores, axis=-1)
                return batched_nms(boxes, best_scores, best_classes,
                                   conf_thres=conf_thres,
                                   iou_thres=iou_thres, max_det=max_det,
                                   top_k=top_k, merge=merge,
                                   class_filter=class_filter,
                                   multi_label=multi_label,
                                   all_scores=scores if multi_label
                                   else None)

            fn = self._serve_cache[key] = serve_fn
        return fn(self.variables, images)
