"""int8 quantization for the serving path.

The reference serves fp16/fp32 CUDA (``src/model/model_builder.py:79-139``
has no quantized path); on TPU v5e the MXU runs int8 at 2× the bf16 rate
(394 vs 197 TOPS) and int8 weights halve weight HBM traffic, so a
quantized serving mode is a first-class TPU capability:

* **weights**: per-output-channel symmetric int8 (scale = absmax/127),
  quantized once offline from the *fused* conv kernels (conv+BN folded) —
  round-to-nearest by default, or stochastic rounding via a Pallas kernel
  (:func:`stochastic_quantize_int8`, used by QAT-style repeated
  re-quantization where rounding bias would accumulate);
* **activations**: dynamic per-tensor symmetric int8 (absmax), computed
  in-graph — one fused VPU reduce, no calibration dataset needed;
* the conv itself contracts int8×int8→int32 on the MXU
  (``preferred_element_type=int32``), then dequantizes with
  ``act_scale * w_scale[o]``, adds the fp32 bias and applies SiLU in the
  epilogue XLA fuses into the conv.

Head final 1×1 projections (box/cls logits) are left in bf16 — they are
<2% of FLOPs and logit precision controls detection quality.

MEASURED (v5e, x preset, B=64 r2 / re-diagnosed r3, docs/PERF.md): the
*dynamic*-quant conv path is 2× SLOWER than bf16 for batch throughput.
Round-3 microbenchmarks overturned the r2 attribution: XLA **does** lower
``s8×s8→s32`` convs onto the MXU's fast int8 path (3×3 768-ch conv:
354 TOP/s vs 187 TF/s bf16 = 1.9×; int8 dot 245 TOP/s at 8192³) — the
slowdown is the dynamic quantization itself: a full absmax reduce pass
plus a round/clip pass over every activation tensor, unfusable into the
producing conv's epilogue because of the data-dependent scale.

The **static** path (per-conv input scales calibrated offline —
:func:`bake_static_scales`) removes the absmax pass: quantize becomes a
pure elementwise op XLA fuses into the neighbouring epilogues, and the
MXU speedup survives (static 1×1 chain incl. SiLU+requant epilogues:
1.4× over bf16, isolated). Use dynamic only for calibration; serve
static.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


# Stages measured SLOWER under int8 on v5e (B=128, x preset, per-stage
# scan timing — docs/PERF.md): the shallow HBM-bound stages where convs
# are MXU-starved, so the int8 rate buys nothing and the static requant
# elementwise passes are pure overhead (p1 5.89→7.67 ms, p2_conv
# 9.41→12.51, p2_csp 33.46→40.84). Detector.quantize(skip="auto") keeps
# these in bf16.
DEFAULT_QUANT_SKIP = ("p1_conv", "p2_conv", "p2_csp")


# ---------------------------------------------------------------- weights
def quantize_kernel_int8(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(kh, kw, cin, cout) float → (int8 kernel, fp32 scale (cout,)) with
    per-output-channel symmetric scaling."""
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _stochastic_round_kernel(x_ref, seed_ref, out_ref):
    """Pallas: round-to-int8 with probability proportional to the fractional
    part (pltpu.stochastic_round), seeded per call."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    x = x_ref[...]
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    out_ref[...] = pltpu.stochastic_round(x, bits,
                                          target_dtype=jnp.int8)


def stochastic_quantize_int8(kernel: jax.Array, seed: int = 0
                             ) -> Tuple[jax.Array, jax.Array]:
    """Per-channel int8 quantization with *stochastic* rounding (unbiased:
    E[q] = x/scale). Pallas TPU kernel; falls back to an equivalent
    jax.random implementation off-TPU."""
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    scaled = jnp.clip(k / scale, -127.0, 127.0)
    flat = scaled.reshape(-1, scaled.shape[-1])
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        q = pl.pallas_call(
            _stochastic_round_kernel,
            out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(flat, jnp.asarray([seed], jnp.int32))
    except Exception:
        # reference semantics: floor(x + u), u ~ U[0,1)
        u = jax.random.uniform(jax.random.key(seed), flat.shape)
        q = jnp.clip(jnp.floor(flat + u), -127, 127).astype(jnp.int8)
    return q.reshape(scaled.shape), scale


# ------------------------------------------------------------ activations
def quantize_act_int8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8: (int8 x, fp32 scale scalar)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act_static(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Static per-tensor int8 quantization with a precomputed scale — a
    pure elementwise op (no absmax reduce) that XLA fuses into the
    producing op's epilogue."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q


# ------------------------------------------------------------------ conv
def _int8_contract(qx: jax.Array, ascale: jax.Array, qkernel: jax.Array,
                   wscale: jax.Array, bias: jax.Array,
                   strides: Tuple[int, int], padding: Any, groups: int,
                   act: bool, out_dtype) -> jax.Array:
    """int8 NHWC × int8 HWIO → int32 MXU contraction, dequantized by
    ascale·wscale[o], +bias, optional SiLU, cast to ``out_dtype``."""
    out = jax.lax.conv_general_dilated(
        qx, qkernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (ascale * wscale) + bias
    if act:
        out = jax.nn.silu(out)
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("strides", "padding", "groups",
                                             "act"))
def int8_conv(x: jax.Array, qkernel: jax.Array, wscale: jax.Array,
              bias: jax.Array, strides: Tuple[int, int] = (1, 1),
              padding: Any = ((0, 0), (0, 0)), groups: int = 1,
              act: bool = True) -> jax.Array:
    """bf16 NHWC input → dynamic-int8 conv → bf16 output.

    x:(N,H,W,Cin) · qkernel:(kh,kw,Cin/g,Cout) int8 → int32 MXU contraction,
    dequant by act_scale·wscale[o], +bias, SiLU when ``act``.
    """
    qx, ascale = quantize_act_int8(x)
    return _int8_contract(qx, ascale, qkernel, wscale, bias, strides,
                          padding, groups, act, x.dtype)


@functools.partial(jax.jit, static_argnames=("strides", "padding", "groups",
                                             "act"))
def int8_conv_static(x: jax.Array, qkernel: jax.Array, wscale: jax.Array,
                     bias: jax.Array, in_scale: jax.Array,
                     strides: Tuple[int, int] = (1, 1),
                     padding: Any = ((0, 0), (0, 0)), groups: int = 1,
                     act: bool = True) -> jax.Array:
    """Static int8 conv: the input scale was calibrated offline
    (:func:`bake_static_scales`), so quantization is elementwise-only and
    the whole quant→conv→dequant runs without any extra reduce pass."""
    qx = quantize_act_static(x, in_scale)
    return _int8_contract(qx, in_scale, qkernel, wscale, bias, strides,
                          padding, groups, act, x.dtype)


# ----------------------------------------------------------- tree rewrite
def quantize_fused_params(params: Dict[str, Any],
                          stochastic: bool = False,
                          skip: Tuple[str, ...] = (),
                          _path: str = "") -> Dict[str, Any]:
    """Fused param tree ({conv: {kernel, bias}}) → quantized tree
    ({conv: {kernel: int8, scale: fp32, bias: fp32}}). Leaves the head's
    final logit projections (``box{i}_out`` / ``cls{i}_out``) and any
    non-ConvBN params untouched; depthwise kernels are quantized too (they
    are VPU-bound either way, but int8 halves their HBM reads).

    ``skip`` — module names whose subtree stays bf16 (selective
    quantization; must match the module's ``quant_skip``): the measured
    HBM-bound stages where int8 requant is pure overhead (docs/PERF.md)."""
    out: Dict[str, Any] = {}
    for key, value in params.items():
        path = f"{_path}/{key}"
        if key in skip:
            out[key] = value
            continue
        if (isinstance(value, dict) and set(value) == {"conv"}
                and isinstance(value["conv"], dict)
                and "kernel" in value["conv"]
                and not key.endswith("_out")):
            kernel = value["conv"]["kernel"]
            if stochastic:
                q, s = stochastic_quantize_int8(kernel)
            else:
                q, s = quantize_kernel_int8(kernel)
            out[key] = {"conv": {"kernel": q, "scale": s,
                                 "bias": value["conv"].get(
                                     "bias", jnp.zeros(q.shape[-1]))}}
        elif isinstance(value, dict):
            out[key] = quantize_fused_params(value, stochastic, skip, path)
        else:
            out[key] = value
    return out


def _is_quant_leaf(node: Any) -> bool:
    return (isinstance(node, dict) and "kernel" in node
            and "scale" in node
            and getattr(node["kernel"], "dtype", None) == jnp.int8)


def bake_static_scales(params: Dict[str, Any],
                       stats: Any = None) -> Dict[str, Any]:
    """Quantized param tree + calibration stats → static-quant tree.

    ``stats`` is the (batch-maxed) ``quant_stats`` collection collected by
    running the dynamic-quant model with ``mutable=["quant_stats"]``: a
    tree mirroring the param tree whose conv leaves hold
    ``{"in_absmax": scalar}``. Each int8 conv leaf gains an ``in_scale``
    (absmax/127) that switches the serving graph to
    :func:`int8_conv_static`. ``stats=None`` writes ``in_scale = 1.0``
    everywhere — used to build restore templates for checkpoints saved
    with static scales."""
    def walk(ptree, stree):
        out = {}
        for key, value in ptree.items():
            sub = stree.get(key) if isinstance(stree, dict) else None
            if _is_quant_leaf(value):
                leaf = dict(value)
                if sub is not None and "in_absmax" in sub:
                    absmax = jnp.asarray(sub["in_absmax"], jnp.float32)
                    # sow() without a reduce_fn stores a tuple per apply
                    absmax = jnp.max(jnp.asarray(absmax))
                    leaf["in_scale"] = jnp.where(absmax > 0,
                                                 absmax / 127.0, 1.0)
                else:
                    leaf["in_scale"] = jnp.float32(1.0)
                out[key] = leaf
            elif isinstance(value, dict):
                out[key] = walk(value, sub)
            else:
                out[key] = value
        return out

    return walk(params, stats if stats is not None else {})


def has_static_scales(params: Dict[str, Any]) -> bool:
    """True if any int8 conv leaf carries a calibrated ``in_scale``."""
    for value in params.values():
        if _is_quant_leaf(value) and "in_scale" in value:
            return True
        if isinstance(value, dict) and has_static_scales(value):
            return True
    return False
