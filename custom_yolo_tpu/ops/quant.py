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

MEASURED (v5e, x preset, B=64, docs/PERF.md): the dynamic-quant conv path
is 2× SLOWER than bf16 for batch throughput — XLA does not lower
``s8×s8→s32`` convs onto the MXU's fast int8 path and the per-conv
quant/dequant round-trips triple activation HBM traffic. Use this path
for weight-HBM-bound regimes (small-batch latency serving, weight
storage/transfer halving), not for batch throughput.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


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


# ------------------------------------------------------------------ conv
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
    out = jax.lax.conv_general_dilated(
        qx, qkernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (ascale * wscale) + bias
    if act:
        out = jax.nn.silu(out)
    return out.astype(x.dtype)


# ----------------------------------------------------------- tree rewrite
def quantize_fused_params(params: Dict[str, Any],
                          stochastic: bool = False,
                          _path: str = "") -> Dict[str, Any]:
    """Fused param tree ({conv: {kernel, bias}}) → quantized tree
    ({conv: {kernel: int8, scale: fp32, bias: fp32}}). Leaves the head's
    final logit projections (``box{i}_out`` / ``cls{i}_out``) and any
    non-ConvBN params untouched; depthwise kernels are quantized too (they
    are VPU-bound either way, but int8 halves their HBM reads)."""
    out: Dict[str, Any] = {}
    for key, value in params.items():
        path = f"{_path}/{key}"
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
            out[key] = quantize_fused_params(value, stochastic, path)
        else:
            out[key] = value
    return out
