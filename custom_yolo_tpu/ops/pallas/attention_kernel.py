"""Fused PSA attention (Pallas TPU).

The PSA attention (reference ``model_blocks.py:158-198``) runs 400 tokens
× few heads at p5 — tiny matmuls, but the XLA einsum path materializes the
(B, nh, T, T) fp32 score tensor in HBM three times over (QKᵀ out, softmax
in/out, PV in) plus the head-major transposes: measured 10.7 ms of the
122 ms flagship forward at B=64 for ~2.5 GF of useful math (docs/PERF.md).

This kernel computes one batch element per grid step entirely in VMEM:
for each head (static python loop) slice q/k/v from the token-major qkv
block, QKᵀ in fp32, softmax, PV, and write the attention output and the
v tokens (needed by the positional depthwise conv) back token-major.
No HBM intermediates, no relayouts — the surrounding convs keep their
NHWC layout.

Numerics mirror the einsum path exactly: bf16 operands, fp32 MXU
accumulation (``preferred_element_type``), fp32 softmax, bf16 PV.

Training support (round 3, VERDICT r2 #7): :func:`psa_attention` wraps the
kernel in a ``jax.custom_vjp`` whose backward is a second all-VMEM Pallas
kernel that *recomputes* the softmax from the saved qkv residual
(flash-attention style — nothing but qkv is saved between fwd and bwd, so
the (B, nh, T, T) score tensor never exists in HBM in either direction).
Gradient equivalence vs the einsum path is test-asserted
(tests/test_model.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _attn_kernel(qkv_ref, out_ref, v_ref, *, num_heads: int, dim_key: int,
                 dim_head: int, scale: float):
    per_head = 2 * dim_key + dim_head
    qkv = qkv_ref[0]                                   # (T, nh*per_head)
    for h in range(num_heads):
        base = h * per_head
        q = qkv[:, base:base + dim_key]                # (T, dk) bf16
        k = qkv[:, base + dim_key:base + 2 * dim_key]  # (T, dk)
        v = qkv[:, base + 2 * dim_key:base + per_head]  # (T, dh)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (T, T) fp32
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(v.dtype)
        out_ref[0, :, h * dim_head:(h + 1) * dim_head] = o
        v_ref[0, :, h * dim_head:(h + 1) * dim_head] = v


@functools.partial(jax.jit, static_argnames=("num_heads", "dim_key",
                                             "dim_head", "interpret"))
def psa_attention_pallas(qkv: jnp.ndarray, num_heads: int, dim_key: int,
                         dim_head: int, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, nh·(2·dk+dh)) token-major qkv → (attention out, v), both
    (B, T, nh·dh). One batch element per grid step, all-VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c_qkv = qkv.shape
    assert c_qkv == num_heads * (2 * dim_key + dim_head), (c_qkv, num_heads)
    c_out = num_heads * dim_head
    scale = dim_key ** -0.5
    kernel = functools.partial(_attn_kernel, num_heads=num_heads,
                               dim_key=dim_key, dim_head=dim_head,
                               scale=scale)
    out, v = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, c_qkv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, t, c_out), qkv.dtype),
                   jax.ShapeDtypeStruct((b, t, c_out), qkv.dtype)],
        interpret=interpret,
    )(qkv)
    return out, v


def _attn_bwd_kernel(qkv_ref, dout_ref, dv_ref, dqkv_ref, *, num_heads: int,
                     dim_key: int, dim_head: int, scale: float):
    """d(out, v) → d(qkv), one batch element per grid step, all in VMEM.

    Standard attention backward with the softmax recomputed from qkv:
      p  = softmax(q kᵀ · scale)            (fp32, recomputed)
      dv = pᵀ do + dv_pos                   (dv_pos: positional-branch grad)
      dp = do vᵀ
      ds = p ⊙ (dp − rowsum(dp ⊙ p)) · scale
      dq = ds k,   dk = dsᵀ q
    All matmuls fp32-accumulated on the MXU; p is cast to the compute dtype
    for the dv matmul exactly as the forward casts it for PV, so gradients
    track the einsum path's numerics.
    """
    per_head = 2 * dim_key + dim_head
    qkv = qkv_ref[0]                                     # (T, nh*per_head)
    dout = dout_ref[0]                                   # (T, nh*dh)
    dv_in = dv_ref[0]                                    # (T, nh*dh)
    for h in range(num_heads):
        base = h * per_head
        q = qkv[:, base:base + dim_key]
        k = qkv[:, base + dim_key:base + 2 * dim_key]
        v = qkv[:, base + 2 * dim_key:base + per_head]
        do = dout[:, h * dim_head:(h + 1) * dim_head]
        dvp = dv_in[:, h * dim_head:(h + 1) * dim_head]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (Tq, Tk) fp32
        p32 = jax.nn.softmax(scores, axis=-1)
        pb = p32.astype(v.dtype)

        # dv: contract the query axis of p with do → (Tk, dh)
        dv_attn = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp: (Tq, Tk) = do · vᵀ
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
              * jnp.float32(scale)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        dt = qkv.dtype
        dqkv_ref[0, :, base:base + dim_key] = dq.astype(dt)
        dqkv_ref[0, :, base + dim_key:base + 2 * dim_key] = dk.astype(dt)
        dqkv_ref[0, :, base + 2 * dim_key:base + per_head] = (
            dv_attn + dvp.astype(jnp.float32)).astype(dt)


@functools.partial(jax.jit, static_argnames=("num_heads", "dim_key",
                                             "dim_head", "interpret"))
def _psa_attention_bwd_pallas(qkv: jnp.ndarray, dout: jnp.ndarray,
                              dv: jnp.ndarray, num_heads: int, dim_key: int,
                              dim_head: int, interpret: bool = False
                              ) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c_qkv = qkv.shape
    c_out = num_heads * dim_head
    scale = dim_key ** -0.5
    kernel = functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                               dim_key=dim_key, dim_head=dim_head,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, c_qkv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, c_qkv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c_qkv), qkv.dtype),
        interpret=interpret,
    )(qkv, dout, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def psa_attention(qkv: jnp.ndarray, num_heads: int, dim_key: int,
                  dim_head: int, interpret: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable fused PSA attention: the Pallas forward kernel plus a
    Pallas backward that recomputes softmax from the qkv residual (the only
    saved tensor). Drop-in for :func:`psa_attention_reference` on TPU."""
    return psa_attention_pallas(qkv, num_heads, dim_key, dim_head, interpret)


def _psa_attention_fwd(qkv, num_heads, dim_key, dim_head, interpret):
    out = psa_attention_pallas(qkv, num_heads, dim_key, dim_head, interpret)
    return out, qkv


def _psa_attention_bwd(num_heads, dim_key, dim_head, interpret, qkv, grads):
    dout, dv = grads
    dqkv = _psa_attention_bwd_pallas(qkv, dout, dv, num_heads, dim_key,
                                     dim_head, interpret)
    return (dqkv,)


psa_attention.defvjp(_psa_attention_fwd, _psa_attention_bwd)


def psa_attention_reference(qkv: jnp.ndarray, num_heads: int, dim_key: int,
                            dim_head: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The XLA einsum path (used in training and off-TPU) — numerics the
    kernel must match."""
    b, t, _ = qkv.shape
    scale = dim_key ** -0.5
    qkv4 = qkv.reshape(b, t, num_heads, 2 * dim_key + dim_head)
    q = qkv4[..., :dim_key]
    k = qkv4[..., dim_key:2 * dim_key]
    v = qkv4[..., 2 * dim_key:]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return (out.reshape(b, t, num_heads * dim_head),
            v.reshape(b, t, num_heads * dim_head))
