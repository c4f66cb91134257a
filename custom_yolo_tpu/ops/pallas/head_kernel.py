"""Fused detection-head classification tower (Pallas TPU).

The cls tower (reference ``src/model/head.py:52-74``) is
dw3×3 → pw1×1 → dw3×3 → pw1×1 → 1×1-logits. Via XLA each conv round-trips
the level-0 activation (80²×384 ≈ 4.9 MB/img bf16) through HBM — measured
9.5 ms at B=128 for a ~2.7 ms traffic floor. These two kernels keep every
intermediate in VMEM:

* ``_dwpw_kernel`` — grid (B, G) over input-channel groups of 128:
  depthwise 3×3 (zero-pad + 9 shifted multiplies, VPU) + SiLU on the
  group, then the group's slice of the pointwise matmul accumulated into
  a fp32 VMEM scratch across the G steps; on the last step adds the pw
  bias, applies SiLU, and (optionally) applies the final 1×1 logits
  projection — so the middle tensor never touches HBM.

Numerics: bf16 operands, fp32 accumulation (same as XLA's conv
internals); each stage's output rounds to bf16 exactly where the XLA
path rounds. Serving/eval only (no VJP) — training keeps the conv chain.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _silu(v: jnp.ndarray) -> jnp.ndarray:
    """x·sigmoid(x) with explicitly-typed constants — jax.nn.silu's
    logistic lowering emits an f32 scalar broadcast into bf16 vectors
    inside Mosaic (verifier error on TPU)."""
    one = jnp.asarray(1.0, v.dtype)
    return v / (one + jnp.exp(-v))


def _dw3x3(x: jnp.ndarray, kb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) depthwise 3×3 SAME conv + bias + SiLU. ``kb`` is the
    (10, C) pack: rows 0–8 the taps (row di*3+dj), row 9 the bias."""
    h, w, c = x.shape
    zero = jnp.asarray(0.0, x.dtype)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), constant_values=zero)
    acc = None
    for di in range(3):
        for dj in range(3):
            term = xp[di:di + h, dj:dj + w, :] * kb[di * 3 + dj][None, None]
            acc = term if acc is None else acc + term
    return _silu(acc + kb[9][None, None, :])


def _dwpw_kernel(x_ref, dwkb_ref, pwk_ref, pwb_ref, out_ref,
                 acc_ref, *, groups: int, mid: int, project: bool,
                 outk_ref=None, outb_ref=None):
    import jax.experimental.pallas as pl

    gi = pl.program_id(1)
    x = x_ref[0]                                   # (H, W, 128) group slab
    y = _dw3x3(x, dwkb_ref[...])                   # bf16
    h, w, cg = y.shape
    partial = jax.lax.dot_general(
        y.reshape(h * w, cg), pwk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (H*W, mid) fp32

    @pl.when(gi == 0)
    def _init():
        acc_ref[...] = partial

    @pl.when(gi > 0)
    def _acc():
        acc_ref[...] += partial

    @pl.when(gi == groups - 1)
    def _emit():
        z = _silu(acc_ref[...] + pwb_ref[...][None, :]
                  ).astype(x.dtype)                # (H*W, mid) bf16
        if project:
            logits = jax.lax.dot_general(
                z, outk_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits + outb_ref[...][None, :]
            out_ref[0] = logits.astype(x.dtype).reshape(
                h, w, out_ref.shape[-1])
        else:
            out_ref[0] = z.reshape(h, w, mid)


@functools.partial(jax.jit, static_argnames=("interpret", "max_rows"))
def _dwpw_stage(x, dwk, dwb, pwk, pwb, outk=None, outb=None,
                interpret: bool = False, max_rows: int = 0):
    """One fused dw3×3+SiLU → pw+SiLU stage (+ optional final 1×1 logits
    projection). x: (B, H, W, C) with C a multiple of 128.

    Large levels are split into overlapping row chunks host-side (the
    fp32 accumulator + double-buffered blocks must fit the ~16 MB VMEM
    budget): each chunk carries one real halo row per side and the two
    boundary rows — which the kernel zero-padded — are discarded.
    ``max_rows`` overrides the VMEM-derived chunk size (tests)."""
    b, h, w, c = x.shape
    mid_ = pwk.shape[-1]
    cout_ = (outk.shape[-1] if outk is not None else mid_)
    # Mosaic allocates a stack buffer per intermediate (each of the 9 dw
    # taps, the fp32 accumulator, double-buffered in/out blocks) — the
    # measured footprint is ~2.2× the naive sum, hence the small budget
    per_row = w * (mid_ * 4 + 2 * cout_ * 2 + 2 * 128 * 2)
    if not max_rows:
        max_rows = max(8, int(5 * 2 ** 20) // per_row)
    if h > max_rows:
        # the explicit max_rows override (tests) can be <= 2; clamp so the
        # chunk loop always advances
        step = max(1, max_rows - 2)
        outs = []
        r0 = 0
        while r0 < h:
            r1 = min(r0 + step, h)
            lo = max(r0 - 1, 0)
            hi = min(r1 + 1, h)
            part = _dwpw_stage_nochunk(x[:, lo:hi], dwk, dwb, pwk, pwb,
                                       outk, outb, interpret=interpret)
            outs.append(part[:, r0 - lo:part.shape[1] - (hi - r1)])
            r0 = r1
        return jnp.concatenate(outs, axis=1)
    return _dwpw_stage_nochunk(x, dwk, dwb, pwk, pwb, outk, outb,
                               interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dwpw_stage_nochunk(x, dwk, dwb, pwk, pwb, outk=None, outb=None,
                        interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cg = 128
    assert c % cg == 0, c
    groups = c // cg
    mid = pwk.shape[-1]
    project = outk is not None
    c_out = outk.shape[-1] if project else mid

    # Mosaic block rules: rank-1 / short-sublane operands can't be
    # group-sliced — pack the dw taps + bias as one (10, C) array whose
    # first block dim equals the array dim
    dwkb = jnp.concatenate([dwk.reshape(9, c), dwb[None]], axis=0)
    operands = [x, dwkb, pwk, pwb]
    in_specs = [
        pl.BlockSpec((1, h, w, cg), lambda i, g: (i, 0, 0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((10, cg), lambda i, g: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cg, mid), lambda i, g: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mid,), lambda i, g: (0,), memory_space=pltpu.VMEM),
    ]
    kwargs = dict(groups=groups, mid=mid, project=project)
    kernel = functools.partial(_dwpw_kernel, **kwargs)
    if project:
        operands += [outk, outb]

        def kernel(x_ref, dwkb_ref, pwk_ref, pwb_ref, outk_ref,
                   outb_ref, out_ref, acc_ref):
            _dwpw_kernel(x_ref, dwkb_ref, pwk_ref, pwb_ref,
                         out_ref, acc_ref, outk_ref=outk_ref,
                         outb_ref=outb_ref, **kwargs)
        in_specs += [
            pl.BlockSpec((mid, c_out), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda i, g: (0,),
                         memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        kernel,
        grid=(b, groups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, c_out), lambda i, g: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * w, mid), jnp.float32)],
        interpret=interpret,
    )(*operands)


def cls_tower_pallas(x: jnp.ndarray,
                     dw1: Tuple[jnp.ndarray, jnp.ndarray],
                     pw1: Tuple[jnp.ndarray, jnp.ndarray],
                     dw2: Tuple[jnp.ndarray, jnp.ndarray],
                     pw2: Tuple[jnp.ndarray, jnp.ndarray],
                     out: Tuple[jnp.ndarray, jnp.ndarray],
                     interpret: bool = False) -> jnp.ndarray:
    """Full fused cls tower: two _dwpw_stage calls; the second also applies
    the final logits projection, so only (B, H, W, nc) reaches HBM.

    Each weight pair is (kernel, bias): dw kernels (3, 3, C); pw kernels
    (C_in, C_out) (squeezed 1×1); out kernel (C_mid, nc).
    """
    z = _dwpw_stage(x, dw1[0], dw1[1], pw1[0], pw1[1], interpret=interpret)
    return _dwpw_stage(z, dw2[0], dw2[1], pw2[0], pw2[1], out[0], out[1],
                       interpret=interpret)


def cls_tower_reference(x, dw1, pw1, dw2, pw2, out):
    """XLA conv-chain semantics the kernel must match."""
    def dw(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k[..., None].transpose(0, 1, 3, 2),   # (3,3,C)→(3,3,1,C)
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1])
        return jax.nn.silu(y + b[None, None, None, :])

    def pw(x, k, b, act=True):
        y = jax.lax.dot_general(x, k, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + b[None, None, None, :]
        y = jax.nn.silu(y) if act else y
        return y.astype(x.dtype)

    z = pw(dw(x, dw1[0], dw1[1]), pw1[0], pw1[1])
    z = pw(dw(z, dw2[0], dw2[1]), pw2[0], pw2[1])
    return pw(z, out[0], out[1], act=False)
