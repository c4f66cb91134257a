"""Fused SPPF pooling pyramid (Pallas TPU).

SPPF (reference ``model_blocks.py:127-156``) chains three 5×5 stride-1
SAME max-pools and concatenates [x, y1, y2, y3]. Via XLA that is three
`reduce_window` ops + a concat — four full HBM round-trips of the p5
tensor for pure VPU work. This kernel computes the whole pyramid for one
batch element in VMEM (the p5 tensor is ~300 KB at 20²×384) and writes
the concatenated result once.

Max-pool is computed separably (5×5 max = 5×1 then 1×5) over a −inf-padded
copy — identical to `reduce_window` semantics at the borders.

Serving/eval only (no VJP defined); training keeps the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool5(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) → 5×5 stride-1 SAME max-pool, separable, −inf borders."""
    h, w, _ = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((2, 2), (0, 0), (0, 0)), constant_values=neg)
    x = functools.reduce(jnp.maximum,
                         [xp[i:i + h] for i in range(5)])
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), constant_values=neg)
    return functools.reduce(jnp.maximum,
                            [xp[:, i:i + w] for i in range(5)])


def _sppf_kernel(x_ref, out_ref, *, ch: int):
    x = x_ref[0]                                    # (H, W, C)
    y1 = _pool5(x)
    y2 = _pool5(y1)
    y3 = _pool5(y2)
    out_ref[0, :, :, 0 * ch:1 * ch] = x
    out_ref[0, :, :, 1 * ch:2 * ch] = y1
    out_ref[0, :, :, 2 * ch:3 * ch] = y2
    out_ref[0, :, :, 3 * ch:4 * ch] = y3


@functools.partial(jax.jit, static_argnames=("interpret",))
def sppf_pyramid_pallas(x: jnp.ndarray, interpret: bool = False
                        ) -> jnp.ndarray:
    """(B, H, W, C) → (B, H, W, 4C) = concat[x, p(x), p²(x), p³(x)] with
    p = 5×5 stride-1 SAME max-pool. One batch element per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    out = pl.pallas_call(
        functools.partial(_sppf_kernel, ch=c),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, 4 * c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 4 * c), x.dtype),
        interpret=interpret,
    )(x)
    return out
