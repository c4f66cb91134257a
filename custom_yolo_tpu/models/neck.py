"""FPN-PAN neck.

Behavioral equivalent of the reference ``Neck`` (``src/model/neck.py:7-45``):
top-down path with 2× nearest upsampling (h1, h2), bottom-up path with
stride-2 convs and fusion (h3–h6). NHWC, bf16 compute.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from custom_yolo_tpu.core.dtypes import DTypePolicy
from custom_yolo_tpu.nn.blocks import C3K2, ConvBN


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """2× nearest-neighbor upsampling in NHWC via reshape-broadcast
    (compiles to a cheap layout op on TPU; no gather needed)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Neck(nn.Module):
    width: Tuple[int, ...]
    depth: Tuple[int, ...]
    csp: Tuple[bool, ...]
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False
    # horizontal C3K conv1/conv2 merge (exact; serving) — see nn.blocks.C3K
    merged: bool = False

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, jax.Array, jax.Array],
                 train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        p3, p4, p5 = feats
        w, d, c = self.width, self.depth, self.csp
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        ckw = dict(kw, merged=self.merged)

        # top-down
        p4 = C3K2(w[4], d[5], c[0], r=2, name="h1", **ckw)(
            jnp.concatenate([upsample2x_nearest(p5), p4], axis=-1), train)
        p3 = C3K2(w[3], d[5], c[0], r=2, name="h2", **ckw)(
            jnp.concatenate([upsample2x_nearest(p4), p3], axis=-1), train)
        # bottom-up
        p3_down = ConvBN(w[3], kernel_size=3, strides=2, padding=1,
                         name="h3", **kw)(p3, train)
        p4 = C3K2(w[4], d[5], c[0], r=2, name="h4", **ckw)(
            jnp.concatenate([p3_down, p4], axis=-1), train)
        p4_down = ConvBN(w[4], kernel_size=3, strides=2, padding=1,
                         name="h5", **kw)(p4, train)
        p5 = C3K2(w[5], d[5], c[1], r=2, name="h6", **ckw)(
            jnp.concatenate([p4_down, p5], axis=-1), train)
        return p3, p4, p5
