"""CSP backbone.

Behavioral equivalent of the reference ``Backbone``
(``src/model/backbone.py:7-66``): five stride-2 stages; C3K2 at p2–p5
(r=4 at p2/p3, r=2 at p4/p5), SPPF + PSA at p5; emits (p3, p4, p5) at
strides 8/16/32. NHWC, bf16 compute.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from custom_yolo_tpu.core.dtypes import DTypePolicy
from custom_yolo_tpu.nn.blocks import PSA, SPPF, C3K2, ConvBN


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC (B,H,W,C) → (B,H/r,W/r,r²·C); channel index = (a·r+b)·C + c for
    pixel phase (a,b) within each r×r block."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def stem_kernel_to_s2d(kernel):
    """Re-express a 3×3 stride-2 stem kernel (3,3,cin,cout) as the exactly
    equivalent 2×2 stride-1 kernel (2,2,4·cin,cout) over space-to-depth
    input (``s2d_stem=True``): output y[i,j] = Σ_{di,dj} x[2i+di-1, 2j+dj-1]
    K[di,dj] ≡ Σ_{u,v,a,b} z[i-1+u, j-1+v, (2a+b)·cin:·] K[2u+a-1, 2v+b-1]
    (taps with di/dj = -1 are zero — they fall on the stride-2 phase the
    3×3 window never reaches)."""
    import numpy as np
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "s2d stem transform is for 3x3 s2 stems"
    k2 = np.zeros((2, 2, 4 * cin, cout), np.float32)
    k = np.asarray(kernel, np.float32)
    for u in (0, 1):
        for a in (0, 1):
            di = 2 * u + a - 1
            if di < 0:
                continue
            for v in (0, 1):
                for b in (0, 1):
                    dj = 2 * v + b - 1
                    if dj < 0:
                        continue
                    ch = (a * 2 + b) * cin
                    k2[u, v, ch:ch + cin, :] = k[di, dj]
    return jnp.asarray(k2, dtype=kernel.dtype)


class Backbone(nn.Module):
    width: Tuple[int, ...]
    depth: Tuple[int, ...]
    csp: Tuple[bool, ...]
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    # TPU fast path for the stem: the reference's 3-input-channel 3×3 s2
    # conv (backbone.py:38-40) keeps the MXU contraction at 27 lanes of 128;
    # space-to-depth(2) + the equivalent 2×2 s1 conv contracts over 48 —
    # mathematically identical outputs (see stem_kernel_to_s2d)
    s2d_stem: bool = False
    fused: bool = False
    quantized: bool = False
    # horizontal C3K conv1/conv2 merge (exact; serving) — see nn.blocks.C3K
    merged: bool = False
    # differentiable Pallas PSA attention in training (custom VJP) —
    # see nn.blocks.Attention.pallas_attention
    pallas_attention: bool = False
    # stage names kept bf16 under quantized=True (selective quantization):
    # the shallow HBM-bound stages measured SLOWER in int8 — the requant
    # passes are pure overhead where convs are MXU-starved (docs/PERF.md
    # per-stage table). Param tree must come from
    # quantize_fused_params(..., skip=quant_skip).
    quant_skip: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        w, d, c = self.width, self.depth, self.csp
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused)

        def q(name, merged=False):
            out = dict(kw, quantized=(self.quantized
                                      and name not in self.quant_skip))
            if merged:
                out["merged"] = self.merged
            return out

        def down(feat, features, name):
            return ConvBN(features, kernel_size=3, strides=2, padding=1,
                          name=name, **q(name))(feat, train)

        # p1/2
        if self.s2d_stem:
            p1 = ConvBN(w[1], kernel_size=2, strides=1,
                        padding=((1, 0), (1, 0)), name="p1_conv",
                        **q("p1_conv"))(space_to_depth(x, 2), train)
        else:
            p1 = down(x, w[1], "p1_conv")
        # p2/4
        p2 = down(p1, w[2], "p2_conv")
        p2 = C3K2(w[3], d[0], c[0], r=4, name="p2_csp",
                  **q("p2_csp", merged=True))(p2, train)
        # p3/8
        p3 = down(p2, w[3], "p3_conv")
        p3 = C3K2(w[4], d[1], c[0], r=4, name="p3_csp",
                  **q("p3_csp", merged=True))(p3, train)
        # p4/16
        p4 = down(p3, w[4], "p4_conv")
        p4 = C3K2(w[4], d[2], c[1], r=2, name="p4_csp",
                  **q("p4_csp", merged=True))(p4, train)
        # p5/32
        p5 = down(p4, w[5], "p5_conv")
        p5 = C3K2(w[5], d[3], c[1], r=2, name="p5_csp",
                  **q("p5_csp", merged=True))(p5, train)
        p5 = SPPF(w[5], name="p5_sppf", **q("p5_sppf"))(p5, train)
        p5 = PSA(d[4], name="p5_psa",
                 pallas_attention=self.pallas_attention,
                 **q("p5_psa"))(p5, train)
        return p3, p4, p5
