"""CSP backbone.

Behavioral equivalent of the reference ``Backbone``
(``src/model/backbone.py:7-66``): five stride-2 stages; C3K2 at p2–p5
(r=4 at p2/p3, r=2 at p4/p5), SPPF + PSA at p5; emits (p3, p4, p5) at
strides 8/16/32. NHWC, bf16 compute.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from custom_yolo_tpu.core.dtypes import DTypePolicy
from custom_yolo_tpu.nn.blocks import PSA, SPPF, C3K2, ConvBN


class Backbone(nn.Module):
    width: Tuple[int, ...]
    depth: Tuple[int, ...]
    csp: Tuple[bool, ...]
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        w, d, c = self.width, self.depth, self.csp
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  fused=self.fused)

        def down(feat, features, name):
            return ConvBN(features, kernel_size=3, strides=2, padding=1,
                          name=name, **kw)(feat, train)

        # p1/2
        p1 = down(x, w[1], "p1_conv")
        # p2/4
        p2 = down(p1, w[2], "p2_conv")
        p2 = C3K2(w[3], d[0], c[0], r=4, name="p2_csp", **kw)(p2, train)
        # p3/8
        p3 = down(p2, w[3], "p3_conv")
        p3 = C3K2(w[4], d[1], c[0], r=4, name="p3_csp", **kw)(p3, train)
        # p4/16
        p4 = down(p3, w[4], "p4_conv")
        p4 = C3K2(w[4], d[2], c[1], r=2, name="p4_csp", **kw)(p4, train)
        # p5/32
        p5 = down(p4, w[5], "p5_conv")
        p5 = C3K2(w[5], d[3], c[1], r=2, name="p5_csp", **kw)(p5, train)
        p5 = SPPF(w[5], name="p5_sppf", **kw)(p5, train)
        p5 = PSA(d[4], name="p5_psa", **kw)(p5, train)
        return p3, p4, p5
