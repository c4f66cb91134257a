"""Anchor-free decoupled detect head with DFL box regression.

Behavioral equivalent of the reference ``Head`` (``src/model/head.py:9-121``):
per-level box tower (2×3×3 conv → 1×1 to 4*reg_max logits) and cls tower
(depthwise+pointwise ×2 → 1×1 to nc logits with prior-probability bias init,
:66-74), flattened and concatenated over levels (8400 anchors at 640²).

TPU-first differences:
* predictions are **anchor-major** ``(N, M, 4*reg_max + nc)`` — anchors in
  sublanes, channels in lanes — instead of the reference's channel-major
  ``(N, no, 8400)`` (:119);
* anchors/strides come from static shapes (`ops.anchors.make_anchors`), not
  a dummy forward (and not computed twice per step — reference quirk #3);
* the final 1×1 projections run as plain convs with bias (no BN), exactly as
  the reference's ``nn.Conv2d`` finals (:50, :60).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from custom_yolo_tpu.core.dtypes import DTypePolicy
from custom_yolo_tpu.nn.blocks import ConvBN
from custom_yolo_tpu.ops.anchors import make_anchors

PRIOR_PROB = 1e-2  # classification bias prior (reference head.py:68)


class Head(nn.Module):
    num_classes: int
    filters: Tuple[int, ...]          # channels of (p3, p4, p5)
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False

    @property
    def no(self) -> int:
        return self.num_classes + 4 * self.reg_max

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        nc, rm = self.num_classes, self.reg_max
        box_ch = max(64, self.filters[0] // 4)
        cls_ch = max(80, self.filters[0], nc)
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        cls_bias = math.log(PRIOR_PROB / (1 - PRIOR_PROB))

        outs: List[jax.Array] = []
        for i, x in enumerate(feats):
            in_ch = x.shape[-1]
            b = ConvBN(box_ch, kernel_size=3, padding=1,
                       name=f"box{i}_conv1", **kw)(x, train)
            b = ConvBN(box_ch, kernel_size=3, padding=1,
                       name=f"box{i}_conv2", **kw)(b, train)
            b = nn.Conv(4 * rm, kernel_size=(1, 1), use_bias=True,
                        dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype,
                        name=f"box{i}_out")(b)

            c = ConvBN(in_ch, kernel_size=3, padding=1, groups=in_ch,
                       name=f"cls{i}_dw1", **kw)(x, train)
            c = ConvBN(cls_ch, name=f"cls{i}_pw1", **kw)(c, train)
            c = ConvBN(cls_ch, kernel_size=3, padding=1, groups=cls_ch,
                       name=f"cls{i}_dw2", **kw)(c, train)
            c = ConvBN(cls_ch, name=f"cls{i}_pw2", **kw)(c, train)
            c = nn.Conv(nc, kernel_size=(1, 1), use_bias=True,
                        bias_init=nn.initializers.constant(cls_bias),
                        dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype,
                        name=f"cls{i}_out")(c)

            n, h, w, _ = b.shape
            outs.append(jnp.concatenate([b, c], axis=-1).reshape(n, h * w,
                                                                 self.no))

        preds = jnp.concatenate(outs, axis=1)  # (N, M, 4*reg_max + nc)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_arr = make_anchors(feat_shapes, self.strides,
                                           offset=0.5)
        return preds, anchors, stride_arr
