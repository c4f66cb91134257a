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
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from custom_yolo_tpu.core.dtypes import DTypePolicy
from custom_yolo_tpu.nn.blocks import ConvBN
from custom_yolo_tpu.ops.anchors import make_anchors

PRIOR_PROB = 1e-2  # classification bias prior (reference head.py:68)


class _KB(nn.Module):
    """Declares {kernel, bias} without computing — lets the fused Pallas
    cls-tower read ConvBN-shaped params from the standard tree. Must match
    the conv branch's param dtype and bias init so a fresh init under
    ``pallas_cls_tower=True`` stays interchangeable with the standard path
    (and with saved checkpoints)."""

    kshape: Tuple[int, ...]
    param_dtype: Any = jnp.float32
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.zeros, self.kshape,
                       self.param_dtype)
        b = self.param("bias", self.bias_init, (self.kshape[-1],),
                       self.param_dtype)
        return k, b


class _ConvParams(nn.Module):
    """Param holder matching a fused ConvBN subtree ({conv: {kernel,
    bias}})."""

    kshape: Tuple[int, ...]
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return _KB(self.kshape, param_dtype=self.param_dtype, name="conv")()


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
    # opt-in fused Pallas cls tower — measured negative at 640² (see
    # __call__); off by default
    pallas_cls_tower: bool = False

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

        # OPT-IN (measured NEGATIVE, default off): a fused all-VMEM cls
        # tower exists (ops/pallas/head_kernel.py) — the 5-conv chain via
        # XLA round-trips the level-0 tensor through HBM five times, but
        # the kernel's fp32 accumulator forces ~15-row chunks at 80² and
        # the chunked version measures 50 ms vs XLA's 21 ms at B=128
        # (docs/PERF.md). Kept for smaller-resolution serving experiments.
        use_pallas_cls = (self.pallas_cls_tower and self.fused
                          and not self.quantized and not train
                          and self.act_spec is None
                          and cls_ch % 128 == 0
                          and jax.devices()[0].platform == "tpu")

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

            if use_pallas_cls and in_ch % 128 == 0:
                from custom_yolo_tpu.ops.pallas.head_kernel import (
                    cls_tower_pallas)
                cd = self.policy.compute_dtype
                pd = self.policy.param_dtype
                dw1k, dw1b = _ConvParams((3, 3, 1, in_ch), param_dtype=pd,
                                         name=f"cls{i}_dw1")()
                pw1k, pw1b = _ConvParams((1, 1, in_ch, cls_ch),
                                         param_dtype=pd,
                                         name=f"cls{i}_pw1")()
                dw2k, dw2b = _ConvParams((3, 3, 1, cls_ch), param_dtype=pd,
                                         name=f"cls{i}_dw2")()
                pw2k, pw2b = _ConvParams((1, 1, cls_ch, cls_ch),
                                         param_dtype=pd,
                                         name=f"cls{i}_pw2")()
                outk, outb = _KB(
                    (1, 1, cls_ch, nc), param_dtype=pd,
                    bias_init=nn.initializers.constant(cls_bias),
                    name=f"cls{i}_out")()
                c = cls_tower_pallas(
                    x.astype(cd),
                    (dw1k.reshape(3, 3, in_ch).astype(cd),
                     dw1b.astype(cd)),
                    (pw1k.reshape(in_ch, cls_ch).astype(cd),
                     pw1b.astype(cd)),
                    (dw2k.reshape(3, 3, cls_ch).astype(cd),
                     dw2b.astype(cd)),
                    (pw2k.reshape(cls_ch, cls_ch).astype(cd),
                     pw2b.astype(cd)),
                    (outk.reshape(cls_ch, nc).astype(cd),
                     outb.astype(cd)))
            else:
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
