"""Functional NN blocks (flax.linen, NHWC).

Behavioral equivalents of the reference blocks in
``/root/reference/src/model/model_blocks.py`` (Conv :4-37, Residual :39-62,
C3K :64-92, C3K2 :94-125, SPPF :127-156, Attention :158-198, PSABlock
:200-224, PSA :226-252) — re-designed TPU-first:

* NHWC layout (XLA:TPU's native conv layout; channels ride the 128-lane dim)
* bf16 compute / fp32 params & BatchNorm statistics (``DTypePolicy``)
* optional cross-replica sync-BN via ``axis_name`` (the structural fix for
  BN-under-data-parallelism; the reference ran unsynced BN per rank)
* conv+BN folding for inference handled by a param-tree transform
  (:func:`custom_yolo_tpu.models.detector.fuse_params`) instead of module
  surgery (reference ``Model.fuse``, model_builder.py:52-58).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from custom_yolo_tpu.core.dtypes import DTypePolicy

# BatchNorm constants matching the reference (model_blocks.py:28):
# torch BatchNorm2d(eps=1e-3, momentum=0.03) == flax momentum 0.97.
BN_EPS = 1e-3
BN_MOMENTUM = 0.97

# C3K horizontal merge self-gate: below this half-width the merged split's
# lane-offset slice triggers a pathological XLA relayout that outweighs the
# merge win (measured: half=48 at 160² doubles the stage time; half>=96
# halves it). See C3K docstring.
MERGE_MIN_HALF = 64


class _QuantConv(nn.Module):
    """int8 conv leaf for the quantized serving path: reads the
    {kernel int8, scale, bias} tree written by
    :func:`custom_yolo_tpu.ops.quant.quantize_fused_params` and runs the
    int8 conv (act applied by the parent ConvBN).

    Two modes, selected by the param tree (no module flag):

    * **dynamic** — per-batch absmax activation scale (r2). Correct but
      measured 2× slower than bf16: the absmax reduce + round/clip cost a
      full extra pass over every activation (docs/PERF.md). Used for
      calibration: when the ``quant_stats`` collection is mutable, the
      observed input absmax is sown for :func:`bake_static_scales`.
    * **static** — the leaf carries a calibrated ``in_scale`` param
      (``ops.quant.bake_static_scales``): quantization is elementwise
      (XLA fuses it into the producer's epilogue) and the int8 MXU rate
      (≈1.9× bf16 on 3×3 convs, v5e) survives end-to-end."""

    features: int
    kernel_size: int
    strides: int
    padding: Any
    groups: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from custom_yolo_tpu.ops.quant import (int8_conv, int8_conv_static,
                                               quantize_act_int8)

        k = self.kernel_size
        cin = x.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.zeros,
                            (k, k, cin, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.has_variable("params", "in_scale"):
            in_scale = self.param("in_scale", nn.initializers.ones,
                                  (), jnp.float32)
            return int8_conv_static(x, kernel, scale, bias, in_scale,
                                    strides=(self.strides, self.strides),
                                    padding=tuple(self.padding),
                                    groups=self.groups, act=False)
        # calibration tap: a no-op unless apply() made "quant_stats"
        # mutable (XLA DCEs the duplicate absmax otherwise — it is the
        # same reduction int8_conv computes)
        _, ascale = quantize_act_int8(x)
        self.sow("quant_stats", "in_absmax", ascale * 127.0,
                 init_fn=lambda: jnp.float32(0.0), reduce_fn=jnp.maximum)
        return int8_conv(x, kernel, scale, bias,
                         strides=(self.strides, self.strides),
                         padding=tuple(self.padding), groups=self.groups,
                         act=False)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation — the universal unit
    (reference ``Conv``, model_blocks.py:4-37).

    When ``fused=True`` the BN has been folded into the conv kernel/bias by
    ``fuse_params`` and this module runs conv(+bias)+act only — the
    inference-time fast path (reference ``fuse_forward``, :36-37).
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    padding: Any = 0            # int p → ((p,p),(p,p)); or explicit pairs
    groups: int = 1
    act: Optional[Callable] = jax.nn.silu  # None == identity
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None     # set to sync BN across replicas
    # PartitionSpec pinning the block output batch-sharded under a mesh —
    # gives the GSPMD partitioner a fixed activation layout so fsdp param
    # shardings can't leak into activations (involuntary rematerialization)
    act_spec: Optional[Any] = None

    fused: bool = False
    # int8 serving path (requires fused=True): conv params are
    # {kernel int8, scale fp32, bias fp32} from ops.quant.
    # quantize_fused_params; the MXU contracts int8×int8→int32 at 2× the
    # bf16 rate on v5e
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k, p = self.kernel_size, self.padding
        pad = ((p, p), (p, p)) if isinstance(p, int) else tuple(p)
        if self.fused and self.quantized:
            x = _QuantConv(self.features, k, self.strides, pad, self.groups,
                           name="conv")(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(k, k),
                strides=(self.strides, self.strides),
                padding=pad,
                feature_group_count=self.groups,
                use_bias=self.fused,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name="conv",
            )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                axis_name=self.bn_axis_name if train else None,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        if self.act_spec is not None:
            x = jax.lax.with_sharding_constraint(x, self.act_spec)
        return x


class Residual(nn.Module):
    """Two-layer 3x3 bottleneck with additive skip (reference ``Residual``,
    model_blocks.py:39-62)."""

    ch: int
    e: float = 0.5
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mid = int(self.ch * self.e)
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        y = ConvBN(mid, kernel_size=3, padding=1, name="conv1", **kw)(x, train)
        y = ConvBN(self.ch, kernel_size=3, padding=1, name="conv2", **kw)(y, train)
        return x + y


class C3K(nn.Module):
    """CSP sub-block: split conv1/conv2, 2×Residual(e=1.0) on one branch,
    concat → conv3 (reference ``C3K``, model_blocks.py:64-92).

    ``merged=True`` (serving): conv1 and conv2 both read the same input and
    each emit ``half`` channels — per-output-channel math is independent, so
    they run as ONE 2·half-wide conv (``conv12``) and split. Exactly
    output-preserving; doubles MXU lane utilization for the pair (half <
    128 lanes on every preset) and reads the input tensor from HBM once
    instead of twice. Params come from ``models.detector.merge_c3k_params``.

    Measured on v5e (x preset, B=64, 640²): the merge roughly HALVES the
    p3/p4/p5 CSP stage times, but at half=48 (the flagship's p2) the
    lane-offset-48 split sends XLA down a pathological relayout path
    (p2_csp 38→74 ms) — so the merge self-gates to ``half >= 64``
    (MERGE_MIN_HALF); :func:`~custom_yolo_tpu.models.detector.
    merge_c3k_params` applies the same gate to the param tree.
    """

    out_ch: int
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False
    merged: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = self.out_ch // 2
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        if self.merged and half >= MERGE_MIN_HALF:
            yz = ConvBN(2 * half, name="conv12", **kw)(x, train)
            y, z = jnp.split(yz, 2, axis=-1)
        else:
            y = ConvBN(half, name="conv1", **kw)(x, train)
            z = ConvBN(half, name="conv2", **kw)(x, train)
        y = Residual(half, e=1.0, name="res0", **kw)(y, train)
        y = Residual(half, e=1.0, name="res1", **kw)(y, train)
        out = jnp.concatenate([y, z], axis=-1)
        return ConvBN(self.out_ch, name="conv3", **kw)(out, train)


class C3K2(nn.Module):
    """Main CSP stage block (reference ``C3K2``, model_blocks.py:94-125):
    conv1 → split(2), n progressively-applied inner blocks (Residual or C3K),
    concat all → conv2."""

    out_ch: int
    n: int
    csp: bool
    r: int
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False
    merged: bool = False  # horizontal conv1/conv2 merge in the C3K children

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = self.out_ch // self.r
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        y = ConvBN(2 * hidden, name="conv1", **kw)(x, train)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.csp:
                blk = C3K(hidden, name=f"m{i}", merged=self.merged, **kw)
            else:
                blk = Residual(hidden, e=0.5, name=f"m{i}", **kw)
            parts.append(blk(parts[-1], train))
        out = jnp.concatenate(parts, axis=-1)
        return ConvBN(self.out_ch, name="conv2", **kw)(out, train)


def _maxpool_same(x: jax.Array, k: int) -> jax.Array:
    """k×k stride-1 max-pool with SAME-style padding (k odd)."""
    p = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 1×1 reduce, 3 chained 5×5 max-pools,
    4-way concat, 1×1 out (reference ``SPPF``, model_blocks.py:127-156)."""

    out_ch: int
    k: int = 5
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_in = x.shape[-1]
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        x = ConvBN(c_in // 2, name="cv1", **kw)(x, train)
        # NOTE: a fused all-VMEM pooling pyramid exists
        # (ops/pallas/sppf_kernel.py, bit-exact, tested) but measured
        # NEUTRAL end-to-end (627.6 vs 630.0 img/s at B=128) — XLA already
        # fuses the reduce_window chain well, so the default stays XLA.
        y1 = _maxpool_same(x, self.k)
        y2 = _maxpool_same(y1, self.k)
        y3 = _maxpool_same(y2, self.k)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBN(self.out_ch, name="cv2", **kw)(out, train)


class Attention(nn.Module):
    """Lightweight spatial MHSA with a depthwise positional branch
    (reference ``Attention``, model_blocks.py:158-198).

    TPU note: runs only at P5 (≤400 tokens at 640²) so the full (hw×hw)
    attention matrix fits trivially in VMEM; softmax/matmuls map straight to
    MXU — with a fused all-VMEM Pallas kernel for serving/eval
    (ops/pallas/attention_kernel.py) and the einsum path for training.
    """

    num_head: int
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False
    # opt-in: use the differentiable Pallas kernel (custom VJP, flash-style
    # recompute backward) in TRAINING too — kills the (b,nh,t,t) HBM score
    # tensors in both directions. Off by default: numerics differ from the
    # einsum path by ~0.13% (fp32 softmax in VMEM vs HBM round-trips).
    pallas_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        nh = self.num_head
        dim_head = c // nh
        dim_key = dim_head // 2
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)

        qkv = ConvBN(c + dim_key * nh * 2, act=None, name="qkv", **kw)(x, train)
        # token-major (b, t, nh·(2·dk+dh)) — tokens in sublanes, head dims
        # in lanes (TPU-friendly; the reference works channel-major).
        tokens = qkv.reshape(b, h * w, -1)
        from custom_yolo_tpu.ops.pallas.attention_kernel import (
            psa_attention, psa_attention_reference)

        # fused all-VMEM kernel for the fused serving path on TPU (no
        # (b,nh,t,t) HBM score tensors — docs/PERF.md). The kernel now
        # carries a custom VJP (Pallas backward, softmax recomputed from
        # qkv), so pallas_attention=True additionally enables it for
        # training; the default keeps the einsum path everywhere except
        # fused serving (eval numerics differ ~0.13% from einsum).
        t = h * w
        shape_ok = t >= 8 and t % 8 == 0
        on_tpu = jax.devices()[0].platform == "tpu"
        use_pallas = (((self.fused and not train) or self.pallas_attention)
                      and shape_ok and on_tpu)
        if use_pallas:
            out_tok, v_tok = psa_attention(tokens, nh, dim_key, dim_head)
        else:
            out_tok, v_tok = psa_attention_reference(tokens, nh, dim_key,
                                                     dim_head)
        out = out_tok.reshape(b, h, w, c)
        v_spatial = v_tok.reshape(b, h, w, c)
        pos = ConvBN(c, kernel_size=3, padding=1, groups=c, act=None,
                     name="pe", **kw)(v_spatial, train)
        return ConvBN(c, act=None, name="proj", **kw)(out + pos, train)


class PSABlock(nn.Module):
    """Attention residual + 2-conv MLP residual (reference ``PSABlock``,
    model_blocks.py:200-224)."""

    num_head: int
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False
    pallas_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        x = x + Attention(self.num_head, name="attn",
                          pallas_attention=self.pallas_attention,
                          **kw)(x, train)
        y = ConvBN(c * 2, name="ffn1", **kw)(x, train)
        y = ConvBN(c, act=None, name="ffn2", **kw)(y, train)
        return x + y


class PSA(nn.Module):
    """Split-channel CSP wrapper around n PSABlocks (reference ``PSA``,
    model_blocks.py:226-252; heads = ch//128 per the reference :245)."""

    n: int
    policy: DTypePolicy = DTypePolicy()
    bn_axis_name: Optional[str] = None
    act_spec: Optional[Any] = None
    fused: bool = False
    quantized: bool = False
    pallas_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name,
                  act_spec=self.act_spec, fused=self.fused,
                  quantized=self.quantized)
        y = ConvBN(2 * (c // 2), name="conv1", **kw)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        num_head = max(1, (c // 2) // 64)  # == reference ch//128 heads on c/2
        for i in range(self.n):
            b = PSABlock(num_head, name=f"m{i}",
                         pallas_attention=self.pallas_attention,
                         **kw)(b, train)
        out = jnp.concatenate([a, b], axis=-1)
        return ConvBN(c, name="conv2", **kw)(out, train)
