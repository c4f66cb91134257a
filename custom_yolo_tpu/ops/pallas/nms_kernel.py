"""Pallas TPU kernel: greedy NMS suppression sweep.

The TPU-native replacement for the ``torchvision.ops.nms`` C++/CUDA kernel
the reference calls per image (``src/utils/model_utils.py:264``) — the one
genuinely native component of the reference stack (SURVEY §2.3).

Design (per image, grid over the batch):

* candidates arrive score-sorted (host of the op does ``top_k``), boxes as
  a transposed (8, K) layout — x1/y1/x2/y2(+areas) in separate sublane rows
  so every loop step is pure (1, K) VPU work on the 128-lane axis;
* the K×K IoU matrix is never materialized: step ``i`` recomputes row ``i``
  of it in registers (O(K) memory instead of O(K²) — the whole problem
  stays in VMEM);
* the greedy sweep is a ``fori_loop``; a kept box masks all later boxes
  overlapping it above the threshold. Result equals sequential greedy NMS
  exactly.

The pure-XLA fallback (`custom_yolo_tpu.ops.nms`) computes the same
keep-mask via a materialized IoU matrix; `batched_nms(..., backend="pallas")`
routes here on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(rows_ref, valid_ref, keep_ref, *, iou_thres: float):
    """rows_ref: (8, K) f32 = [x1, y1, x2, y2, area, 0, 0, 0] (sorted by
    descending score); valid_ref: (1, K) i32; keep_ref: (1, K) i32 out.

    Scalars of the current box are extracted with masked lane reductions
    (``sum(where(col==i, vec, 0))``) — Mosaic cannot lower dynamic
    lane-indexed scalar loads from VMEM, and a (1, K) reduce per scalar is
    VPU-trivial.
    """
    k = rows_ref.shape[1]
    x1 = rows_ref[0:1, :]
    y1 = rows_ref[1:2, :]
    x2 = rows_ref[2:3, :]
    y2 = rows_ref[3:4, :]
    area = rows_ref[4:5, :]

    keep_ref[:, :] = valid_ref[:, :]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def lane(vec, i):
        return jnp.sum(jnp.where(col == i, vec, 0.0))

    def body(i, _):
        kept_i = jnp.sum(jnp.where(col == i, keep_ref[:, :], 0)) > 0

        @pl.when(kept_i)
        def _():
            bx1 = lane(x1, i)
            by1 = lane(y1, i)
            bx2 = lane(x2, i)
            by2 = lane(y2, i)
            barea = lane(area, i)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (area + barea - inter + 1e-7)
            suppress = (iou > iou_thres) & (col > i)
            keep_ref[:, :] = jnp.where(suppress, 0, keep_ref[:, :])

        return 0

    jax.lax.fori_loop(0, k, body, 0)


IMG_TILE = 8  # images per program instance (sublane dim of the VPU)


def _nms_kernel_batched(x1_ref, y1_ref, x2_ref, y2_ref, area_ref,
                        valid_ref, keep_ref, *, iou_thres: float):
    """Process IMG_TILE images per program: every ref is (IMG_TILE, K) with
    images in sublanes, candidates in lanes — each sweep step is one
    (8, K) VPU op instead of (1, K), filling the vector unit.

    Per-image conditionality (`is box i of image j still kept?`) cannot be a
    control-flow gate across disagreeing images, so it folds into the
    suppression mask as a (8, 1) multiplier.
    """
    k = x1_ref.shape[1]
    x1 = x1_ref[:, :]
    y1 = y1_ref[:, :]
    x2 = x2_ref[:, :]
    y2 = y2_ref[:, :]
    area = area_ref[:, :]

    keep_ref[:, :] = valid_ref[:, :]

    col = jax.lax.broadcasted_iota(jnp.int32, (IMG_TILE, k), 1)

    def lane(vec, i):
        """(8, K) → (8, 1): per-image value at lane i."""
        return jnp.sum(jnp.where(col == i, vec, 0.0), axis=1, keepdims=True)

    def body(i, _):
        sel = col == i
        kept_i = jnp.sum(jnp.where(sel, keep_ref[:, :], 0), axis=1,
                         keepdims=True) > 0                   # (8, 1)
        bx1 = lane(x1, i)
        by1 = lane(y1, i)
        bx2 = lane(x2, i)
        by2 = lane(y2, i)
        barea = lane(area, i)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-7)
        suppress = (iou > iou_thres) & (col > i) & kept_i
        keep_ref[:, :] = jnp.where(suppress, 0, keep_ref[:, :])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def nms_keep_pallas_batched(boxes_sorted: jnp.ndarray, valid: jnp.ndarray,
                            iou_thres: float = 0.45,
                            interpret: bool = False) -> jnp.ndarray:
    """Sublane-packed variant of :func:`nms_keep_pallas`: IMG_TILE images
    per program instance. Same exact keep-set; ~IMG_TILE× better VPU
    utilization when the batch is large."""
    n, k, _ = boxes_sorted.shape
    pad = (-n) % IMG_TILE
    b = boxes_sorted.astype(jnp.float32)
    v = valid.astype(jnp.int32)
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, k, 4), jnp.float32)], 0)
        v = jnp.concatenate([v, jnp.zeros((pad, k), jnp.int32)], 0)
    x1, y1, x2, y2 = (b[..., i] for i in range(4))
    area = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])

    n_pad = n + pad
    spec = pl.BlockSpec((IMG_TILE, k), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel_batched, iou_thres=iou_thres),
        grid=(n_pad // IMG_TILE,),
        in_specs=[spec] * 6,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        interpret=interpret,
    )(x1, y1, x2, y2, area, v)
    return keep[:n] > 0


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def nms_keep_pallas(boxes_sorted: jnp.ndarray, valid: jnp.ndarray,
                    iou_thres: float = 0.45,
                    interpret: bool = False) -> jnp.ndarray:
    """boxes_sorted (N, K, 4) xyxy score-sorted desc, valid (N, K) bool →
    keep (N, K) bool. K should be a multiple of 128 for lane alignment."""
    n, k, _ = boxes_sorted.shape
    b = boxes_sorted.astype(jnp.float32)
    area = ((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]))[..., None]
    zeros = jnp.zeros((n, k, 3), jnp.float32)
    rows = jnp.concatenate([b, area, zeros], axis=-1)       # (N, K, 8)
    rows = jnp.transpose(rows, (0, 2, 1))                    # (N, 8, K)
    valid_i = valid.astype(jnp.int32)[:, None, :]            # (N, 1, K)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=iou_thres),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, k), jnp.int32),
        interpret=interpret,
    )(rows, valid_i)
    return keep[:, 0, :] > 0
