"""Target assignment — which anchor is responsible for which GT box.

Two assigners, both fully vectorized over (batch, GT, anchor) with padded
fixed-shape GT (no per-image python loop — the reference's hottest CPU
serialization point, ``src/model/losses.py:195-266``):

* :func:`nearest_center_assign` — behavioral parity with the reference:
  each GT claims the single anchor whose *predicted box center* is nearest
  to the GT center (``losses.py:211-215``, ``torch.cdist().argmin``).
* :func:`task_aligned_assign` — Task-Aligned Assigner (TOOD/ultralytics
  style), the quality configuration named by BASELINE.json's north star:
  anchors inside the GT box are scored by ``score^alpha * IoU^beta``; the
  top-k per GT are positives; conflicts resolve to the highest-IoU GT.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from custom_yolo_tpu.ops.boxes import box_iou_pairwise


class NearestAssignment(NamedTuple):
    """One anchor index per (padded) GT."""
    anchor_idx: jnp.ndarray   # (N, G) int32 — argmin anchor per GT
    valid: jnp.ndarray        # (N, G) bool — GT validity mask


def nearest_center_assign(gt_centers: jnp.ndarray,
                          pred_centers: jnp.ndarray,
                          gt_mask: jnp.ndarray) -> NearestAssignment:
    """gt_centers (N, G, 2) px, pred_centers (N, M, 2) px, gt_mask (N, G).

    Exact squared euclidean distance (argmin-equivalent to the reference's
    cdist). Direct difference, not the ``g²+m²-2gm`` matmul expansion: with
    only 2 coordinates there is no MXU win, XLA fuses the subtract-square-
    reduce without materializing (N, G, M, 2), and the expansion loses
    ~0.1px² to cancellation at image scale (enough to flip near-tie argmins
    vs the reference).
    """
    diff = gt_centers[:, :, None, :] - pred_centers[:, None, :, :]
    dist2 = jnp.sum(diff * diff, axis=-1)                        # (N, G, M)
    idx = jnp.argmin(dist2, axis=-1).astype(jnp.int32)
    return NearestAssignment(anchor_idx=idx, valid=gt_mask.astype(bool))


class TALAssignment(NamedTuple):
    target_boxes: jnp.ndarray    # (N, M, 4) xyxy px of assigned GT
    target_labels: jnp.ndarray   # (N, M) int32
    target_scores: Any           # (N, M, C) soft cls targets, or None when
                                 # dense_scores=False (the loss consumes the
                                 # sparse anchor_scores form instead)
    fg_mask: jnp.ndarray         # (N, M) bool — anchor is a positive
    anchor_scores: jnp.ndarray   # (N, M) soft score of the assigned class
                                 # (target_scores == one_hot(labels) * this)


def task_aligned_assign(pred_scores: jnp.ndarray,
                        pred_boxes_xyxy: jnp.ndarray,
                        anchor_points_px: jnp.ndarray,
                        gt_boxes_xyxy: jnp.ndarray,
                        gt_labels: jnp.ndarray,
                        gt_mask: jnp.ndarray,
                        num_classes: int,
                        topk: int = 10,
                        alpha: float = 0.5,
                        beta: float = 6.0,
                        eps: float = 1e-9,
                        dense_scores: bool = True) -> TALAssignment:
    """Vectorized TAL.

    Args:
      pred_scores: (N, M, C) sigmoid class scores.
      pred_boxes_xyxy: (N, M, 4) decoded boxes in pixels.
      anchor_points_px: (M, 2) anchor centers in pixels.
      gt_boxes_xyxy: (N, G, 4); gt_labels: (N, G); gt_mask: (N, G).
    """
    n, m, c = pred_scores.shape
    g = gt_boxes_xyxy.shape[1]
    gt_valid = gt_mask.astype(bool)

    # 1. candidate mask: anchor center strictly inside the GT box
    ax = anchor_points_px[None, None, :, 0]                       # (1,1,M)
    ay = anchor_points_px[None, None, :, 1]
    x1, y1 = gt_boxes_xyxy[..., 0:1], gt_boxes_xyxy[..., 1:2]     # (N,G,1)
    x2, y2 = gt_boxes_xyxy[..., 2:3], gt_boxes_xyxy[..., 3:4]
    in_box = ((ax > x1) & (ax < x2) & (ay > y1) & (ay < y2))      # (N,G,M)
    in_box &= gt_valid[..., None]

    # 2. alignment metric = score[gt_class]^alpha * IoU^beta
    iou = box_iou_pairwise(gt_boxes_xyxy, pred_boxes_xyxy)        # (N,G,M)
    iou = jnp.clip(iou, 0.0)
    labels_safe = jnp.clip(gt_labels, 0, num_classes - 1).astype(jnp.int32)
    # gather per-GT class scores: (N, M, C) → (N, G, M)
    cls_scores = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),                            # (N,C,M)
        labels_safe[..., None], axis=1)                            # (N,G,M)
    metric = (cls_scores ** alpha) * (iou ** beta)
    metric = jnp.where(in_box, metric, 0.0)

    # 3. top-k per GT by metric. ``lax.top_k`` lowers to a full per-row
    #    sort on TPU — for k=10 of M=8400 that sort dominated the TAL
    #    assigner (loss_only 34.9 ms vs nearest's 11.0 at B=16, r3
    #    breakdown). k rounds of argmax+mask are O(k·M) fused VPU work,
    #    select the exact same set (argmax takes the lowest index on ties,
    #    matching top_k's stable order), and build the (N, G, M) positive
    #    mask directly — no scatter needed.
    k = min(topk, m)
    pos = jnp.zeros((n, g, m), dtype=bool)
    remaining = metric
    for _ in range(k):
        best = jnp.argmax(remaining, axis=-1)                     # (N,G)
        hit = best[..., None] == jnp.arange(m)[None, None, :]     # (N,G,M)
        # the argmax VALUE via max-reduce, not a lane-indexed gather
        # (scalar gathers along the minor dim are near-serial on XLA:TPU)
        ok = jnp.max(remaining, axis=-1, keepdims=True) > eps     # (N,G,1)
        pos |= hit & ok
        remaining = jnp.where(hit, -jnp.inf, remaining)
    pos &= in_box

    # 4. conflict resolution: anchor claimed by >1 GT → keep highest IoU
    masked_iou = jnp.where(pos, iou, -1.0)                        # (N,G,M)
    best_gt = jnp.argmax(masked_iou, axis=1).astype(jnp.int32)    # (N,M)
    fg = jnp.any(pos, axis=1)                                     # (N,M)
    keep = jax.nn.one_hot(best_gt, g, axis=1, dtype=bool) & pos   # (N,G,M)
    pos = keep

    # 5. gather per-anchor targets
    tb = jnp.take_along_axis(gt_boxes_xyxy, best_gt[..., None], axis=1)
    tl = jnp.take_along_axis(labels_safe, best_gt, axis=1)        # (N,M)
    tl = jnp.where(fg, tl, 0)

    # 6. normalized soft scores: per GT, scale metric so its max equals the
    #    GT's max IoU; anchor score = its (normalized) metric.
    metric_pos = jnp.where(pos, metric, 0.0)
    max_metric = jnp.max(metric_pos, axis=-1, keepdims=True)      # (N,G,1)
    max_iou = jnp.max(jnp.where(pos, iou, 0.0), axis=-1, keepdims=True)
    norm = metric_pos * max_iou / (max_metric + eps)              # (N,G,M)
    anchor_score = jnp.max(norm, axis=1)                          # (N,M)
    if dense_scores:
        target_scores = (jax.nn.one_hot(tl, num_classes,
                                        dtype=anchor_score.dtype)
                         * anchor_score[..., None])
        target_scores = jnp.where(fg[..., None], target_scores, 0.0)
    else:
        # the loss consumes the (N, M) sparse form (anchor_scores + labels)
        # directly — skip materializing the (N, M, C) one-hot product
        target_scores = None

    return TALAssignment(target_boxes=tb, target_labels=tl,
                         target_scores=target_scores, fg_mask=fg,
                         anchor_scores=jnp.where(fg, anchor_score, 0.0))
