"""Box geometry ops (pure jnp, fully batched, jit/vmap-safe).

Equivalents of the reference's geometry toolbox
(``src/utils/model_utils.py``: dist2bbox :120-129, box_iou :131-151,
xywh2xyxy :153-172) and the loss-side IoU (``src/model/losses.py:9-40``).
Note the reference's ``bbox_iou`` carries an operand-swap bug on box1's y2
(losses.py:20, SURVEY §7 quirk #1); this implementation is correct — parity
tests account for the difference explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-xywh → corner-xyxy (reference model_utils.py:153-172)."""
    xy, wh = boxes[..., :2], boxes[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner-xyxy → center-xywh."""
    tl, br = boxes[..., :2], boxes[..., 2:4]
    return jnp.concatenate([(tl + br) * 0.5, br - tl], axis=-1)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray,
              xywh: bool = True) -> jnp.ndarray:
    """ltrb distances (..., 4) + anchor centers (..., 2) → boxes (..., 4)
    (reference model_utils.py:120-129, anchor-major layout)."""
    lt, rb = distance[..., :2], distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(boxes_xyxy: jnp.ndarray, anchor_points: jnp.ndarray,
              reg_max: int) -> jnp.ndarray:
    """Inverse of dist2bbox: targets ltrb clamped to [0, reg_max-1-0.01]
    (the DFL target construction, reference losses.py:238-246)."""
    x1y1, x2y2 = boxes_xyxy[..., :2], boxes_xyxy[..., 2:4]
    lt = anchor_points - x1y1
    rb = x2y2 - anchor_points
    return jnp.clip(jnp.concatenate([lt, rb], axis=-1), 0, reg_max - 1 - 0.01)


def box_iou_pairwise(boxes1_xyxy: jnp.ndarray, boxes2_xyxy: jnp.ndarray,
                     eps: float = 1e-7) -> jnp.ndarray:
    """All-pairs IoU: (..., N, 4) × (..., M, 4) → (..., N, M)
    (reference model_utils.py:131-151 / metrics.py:6-41)."""
    a = boxes1_xyxy[..., :, None, :]
    b = boxes2_xyxy[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def box_iou_aligned(boxes1_xyxy: jnp.ndarray, boxes2_xyxy: jnp.ndarray,
                    eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays: (..., 4) × (..., 4) → (...,)
    (corrected form of reference losses.py:9-40)."""
    lt = jnp.maximum(boxes1_xyxy[..., :2], boxes2_xyxy[..., :2])
    rb = jnp.minimum(boxes1_xyxy[..., 2:4], boxes2_xyxy[..., 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = ((boxes1_xyxy[..., 2] - boxes1_xyxy[..., 0])
             * (boxes1_xyxy[..., 3] - boxes1_xyxy[..., 1]))
    area2 = ((boxes2_xyxy[..., 2] - boxes2_xyxy[..., 0])
             * (boxes2_xyxy[..., 3] - boxes2_xyxy[..., 1]))
    return inter / (area1 + area2 - inter + eps)


def box_ciou(boxes1_xyxy: jnp.ndarray, boxes2_xyxy: jnp.ndarray,
             eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise Complete-IoU (aligned shapes): IoU − center-dist/diag −
    aspect-ratio penalty. Not present in the reference (its north star names
    CIoU, BASELINE.json) — used by the TAL quality configuration."""
    iou = box_iou_aligned(boxes1_xyxy, boxes2_xyxy, eps)

    c1 = (boxes1_xyxy[..., :2] + boxes1_xyxy[..., 2:4]) * 0.5
    c2 = (boxes2_xyxy[..., :2] + boxes2_xyxy[..., 2:4]) * 0.5
    rho2 = jnp.sum((c1 - c2) ** 2, axis=-1)

    enc_tl = jnp.minimum(boxes1_xyxy[..., :2], boxes2_xyxy[..., :2])
    enc_br = jnp.maximum(boxes1_xyxy[..., 2:4], boxes2_xyxy[..., 2:4])
    diag2 = jnp.sum((enc_br - enc_tl) ** 2, axis=-1) + eps

    w1 = boxes1_xyxy[..., 2] - boxes1_xyxy[..., 0]
    h1 = boxes1_xyxy[..., 3] - boxes1_xyxy[..., 1]
    w2 = boxes2_xyxy[..., 2] - boxes2_xyxy[..., 0]
    h2 = boxes2_xyxy[..., 3] - boxes2_xyxy[..., 1]
    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / (h2 + eps))
                             - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - rho2 / diag2 - alpha * v
