"""Batched, fixed-shape non-max suppression.

TPU-native replacement for the reference's ``non_max_suppression``
(``src/utils/model_utils.py:174-279``), which loops per image in python and
calls the ``torchvision.ops.nms`` C++/CUDA kernel (:264) on dynamically-sized
candidate sets. XLA needs static shapes, so the design is:

1. gate by confidence and take a fixed ``top_k`` candidate pool per image
   (the analogue of the reference's ``max_nms=30000`` cap, :211/:259);
2. offset boxes by ``class_id * max_wh`` for class-aware suppression
   (identical trick to the reference :262-263);
3. exact greedy suppression over the sorted pool via a precomputed
   (top_k × top_k) IoU matrix and a ``fori_loop`` — same keep-set as the
   sequential algorithm;
4. emit fixed-shape ``(max_det)`` outputs + a validity mask (the reference's
   ``max_det=300`` cap, :183).

Everything is vmapped over the batch and jit-compatible. A Pallas kernel
(`custom_yolo_tpu.ops.pallas.nms_pallas`) accelerates step 3 on TPU; this
module is the portable reference implementation used on CPU and in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from custom_yolo_tpu.ops.boxes import box_iou_pairwise

MAX_WH = 7680.0  # class-offset magnitude (reference model_utils.py:210)


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (N, max_det, 4) xyxy
    scores: jnp.ndarray   # (N, max_det)
    classes: jnp.ndarray  # (N, max_det) int32
    valid: jnp.ndarray    # (N, max_det) bool
    num_valid: jnp.ndarray  # (N,) int32


def _suppress(iou: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """Exact greedy NMS keep-mask over score-sorted candidates.

    iou: (K, K) IoU matrix of candidates sorted by descending score.
    Returns keep: (K,) bool.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        row = iou[i]
        # suppress strictly-later boxes overlapping box i — only if i is kept
        sup = (row > iou_thres) & (idx > i) & keep[i]
        return keep & jnp.logical_not(sup)

    return jax.lax.fori_loop(0, k, body, jnp.ones((k,), dtype=bool))


def _single_image_nms(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
                      classes: jnp.ndarray, *, conf_thres: float,
                      iou_thres: float, top_k: int, max_det: int,
                      agnostic: bool):
    m = scores.shape[0]
    k = min(top_k, m)

    gated = jnp.where(scores > conf_thres, scores, -1.0)
    cand_scores, cand_idx = jax.lax.top_k(gated, k)
    cand_boxes = boxes_xyxy[cand_idx]
    cand_classes = classes[cand_idx]
    cand_valid = cand_scores > conf_thres

    if agnostic:
        shifted = cand_boxes
    else:
        offset = cand_classes.astype(cand_boxes.dtype) * MAX_WH
        shifted = cand_boxes + offset[:, None]
    iou = box_iou_pairwise(shifted, shifted)

    keep = _suppress(iou, iou_thres) & cand_valid
    final_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, out_idx = jax.lax.top_k(final_scores, min(max_det, k))
    out_valid = out_scores > conf_thres
    out_boxes = cand_boxes[out_idx]
    out_classes = cand_classes[out_idx]
    num = jnp.sum(out_valid.astype(jnp.int32))
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return out_boxes, out_scores, out_classes, out_valid, num


@functools.partial(jax.jit, static_argnames=(
    "conf_thres", "iou_thres", "top_k", "max_det", "agnostic"))
def batched_nms(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, *, conf_thres: float = 0.25,
                iou_thres: float = 0.45, top_k: int = 1024,
                max_det: int = 300, agnostic: bool = False) -> NMSResult:
    """Class-aware hard NMS over a batch.

    Args:
      boxes_xyxy: (N, M, 4) float boxes in xyxy pixel coords.
      scores: (N, M) best-class confidence per box.
      classes: (N, M) int class ids.
    Returns fixed-shape :class:`NMSResult` (pad entries have valid=False).
    """
    fn = functools.partial(
        _single_image_nms, conf_thres=conf_thres, iou_thres=iou_thres,
        top_k=top_k, max_det=max_det, agnostic=agnostic)
    b, s, c, v, n = jax.vmap(fn)(
        boxes_xyxy.astype(jnp.float32), scores.astype(jnp.float32),
        classes.astype(jnp.int32))
    return NMSResult(b, s, c, v, n)


def nms_to_lists(result: NMSResult):
    """Fixed-shape NMS output → per-image python lists of (n, 6)
    [x1,y1,x2,y2,conf,cls] numpy arrays — the reference's output convention
    (model_utils.py:189) for the user-facing inference API."""
    import numpy as np
    boxes = np.asarray(result.boxes)
    scores = np.asarray(result.scores)
    classes = np.asarray(result.classes)
    valid = np.asarray(result.valid)
    out = []
    for i in range(boxes.shape[0]):
        v = valid[i]
        det = np.concatenate([
            boxes[i][v], scores[i][v, None],
            classes[i][v, None].astype(np.float32)], axis=1)
        out.append(det)
    return out
