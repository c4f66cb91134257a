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

Parity note — ``time_limit``: the reference aborts NMS after a wall-clock
budget (``model_utils.py:212,275-277``, 0.05 s + 0.05 s/img) and returns
partial results. That escape hatch has NO analogue here by design: a jitted
fixed-shape XLA program has a statically bounded runtime (top_k² IoU matrix
+ top_k-iteration loop), so there is no pathological input that could need
a timeout — the condition the hatch guards against cannot occur. Documented
non-feature, not an omission.
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


def _suppress(iou: jnp.ndarray, iou_thres: float,
              init_keep: jnp.ndarray = None) -> jnp.ndarray:
    """Exact greedy NMS keep-mask over score-sorted candidates.

    iou: (K, K) IoU matrix of candidates sorted by descending score.
    init_keep: optional (K,) bool — entries starting False never suppress
      (same semantics as the Pallas kernel's validity init).
    Returns keep: (K,) bool.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        row = iou[i]
        # suppress strictly-later boxes overlapping box i — only if i is kept
        sup = (row > iou_thres) & (idx > i) & keep[i]
        return keep & jnp.logical_not(sup)

    init = jnp.ones((k,), dtype=bool) if init_keep is None else init_keep
    return jax.lax.fori_loop(0, k, body, init)


def _gather_candidates(boxes_xyxy, scores, classes, *, conf_thres, top_k):
    """Per image: confidence gate + top-k pool, score-sorted."""
    m = scores.shape[0]
    k = min(top_k, m)
    gated = jnp.where(scores > conf_thres, scores, -1.0)
    cand_scores, cand_idx = jax.lax.top_k(gated, k)
    return (boxes_xyxy[cand_idx], cand_scores, classes[cand_idx],
            cand_scores > conf_thres)


def _select_result(cand_boxes, cand_scores, cand_classes, keep, *,
                   conf_thres, max_det):
    k = cand_scores.shape[-1]
    final_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, out_idx = jax.lax.top_k(final_scores, min(max_det, k))
    out_valid = out_scores > conf_thres
    take = lambda a: jnp.take_along_axis(
        a, out_idx if a.ndim == out_idx.ndim else out_idx[..., None],
        axis=-1 if a.ndim == out_idx.ndim else -2)
    num = jnp.sum(out_valid.astype(jnp.int32), axis=-1)
    return (take(cand_boxes), jnp.where(out_valid, out_scores, 0.0),
            take(cand_classes), out_valid, num)


def _merge_boxes(shifted, cand_boxes, cand_scores, cand_valid, keep,
                 iou_thres):
    """Merge-NMS for one image (reference model_utils.py:266-272): each
    kept box becomes the score-weighted mean of every candidate (kept or
    suppressed) overlapping it above ``iou_thres`` in class-offset space;
    ``redundant`` drops kept boxes with no second supporter."""
    iou = box_iou_pairwise(shifted, shifted)               # (K, K)
    overlap = (iou > iou_thres) & cand_valid[None, :]
    w = overlap * jnp.where(cand_valid, cand_scores, 0.0)[None, :]
    merged = (w @ cand_boxes) / jnp.maximum(
        w.sum(-1, keepdims=True), 1e-12)
    boxes = jnp.where(keep[:, None], merged, cand_boxes)
    redundant_keep = keep & (overlap.sum(-1) > 1)          # self counts once
    return boxes, redundant_keep


@functools.partial(jax.jit, static_argnames=(
    "conf_thres", "iou_thres", "top_k", "max_det", "agnostic", "backend",
    "merge", "class_filter", "multi_label"))
def batched_nms(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, *, conf_thres: float = 0.25,
                iou_thres: float = 0.45, top_k: int = 1024,
                max_det: int = 300, agnostic: bool = False,
                backend: str = "auto", merge: bool = False,
                class_filter: tuple = None,
                multi_label: bool = False,
                all_scores: jnp.ndarray = None) -> NMSResult:
    """Class-aware NMS over a batch — the full surface of the reference
    ``non_max_suppression`` (model_utils.py:174-279): hard NMS, optional
    merge-NMS with the redundancy requirement (:266-272; applied per image
    only when ``1 < n < 3000`` candidates pass the gate, like the
    reference), class filtering (:250-252), and multi-label candidates
    (:243-245).

    Args:
      boxes_xyxy: (N, M, 4) float boxes in xyxy pixel coords.
      scores: (N, M) best-class confidence per box.
      classes: (N, M) int class ids.
      backend: "auto" (Pallas on TPU when the pool is lane-aligned, else
        XLA), "pallas", or "xla".
      merge: merge-NMS (weighted-mean boxes + redundancy requirement).
      class_filter: optional tuple of allowed class ids.
      multi_label: one candidate per (box, class) above ``conf_thres``
        instead of best-class-only; requires ``all_scores`` (N, M, nc).
    Returns fixed-shape :class:`NMSResult` (pad entries have valid=False).

    Note: the candidate pool is capped at ``top_k`` per image (the
    reference caps at max_nms=30000); raise ``top_k`` for early-training
    regimes where more than ``top_k`` boxes clear the gate.
    """
    boxes_xyxy = boxes_xyxy.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    classes = classes.astype(jnp.int32)

    if multi_label:
        if all_scores is None:
            raise ValueError("multi_label=True requires all_scores")
        n_img, m, nc = all_scores.shape
        # one candidate per (box, class): flatten to M*nc
        scores = all_scores.astype(jnp.float32).reshape(n_img, m * nc)
        classes = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32),
                                   (n_img, m, nc)).reshape(n_img, m * nc)
        boxes_xyxy = jnp.repeat(boxes_xyxy, nc, axis=1)

    if class_filter is not None:
        allowed = jnp.isin(classes, jnp.asarray(class_filter, jnp.int32))
        scores = jnp.where(allowed, scores, -1.0)

    m = scores.shape[-1]
    k = min(top_k, m)
    # candidate count before the pool cap (reference n, :259) — gates merge
    n_pre = jnp.sum(scores > conf_thres, axis=-1)

    cand_boxes, cand_scores, cand_classes, cand_valid = jax.vmap(
        functools.partial(_gather_candidates, conf_thres=conf_thres,
                          top_k=top_k))(boxes_xyxy, scores, classes)

    if agnostic:
        shifted = cand_boxes
    else:
        shifted = cand_boxes + (cand_classes.astype(jnp.float32)
                                * MAX_WH)[..., None]

    use_pallas = backend == "pallas" or (
        backend == "auto" and k % 128 == 0
        and jax.devices()[0].platform == "tpu")
    if use_pallas:
        from custom_yolo_tpu.ops.pallas.nms_kernel import (
            nms_keep_pallas_batched)
        keep = nms_keep_pallas_batched(shifted, cand_valid,
                                       iou_thres) & cand_valid
    else:
        def suppress_one(shifted_i, valid_i):
            iou = box_iou_pairwise(shifted_i, shifted_i)
            return _suppress(iou, iou_thres, init_keep=valid_i)
        keep = jax.vmap(suppress_one)(shifted, cand_valid)

    if merge:
        merged_boxes, merged_keep = jax.vmap(functools.partial(
            _merge_boxes, iou_thres=iou_thres))(
            shifted, cand_boxes, cand_scores, cand_valid, keep)
        apply = ((n_pre > 1) & (n_pre < 3000))[:, None]  # reference :266
        cand_boxes = jnp.where(apply[..., None], merged_boxes, cand_boxes)
        keep = jnp.where(apply, merged_keep, keep)

    b, s, c, v, n = jax.vmap(functools.partial(
        _select_result, conf_thres=conf_thres, max_det=max_det))(
        cand_boxes, cand_scores, cand_classes, keep)
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
