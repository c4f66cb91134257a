"""Prediction decoding for the validation metrics path.

Equivalent of the reference ``decode_predictions``
(``src/training/train_model.py:14-142``): DFL expectation → ltrb→xywh →
×stride → confidence gate (0.25) → top-k (100). Fully batched + jitted with
fixed output shapes. The reference applies **no NMS** here (quirk #5 — it
inflates FP counts); pass ``use_nms=True`` for the corrected variant.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.ops.boxes import dist2bbox, xyxy2xywh
from custom_yolo_tpu.ops.dfl import dfl_decode
from custom_yolo_tpu.ops.nms import batched_nms


class DecodedBatch(NamedTuple):
    boxes_xywh: jnp.ndarray   # (N, K, 4) center-xywh px
    scores: jnp.ndarray       # (N, K)
    classes: jnp.ndarray      # (N, K) int32
    valid: jnp.ndarray        # (N, K) bool


@functools.partial(jax.jit, static_argnames=("reg_max", "top_k", "use_nms"))
def decode_predictions(preds: jnp.ndarray, anchors: jnp.ndarray,
                       strides: jnp.ndarray, conf_threshold: float = 0.25,
                       top_k: int = 100, reg_max: int = 16,
                       use_nms: bool = False) -> DecodedBatch:
    top_k = min(top_k, preds.shape[1])
    preds = preds.astype(jnp.float32)
    dist = preds[..., : 4 * reg_max]
    cls_logits = preds[..., 4 * reg_max:]
    ltrb = dfl_decode(dist, reg_max)
    stride_v = strides[None, :, 0:1]
    scores_all = jax.nn.sigmoid(cls_logits)
    best_scores = jnp.max(scores_all, axis=-1)                 # (N, M)
    best_classes = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)

    if use_nms:
        boxes_xyxy = dist2bbox(ltrb, anchors[None], xywh=False) * stride_v
        r = batched_nms(boxes_xyxy, best_scores, best_classes,
                        conf_thres=conf_threshold, max_det=top_k)
        return DecodedBatch(xyxy2xywh(r.boxes), r.scores, r.classes, r.valid)

    boxes_xywh = dist2bbox(ltrb, anchors[None], xywh=True) * stride_v
    gated = jnp.where(best_scores >= conf_threshold, best_scores, -1.0)
    top_scores, idx = jax.lax.top_k(gated, top_k)              # (N, K)
    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
    return DecodedBatch(
        boxes_xywh=take(boxes_xywh),
        scores=jnp.where(top_scores > 0, top_scores, 0.0),
        classes=jnp.take_along_axis(best_classes, idx, axis=1),
        valid=top_scores >= conf_threshold,
    )


def decoded_to_lists(decoded: DecodedBatch) -> List[np.ndarray]:
    """Fixed-shape decode → per-image (M, 5) [cx,cy,w,h,cls] numpy arrays
    (the reference's output convention for DetectionMetrics)."""
    boxes = np.asarray(decoded.boxes_xywh)
    classes = np.asarray(decoded.classes)
    valid = np.asarray(decoded.valid)
    out = []
    for i in range(boxes.shape[0]):
        v = valid[i]
        out.append(np.concatenate(
            [boxes[i][v], classes[i][v, None].astype(np.float32)], axis=1))
    return out
