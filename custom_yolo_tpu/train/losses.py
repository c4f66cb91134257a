"""Detection losses — QFL + DFL (reference parity) and BCE + CIoU + DFL (TAL
quality configuration). Everything is vectorized over (batch, GT, anchor)
with padded fixed-shape ground truth; there is **no per-image python loop**
(the reference serializes the whole batch through one,
``src/model/losses.py:195-266``, SURVEY §3.2 hot-loop #2).

Reference semantics preserved in the ``nearest`` configuration:

* QFL: sigmoid quality focal loss, β=2, summed over anchors×classes and
  divided by the anchor count (losses.py:46-57), averaged over images;
* DFL: two-bin cross-entropy interpolation (losses.py:63-78), target ltrb in
  grid units clamped to [0, reg_max-1-0.01] (:224-252), per-image mean over
  GTs, mean of the 4 sides, averaged over **all** images (:266-271 counts
  GT-less images too);
* total = λ_dfl·DFL + λ_cls·QFL (:275 — the reference accepts λ_box but
  never uses it, quirk #4; here λ_box drives the CIoU term of the TAL
  configuration instead of being dead).

Known-bug departures (documented, SURVEY §7 quirks): GT boxes are treated as
center-format xywh throughout (the reference mixed top-left-XYWH data with
center-xywh loss math, quirk #2), and IoU is computed correctly (quirk #1);
``iou_compat_bug=True`` reproduces the reference's swapped-operand IoU for
exact parity testing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from custom_yolo_tpu.ops.boxes import (
    bbox2dist, box_ciou, box_iou_aligned, dist2bbox, xywh2xyxy)
from custom_yolo_tpu.ops.dfl import dfl_decode
from custom_yolo_tpu.train.assigner import (
    nearest_center_assign, task_aligned_assign)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    num_classes: int = 172
    reg_max: int = 16
    lambda_cls: float = 1.0
    lambda_box: float = 1.5
    lambda_dfl: float = 1.5
    assigner: str = "nearest"       # "nearest" | "tal"
    qfl_beta: float = 2.0
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    iou_compat_bug: bool = False    # replicate reference losses.py:20 exactly
    # sparse-target formulation: the QFL/BCE sums are split into a dense
    # elementwise base term (targets all zero — no (N, M, C) target tensor)
    # plus a gathered correction at the ≤G (nearest) / ≤M (TAL) positive
    # positions. Algebraically identical (summation order differs only);
    # kills the biggest HBM intermediates of the train step. Equivalence
    # is test-asserted against the dense path (test_loss.py).
    sparse_targets: bool = True


_LOG_EPS = -27.631021115928547  # log(1e-12), the reference's epsilon


def _log_sig_eps(x: jnp.ndarray) -> jnp.ndarray:
    """log(sigmoid(x) + 1e-12), computed without materializing sigmoid.

    The reference's literal idiom ``log(1 - σ + 1e-12)`` (losses.py:52-53)
    is UNSAFE under XLA:TPU: the partitioner/backend reassociates the
    three-term sum so the 1e-12 folds into the 1 and vanishes — measured:
    every logit ≥ 16.6 (where f32 σ rounds to exactly 1.0) produced
    log(0) = -inf and poisoned the whole loss with one saturated anchor
    (random-init x at 640² hits this; trained nets can during warmup).
    ``logaddexp(log_sigmoid(x), log 1e-12)`` is the same function evaluated
    stably — it matches the reference's epsilon semantics bit-closely in
    the unsaturated regime AND clamps at log(1e-12) exactly where the
    reference does."""
    return jnp.logaddexp(jax.nn.log_sigmoid(x), _LOG_EPS)


def quality_focal_loss(pred_logits: jnp.ndarray, target_scores: jnp.ndarray,
                       beta: float = 2.0) -> jnp.ndarray:
    """Per-image QFL (reference losses.py:46-57): elementwise
    -(t·(1-σ)^β·log σ + (1-t)·σ^β·log(1-σ)), summed over anchors and classes,
    divided by the anchor count. Input (..., M, C); returns (...,)."""
    p = jax.nn.sigmoid(pred_logits)
    pos = target_scores * (1 - p) ** beta * _log_sig_eps(pred_logits)
    neg = (1 - target_scores) * p ** beta * _log_sig_eps(-pred_logits)
    m = pred_logits.shape[-2]
    return -jnp.sum(pos + neg, axis=(-2, -1)) / m


def _two_bin_ce(pred_dist_logits: jnp.ndarray,
                target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss core (reference losses.py:63-78): CE against
    floor/ceil bins weighted by linear interpolation.
    pred_dist_logits (..., reg_max); target (...,) in [0, reg_max-1).

    The two bins are selected by one-hot multiply-reduce over the reg_max
    lanes, NOT ``take_along_axis``: a lane-indexed scalar gather lowers to
    near-serial code on XLA:TPU — measured 17 ms of the 24 ms TAL loss
    forward at (16, 8400, 4, 16) (docs/PERF.md r3). The reduction form is
    bit-identical (the 14 untouched lanes contribute exact fp32 zeros;
    log_softmax of finite logits is always finite, so no 0·inf hazard)
    and pure fused VPU work."""
    logp = jax.nn.log_softmax(pred_dist_logits, axis=-1)
    left = jnp.floor(target).astype(jnp.int32)
    right = left + 1
    wl = right.astype(target.dtype) - target
    wr = target - left.astype(target.dtype)
    right_c = jnp.clip(right, 0, logp.shape[-1] - 1)
    bins = jax.lax.iota(jnp.int32, logp.shape[-1])
    sel = (jnp.where(bins == left[..., None], wl[..., None], 0.0)
           + jnp.where(bins == right_c[..., None], wr[..., None], 0.0))
    return -jnp.sum(logp * sel, axis=-1)


def _qfl_sparse(pred_logits: jnp.ndarray, idx: jnp.ndarray,
                labels: jnp.ndarray, iou: jnp.ndarray,
                gt_mask: jnp.ndarray, beta: float) -> jnp.ndarray:
    """QFL without the dense (N, M, C) target tensor.

    target_scores is zero except at the ≤G matched (anchor, class) slots
    (value = max IoU over duplicates), so

      QFL = Σ_{m,c} -p^β·log(1-p)                       [t = 0 base, dense]
          + Σ_{winners} -t·[(1-p)^β·log p - p^β·log(1-p)]   [correction]

    Duplicates (two GTs matched to the same anchor AND class) are resolved
    to the max-IoU instance — the exact semantics of the dense path's
    ``.at[].max`` scatter; ties keep the lowest GT index (same value, so
    the sum is identical). Inputs: idx (N,G) matched anchor per GT;
    labels (N,G); iou (N,G) already zeroed at padding; gt_mask (N,G) bool.
    Returns per-image QFL (N,), identical to :func:`quality_focal_loss`
    of the scattered targets up to summation order.
    """
    n, m, _ = pred_logits.shape
    p = jax.nn.sigmoid(pred_logits)
    base = -jnp.sum(p ** beta * _log_sig_eps(-pred_logits), axis=(-2, -1))

    # dedup: entry g loses to g' when same (anchor, class), both valid, and
    # g' has strictly higher IoU (or equal IoU with lower index)
    g_idx = jnp.arange(idx.shape[1])
    same = ((idx[:, :, None] == idx[:, None, :])
            & (labels[:, :, None] == labels[:, None, :])
            & gt_mask[:, :, None] & gt_mask[:, None, :])       # (N, G, G)
    better = ((iou[:, None, :] > iou[:, :, None])
              | ((iou[:, None, :] == iou[:, :, None])
                 & (g_idx[None, None, :] < g_idx[None, :, None])))
    winner = gt_mask & ~jnp.any(same & better, axis=2)          # (N, G)

    # gather p at the matched (anchor, class) slots: (N, G)
    flat = jnp.take_along_axis(
        pred_logits.reshape(n, -1),
        idx * pred_logits.shape[-1] + labels, axis=1)
    pg = jax.nn.sigmoid(flat)
    corr_terms = iou * ((1 - pg) ** beta * _log_sig_eps(flat)
                        - pg ** beta * _log_sig_eps(-flat))
    corr = -jnp.sum(jnp.where(winner, corr_terms, 0.0), axis=1)
    return (base + corr) / m


def _iou_xywh_reference_bug(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Bit-for-bit reproduction of the reference ``bbox_iou``
    (losses.py:9-40) INCLUDING its swapped-operand bug on box1's y2 (:20):
    ``b1_y2 = y + x_center/2`` instead of ``y_center + h/2``. Used only for
    parity tests via ``LossConfig.iou_compat_bug``."""
    b1_x1 = b1[..., 0] - b1[..., 2] / 2
    b1_y1 = b1[..., 1] - b1[..., 3] / 2
    b1_x2 = b1[..., 0] + b1[..., 2] / 2
    b1_y2 = b1[..., 3] + b1[..., 1] / 2          # <-- the reference's bug
    b2_x1 = b2[..., 0] - b2[..., 2] / 2
    b2_y1 = b2[..., 1] - b2[..., 3] / 2
    b2_x2 = b2[..., 0] + b2[..., 2] / 2
    b2_y2 = b2[..., 1] + b2[..., 3] / 2
    iw = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
    ih = jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0)
    inter = iw * ih
    area1 = (b1_x2 - b1_x1) * (b1_y2 - b1_y1)
    area2 = (b2_x2 - b2_x1) * (b2_y2 - b2_y1)
    return inter / (area1 + area2 - inter + 1e-6)


class DetectionLoss:
    """Callable criterion (replaces reference ``YoloDFLQFLoss``,
    losses.py:84-281). Pure function of arrays — safe under jit/grad/vmap.

    Call signature (padded fixed-shape GT — replaces the reference's ragged
    python list from ``collate.py:3-9``):

      loss, metrics = loss_fn(preds, anchors, strides,
                              gt_boxes, gt_labels, gt_mask)

      preds:     (N, M, 4*reg_max + C) raw head output (anchor-major)
      anchors:   (M, 2) grid-unit cell centers
      strides:   (M, 1)
      gt_boxes:  (N, G, 4) center-xywh in pixels
      gt_labels: (N, G) int32
      gt_mask:   (N, G) bool/int — 1 for real boxes, 0 for padding
    """

    def __init__(self, config: LossConfig):
        self.cfg = config

    def __call__(self, preds, anchors, strides, gt_boxes, gt_labels, gt_mask
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        preds = preds.astype(jnp.float32)
        gt_boxes = gt_boxes.astype(jnp.float32)
        gt_mask = gt_mask.astype(bool)

        rm = cfg.reg_max
        pred_dist = preds[..., : 4 * rm]                     # (N, M, 64)
        pred_logits = preds[..., 4 * rm:]                    # (N, M, C)

        ltrb = dfl_decode(pred_dist, rm)                     # (N, M, 4) grid
        stride_v = strides[None, :, 0:1]                     # (1, M, 1)
        pred_xyxy_px = dist2bbox(ltrb, anchors[None], xywh=False) * stride_v
        pred_xywh_px = dist2bbox(ltrb, anchors[None], xywh=True) * stride_v

        if cfg.assigner == "nearest":
            return self._nearest_loss(
                pred_dist, pred_logits, pred_xywh_px, anchors, strides,
                gt_boxes, gt_labels, gt_mask)
        return self._tal_loss(
            pred_dist, pred_logits, pred_xyxy_px, anchors, strides,
            gt_boxes, gt_labels, gt_mask)

    # ---------------------------------------------------------------- nearest
    def _nearest_loss(self, pred_dist, pred_logits, pred_xywh_px, anchors,
                      strides, gt_boxes, gt_labels, gt_mask):
        cfg = self.cfg
        n, m, _ = pred_logits.shape
        g = gt_boxes.shape[1]
        rm = cfg.reg_max

        assign = nearest_center_assign(
            gt_boxes[..., :2], pred_xywh_px[..., :2], gt_mask)
        idx = assign.anchor_idx                               # (N, G)

        take = lambda arr: jnp.take_along_axis(
            arr, idx[..., None], axis=1)                      # (N,G,·)
        matched_xywh = take(pred_xywh_px)                     # (N, G, 4)
        matched_dist = jnp.take_along_axis(
            pred_dist.reshape(n, m, 4, rm),
            idx[..., None, None], axis=1)                     # (N, G, 4, rm)
        matched_anchor = anchors[idx]                         # (N, G, 2)
        matched_stride = strides[idx][..., 0:1]               # (N, G, 1)

        # --- DFL: target ltrb in grid units
        gt_xyxy_grid = xywh2xyxy(gt_boxes) / matched_stride
        tgt_ltrb = bbox2dist(gt_xyxy_grid, matched_anchor, rm)  # (N, G, 4)
        dfl_all = _two_bin_ce(matched_dist, tgt_ltrb)           # (N, G, 4)
        dfl_per_gt = jnp.mean(dfl_all, axis=-1)                 # (N, G)
        gt_count = jnp.sum(gt_mask, axis=1)                     # (N,)
        dfl_per_img = jnp.sum(
            jnp.where(gt_mask, dfl_per_gt, 0.0), axis=1) / jnp.maximum(
                gt_count, 1)
        mean_dfl = jnp.mean(dfl_per_img)  # images w/o GT contribute 0
        # (reference averages over all images, losses.py:266-271)

        # --- QFL targets: IoU at matched anchor scattered into class channel
        if cfg.iou_compat_bug:
            iou = _iou_xywh_reference_bug(matched_xywh, gt_boxes)
        else:
            iou = box_iou_aligned(xywh2xyxy(matched_xywh),
                                  xywh2xyxy(gt_boxes))        # (N, G)
        iou = jnp.where(gt_mask, iou, 0.0)
        labels_safe = jnp.clip(gt_labels, 0, cfg.num_classes - 1)

        if cfg.sparse_targets:
            qfl_per_img = _qfl_sparse(pred_logits, idx, labels_safe, iou,
                                      gt_mask, cfg.qfl_beta)
        else:
            # scatter (duplicate anchors merge by max — deterministic; the
            # reference's in-place set has unspecified duplicate order)
            batch_i = jnp.arange(n)[:, None]
            safe_idx = jnp.where(gt_mask, idx, m)  # padding → off-range
            target_scores = jnp.zeros((n, m + 1, cfg.num_classes),
                                      dtype=pred_logits.dtype).at[
                batch_i, safe_idx, labels_safe].max(iou)[:, :m]
            qfl_per_img = quality_focal_loss(pred_logits, target_scores,
                                             cfg.qfl_beta)     # (N,)
        mean_cls = jnp.mean(qfl_per_img)

        total = cfg.lambda_dfl * mean_dfl + cfg.lambda_cls * mean_cls
        return total, {
            "total_loss": total,
            "box_loss": mean_dfl,   # reference reports DFL as box loss
            "cls_loss": mean_cls,
        }

    # -------------------------------------------------------------------- TAL
    def _tal_loss(self, pred_dist, pred_logits, pred_xyxy_px, anchors,
                  strides, gt_boxes, gt_labels, gt_mask):
        cfg = self.cfg
        n, m, _ = pred_logits.shape
        rm = cfg.reg_max

        anchor_px = anchors * strides                          # (M, 2)
        pred_scores = jax.nn.sigmoid(pred_logits)
        gt_xyxy = xywh2xyxy(gt_boxes)

        asn = task_aligned_assign(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(pred_xyxy_px),
            anchor_px, gt_xyxy, gt_labels, gt_mask,
            num_classes=cfg.num_classes, topk=cfg.tal_topk,
            alpha=cfg.tal_alpha, beta=cfg.tal_beta,
            dense_scores=not cfg.sparse_targets)

        score_sum = jnp.maximum(jnp.sum(asn.anchor_scores), 1.0)

        if cfg.sparse_targets:
            # BCE(l, t) = [max(l,0) + log1p(e^-|l|)] - l·t, and t is zero
            # except at each fg anchor's assigned class — so the sum is a
            # dense elementwise base (no (N, M, C) target tensor) minus a
            # gathered (N, M) correction. Identical to the dense path up
            # to summation order (test-asserted).
            base = jnp.sum(jnp.maximum(pred_logits, 0)
                           + jnp.log1p(jnp.exp(-jnp.abs(pred_logits))))
            # Σ logits[n,m,label]·score via one-hot multiply-reduce — a
            # lane-indexed take_along_axis here is near-serial on XLA:TPU
            # (same pathology as _two_bin_ce; docs/PERF.md r3)
            cls_ids = jax.lax.iota(jnp.int32, pred_logits.shape[-1])
            corr = jnp.sum(pred_logits
                           * jnp.where(cls_ids == asn.target_labels[..., None],
                                       asn.anchor_scores[..., None], 0.0))
            cls_loss = (base - corr) / score_sum
        else:
            # cls: BCE against soft target scores over all anchors
            bce = optax_sigmoid_bce(pred_logits, asn.target_scores)
            cls_loss = jnp.sum(bce) / score_sum

        # box: CIoU on positives, weighted by target score
        weight = asn.anchor_scores                             # (N, M)
        ciou = box_ciou(pred_xyxy_px, asn.target_boxes)        # (N, M)
        box_loss = jnp.sum(jnp.where(asn.fg_mask,
                                     (1.0 - ciou) * weight, 0.0)) / score_sum

        # dfl on positives
        stride_v = strides[None, :, 0:1]
        tgt_xyxy_grid = asn.target_boxes / stride_v   # (N,M,4)/(1,M,1)
        tgt_ltrb = bbox2dist(tgt_xyxy_grid, anchors[None], rm)  # (N, M, 4)
        dfl_all = _two_bin_ce(pred_dist.reshape(n, m, 4, rm), tgt_ltrb)
        dfl_loss = jnp.sum(jnp.where(
            asn.fg_mask[..., None], dfl_all * weight[..., None] / 4.0,
            0.0)) / score_sum

        total = (cfg.lambda_cls * cls_loss + cfg.lambda_box * box_loss
                 + cfg.lambda_dfl * dfl_loss)
        return total, {
            "total_loss": total,
            "box_loss": box_loss,
            "cls_loss": cls_loss,
            "dfl_loss": dfl_loss,
        }


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray
                      ) -> jnp.ndarray:
    """Numerically-stable elementwise sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
