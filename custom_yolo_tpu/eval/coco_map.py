"""True COCO-style mAP@[.5:.95] evaluator.

Not present in the reference — its "mAP" is mean per-class precision
(``src/training/metrics.py:174-179``, SURVEY §7 "hard parts"). This
implements the standard COCO protocol in numpy, needed for the north-star
parity metric (BASELINE.json): score-ranked greedy matching per class at
IoU thresholds 0.50:0.05:0.95, 101-point interpolated AP, mean over classes
present in the ground truth. AP50/AP75 are reported too.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from custom_yolo_tpu.eval.metrics import box_iou_batch

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)   # 10 thresholds
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


class COCOmAP:
    """Accumulate per-image detections, then compute AP statistics.

    update(preds, scores, targets): center-xywh boxes + class ids —
      preds (N, 5) [cx,cy,w,h,cls], scores (N,), targets (M, 5).
    """

    def __init__(self, num_classes: int, max_det: int = 100):
        self.num_classes = num_classes
        self.max_det = max_det
        self._images = []  # list of (preds, scores, targets)

    def reset(self) -> None:
        self._images = []

    def update(self, preds: np.ndarray, scores: np.ndarray,
               targets: np.ndarray) -> None:
        preds = np.asarray(preds, np.float32).reshape(-1, 5)
        scores = np.asarray(scores, np.float32).reshape(-1)
        targets = np.asarray(targets, np.float32).reshape(-1, 5)
        if len(preds) > self.max_det:
            order = np.argsort(-scores)[: self.max_det]
            preds, scores = preds[order], scores[order]
        self._images.append((preds, scores, targets))

    # ------------------------------------------------------------------
    def _match_class(self, cls: int):
        """For one class: global score-ranked match records across images.
        Returns (scores_sorted, tp[T, D], n_gt) per area range 'all'."""
        records_scores: List[np.ndarray] = []
        records_tp: List[np.ndarray] = []
        n_gt = 0
        t = len(IOU_THRESHOLDS)
        for preds, scores, targets in self._images:
            p_sel = preds[:, 4] == cls
            t_sel = targets[:, 4] == cls
            p = preds[p_sel]
            s = scores[p_sel]
            g = targets[t_sel]
            n_gt += len(g)
            if len(p) == 0:
                continue
            order = np.argsort(-s)
            p, s = p[order], s[order]
            tp = np.zeros((t, len(p)), bool)
            if len(g):
                ious = box_iou_batch(p[:, :4], g[:, :4])   # (D, G)
                for ti, thr in enumerate(IOU_THRESHOLDS):
                    taken = np.zeros(len(g), bool)
                    for di in range(len(p)):
                        row = np.where(taken, -1.0, ious[di])
                        gi = int(np.argmax(row))
                        if row[gi] >= thr:
                            tp[ti, di] = True
                            taken[gi] = True
            records_scores.append(s)
            records_tp.append(tp)
        if records_scores:
            scores_cat = np.concatenate(records_scores)
            tp_cat = np.concatenate(records_tp, axis=1)
        else:
            scores_cat = np.zeros((0,))
            tp_cat = np.zeros((t, 0), bool)
        return scores_cat, tp_cat, n_gt

    def compute(self) -> Dict[str, float]:
        t = len(IOU_THRESHOLDS)
        ap = np.full((t, self.num_classes), np.nan)
        for cls in range(self.num_classes):
            scores, tp, n_gt = self._match_class(cls)
            if n_gt == 0:
                continue
            if len(scores) == 0:
                ap[:, cls] = 0.0
                continue
            order = np.argsort(-scores)
            tp = tp[:, order]
            cum_tp = np.cumsum(tp, axis=1)
            cum_fp = np.cumsum(~tp, axis=1)
            recall = cum_tp / n_gt
            precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
            for ti in range(t):
                # monotone non-increasing precision envelope
                prec = np.maximum.accumulate(precision[ti][::-1])[::-1]
                # 101-point interpolation
                idx = np.searchsorted(recall[ti], RECALL_POINTS, side="left")
                vals = np.where(idx < len(prec), prec[np.minimum(
                    idx, len(prec) - 1)], 0.0)
                ap[ti, cls] = vals.mean()

        valid = ~np.isnan(ap[0])
        if not valid.any():
            return {"mAP_50_95": 0.0, "mAP_50": 0.0, "mAP_75": 0.0}
        map5095 = float(np.nanmean(ap[:, valid]))
        map50 = float(np.nanmean(ap[0, valid]))
        i75 = int(np.argmin(np.abs(IOU_THRESHOLDS - 0.75)))
        map75 = float(np.nanmean(ap[i75, valid]))
        return {"mAP_50_95": map5095, "mAP_50": map50, "mAP_75": map75}
