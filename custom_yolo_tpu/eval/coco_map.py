"""True COCO-protocol mAP evaluator (bbox).

Not present in the reference — its "mAP" is mean per-class precision
(``src/training/metrics.py:174-179``, SURVEY §7 "hard parts"). This module
implements the full official COCO detection protocol (the pycocotools
``COCOeval`` semantics) in numpy, because it is the north-star parity
instrument (BASELINE.json):

* IoU thresholds 0.50:0.05:0.95 (10), 101-point interpolated AP
* area ranges  all / small(<32²) / medium(32²..96²) / large(>96²)
* maxDets {1, 10, 100} with AR reported at each
* greedy score-ranked matching with the exact COCOeval tie-breaking
  (each det takes the *highest-IoU* still-free GT; ignored GTs are only
  taken when no valid GT clears the threshold; crowd GTs can match many
  dets and never block)
* per-class AP averaged over classes with ≥1 non-ignored GT

Agreement with the reference protocol is regression-tested against an
independent line-by-line transcription of ``pycocotools.cocoeval`` in
``tests/test_coco_map.py`` on randomized scenes (pycocotools itself is not
installable here — zero egress).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)   # 10 thresholds
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _cxcywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    out = np.empty_like(b)
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out


def crowd_iou(det_xyxy: np.ndarray, gt_xyxy: np.ndarray,
              iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) IoU with the COCO crowd rule: for crowd GTs the denominator
    is the det area alone (maskUtils.iou semantics)."""
    d, g = len(det_xyxy), len(gt_xyxy)
    if d == 0 or g == 0:
        return np.zeros((d, g), np.float64)
    lt = np.maximum(det_xyxy[:, None, :2], gt_xyxy[None, :, :2])
    rb = np.minimum(det_xyxy[:, None, 2:], gt_xyxy[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = ((det_xyxy[:, 2] - det_xyxy[:, 0]) *
              (det_xyxy[:, 3] - det_xyxy[:, 1]))[:, None]
    area_g = ((gt_xyxy[:, 2] - gt_xyxy[:, 0]) *
              (gt_xyxy[:, 3] - gt_xyxy[:, 1]))[None, :]
    union = np.where(iscrowd[None, :], area_d,
                     area_d + area_g - inter)
    return inter / np.maximum(union, 1e-12)


def _match_image(ious: np.ndarray, gt_ignore: np.ndarray,
                 iscrowd: np.ndarray, det_area_bad: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """COCOeval.evaluateImg matching for one (image, class, area-range).

    ious: (D, G) with dets already score-sorted and GTs already sorted so
    non-ignored come first. Returns (dt_matched (T, D) bool,
    dt_ignore (T, D) bool). Crowd GTs never lock (can match many dets).
    """
    t = len(IOU_THRESHOLDS)
    d, g = ious.shape
    matched = np.zeros((t, d), bool)
    dt_ig = np.zeros((t, d), bool)
    for ti, thr in enumerate(IOU_THRESHOLDS):
        gtm = np.zeros(g, bool)
        for di in range(d):
            best = min(thr, 1.0 - 1e-10)
            m = -1
            for gi in range(g):
                if gtm[gi] and not iscrowd[gi]:
                    continue
                # a non-ignored match exists and remaining GTs are all
                # ignored (GTs are ignore-sorted) — stop (COCOeval rule)
                if m > -1 and not gt_ignore[m] and gt_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m == -1:
                continue
            gtm[m] = True
            matched[ti, di] = True
            dt_ig[ti, di] = gt_ignore[m]
    dt_ig |= (~matched) & det_area_bad[None, :]
    return matched, dt_ig


class COCOmAP:
    """Accumulate per-image detections, then compute COCO AP/AR statistics.

    update(preds, scores, targets, crowd=None): center-xywh boxes + class
      ids — preds (N, 5) [cx,cy,w,h,cls], scores (N,), targets (M, 5),
      optional crowd (M,) bool marking COCO iscrowd GTs.
    compute() → the 12 standard COCO metrics (plus legacy aliases).
    """

    def __init__(self, num_classes: int, max_det: int = 100):
        self.num_classes = num_classes
        self.max_det = max_det  # largest maxDets bucket (COCO: 100)
        self._images: List[tuple] = []

    def reset(self) -> None:
        self._images = []

    def update(self, preds: np.ndarray, scores: np.ndarray,
               targets: np.ndarray,
               crowd: Optional[np.ndarray] = None) -> None:
        # float64 throughout: COCOeval matches in double precision, and
        # near-threshold IoU ties must not flip on f32 rounding
        preds = np.asarray(preds, np.float64).reshape(-1, 5)
        scores = np.asarray(scores, np.float64).reshape(-1)
        targets = np.asarray(targets, np.float64).reshape(-1, 5)
        if crowd is None:
            crowd = np.zeros(len(targets), bool)
        crowd = np.asarray(crowd, bool).reshape(-1)
        # keep dets score-sorted; trim to the largest maxDets bucket
        order = np.argsort(-scores, kind="stable")[: self.max_det]
        self._images.append((preds[order], scores[order], targets, crowd))

    # ------------------------------------------------------------------
    def _evaluate_class(self, cls: int):
        """Match records for one class.

        Returns {area: (list-of (scores, tp, ig) per image, n_gt)} where
        each image entry keeps its dets score-sorted (so per-image top-md
        trimming is a prefix slice).
        """
        per_area = {a: {"imgs": [], "ngt": 0} for a in AREA_RANGES}
        for preds, scores, targets, crowd in self._images:
            p_sel = preds[:, 4] == cls
            t_sel = targets[:, 4] == cls
            p, s = preds[p_sel], scores[p_sel]
            g, cr = targets[t_sel], crowd[t_sel]
            if len(p) == 0 and len(g) == 0:
                continue
            p_xyxy = _cxcywh_to_xyxy(p[:, :4])
            g_xyxy = _cxcywh_to_xyxy(g[:, :4])
            g_area = g[:, 2] * g[:, 3]
            p_area = p[:, 2] * p[:, 3]
            for aname, (lo, hi) in AREA_RANGES.items():
                acc = per_area[aname]
                # crowd GTs are always ignored as GT (never counted),
                # but stay matchable
                g_ig = cr | (g_area < lo) | (g_area > hi)
                g_order = np.argsort(g_ig, kind="stable")
                ious = crowd_iou(p_xyxy, g_xyxy[g_order], cr[g_order])
                d_bad = (p_area < lo) | (p_area > hi)
                tp, ig = _match_image(ious, g_ig[g_order], cr[g_order],
                                      d_bad)
                acc["imgs"].append((s, tp, ig))
                acc["ngt"] += int((~g_ig).sum())
        return per_area

    @staticmethod
    def _ap_101(recall: np.ndarray, precision: np.ndarray) -> float:
        """COCOeval.accumulate: right-to-left precision envelope then
        101-point interpolation sampled with searchsorted(left)."""
        prec = np.maximum.accumulate(precision[::-1])[::-1]
        idx = np.searchsorted(recall, RECALL_POINTS, side="left")
        vals = np.zeros(len(RECALL_POINTS))
        ok = idx < len(prec)
        vals[ok] = prec[idx[ok]]
        return float(vals.mean())

    def compute(self) -> Dict[str, float]:
        t = len(IOU_THRESHOLDS)
        n_area, n_md = len(AREA_RANGES), len(MAX_DETS)
        ap = np.full((t, self.num_classes, n_area, n_md), -1.0)
        ar = np.full((t, self.num_classes, n_area, n_md), -1.0)
        for cls in range(self.num_classes):
            per_area = self._evaluate_class(cls)
            for ai, aname in enumerate(AREA_RANGES):
                imgs = per_area[aname]["imgs"]
                n_gt = per_area[aname]["ngt"]
                if n_gt == 0:
                    continue
                for mi, md in enumerate(MAX_DETS):
                    if imgs:
                        scores = np.concatenate([s[:md] for s, _, _ in imgs])
                        tp = np.concatenate([x[:, :md] for _, x, _ in imgs],
                                            axis=1)
                        ig = np.concatenate([x[:, :md] for _, _, x in imgs],
                                            axis=1)
                    else:
                        scores = np.zeros(0, np.float32)
                        tp = ig = np.zeros((t, 0), bool)
                    order = np.argsort(-scores, kind="mergesort")
                    tpo, igo = tp[:, order], ig[:, order]
                    tps = tpo & ~igo
                    fps = ~tpo & ~igo
                    cum_tp = np.cumsum(tps, axis=1).astype(np.float64)
                    cum_fp = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(t):
                        if cum_tp.shape[1] == 0:
                            ar[ti, cls, ai, mi] = 0.0
                            ap[ti, cls, ai, mi] = 0.0
                            continue
                        rc = cum_tp[ti] / n_gt
                        pr = cum_tp[ti] / np.maximum(
                            cum_tp[ti] + cum_fp[ti], np.spacing(1))
                        ar[ti, cls, ai, mi] = rc[-1]
                        ap[ti, cls, ai, mi] = self._ap_101(rc, pr)
        return self._summarize(ap, ar)

    def _summarize(self, ap: np.ndarray, ar: np.ndarray) -> Dict[str, float]:
        def mean_valid(x):
            v = x[x > -1]
            return float(v.mean()) if v.size else 0.0

        i75 = int(np.argmin(np.abs(IOU_THRESHOLDS - 0.75)))
        a = {n: i for i, n in enumerate(AREA_RANGES)}
        m100 = MAX_DETS.index(100)
        return {
            "mAP_50_95": mean_valid(ap[:, :, a["all"], m100]),
            "mAP_50": mean_valid(ap[0, :, a["all"], m100]),
            "mAP_75": mean_valid(ap[i75, :, a["all"], m100]),
            "mAP_small": mean_valid(ap[:, :, a["small"], m100]),
            "mAP_medium": mean_valid(ap[:, :, a["medium"], m100]),
            "mAP_large": mean_valid(ap[:, :, a["large"], m100]),
            "AR_1": mean_valid(ar[:, :, a["all"], MAX_DETS.index(1)]),
            "AR_10": mean_valid(ar[:, :, a["all"], MAX_DETS.index(10)]),
            "AR_100": mean_valid(ar[:, :, a["all"], m100]),
            "AR_small": mean_valid(ar[:, :, a["small"], m100]),
            "AR_medium": mean_valid(ar[:, :, a["medium"], m100]),
            "AR_large": mean_valid(ar[:, :, a["large"], m100]),
        }
