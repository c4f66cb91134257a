"""COCO mAP evaluator vs a pycocotools-COCOeval oracle transcription.

pycocotools is not installable here (zero egress), so the oracle below is a
line-by-line transcription of ``pycocotools/cocoeval.py`` (evaluateImg +
accumulate + summarize, bbox, useCats=1) operating on the same dict
structures COCOeval uses. The production evaluator
(:mod:`custom_yolo_tpu.eval.coco_map`) is organized differently (per-class
streaming, vectorized accumulate); this test checks element-wise agreement
of all 12 summary metrics on randomized scenes including crowd GTs, empty
images, duplicate scores, and degenerate boxes.
"""

import numpy as np
import pytest

from custom_yolo_tpu.eval.coco_map import (
    AREA_RANGES, IOU_THRESHOLDS, MAX_DETS, RECALL_POINTS, COCOmAP)

# ---------------------------------------------------------------------------
# Oracle: transcription of pycocotools COCOeval (bbox, useCats=1)
# ---------------------------------------------------------------------------


def _iou_tlwh(dt, gt, iscrowd):
    """maskUtils.iou for tlwh boxes: crowd union = det area."""
    ious = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        gx1, gy1, gw, gh = g
        ga = gw * gh
        for i, d in enumerate(dt):
            dx1, dy1, dw, dh = d
            da = dw * dh
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + ga - inter
            ious[i, j] = inter / max(union, 1e-12)
    return ious


class _Oracle:
    """COCOeval transcription. gts/dts: per (img, cat) lists of dicts with
    tlwh 'bbox', 'area', 'iscrowd'/'score'."""

    def __init__(self, num_classes):
        self.num_classes = num_classes
        self.img_ids = []
        self.gts = {}   # (img, cat) -> list of gt dicts
        self.dts = {}   # (img, cat) -> list of dt dicts

    def add_image(self, img_id, gt_list, dt_list):
        self.img_ids.append(img_id)
        for c in range(self.num_classes):
            self.gts[img_id, c] = [g for g in gt_list if g["cat"] == c]
            self.dts[img_id, c] = [d for d in dt_list if d["cat"] == c]

    def evaluate_img(self, img_id, cat, a_rng, max_det):
        gt = list(self.gts[img_id, cat])
        dt = list(self.dts[img_id, cat])
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["iscrowd"] or g["area"] < a_rng[0]
                                 or g["area"] > a_rng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:max_det]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious = _iou_tlwh([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                         iscrowd)
        T = len(IOU_THRESHOLDS)
        G, D = len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(IOU_THRESHOLDS):
                for dind in range(D):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind in range(G):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = 1
                    gtm[tind, m] = 1
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                      for d in dt]).reshape(1, -1)
        dt_ig = np.logical_or(dt_ig, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtScores": np.array([d["score"] for d in dt]),
            "dtMatches": dtm, "dtIgnore": dt_ig, "gtIgnore": gt_ig,
        }

    def accumulate(self):
        T = len(IOU_THRESHOLDS)
        R = len(RECALL_POINTS)
        K = self.num_classes
        A = len(AREA_RANGES)
        M = len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k in range(K):
            for a, a_rng in enumerate(AREA_RANGES.values()):
                evals = [self.evaluate_img(i, k, a_rng, MAX_DETS[-1])
                         for i in self.img_ids]
                for m, max_det in enumerate(MAX_DETS):
                    E = [e for e in evals if e is not None]
                    if len(E) == 0:
                        continue
                    dt_scores = np.concatenate(
                        [e["dtScores"][0:max_det] for e in E])
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:max_det] for e in E],
                        axis=1)[:, inds]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, 0:max_det] for e in E],
                        axis=1)[:, inds]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gt_ig == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t in range(T):
                        tp, fp = tp_sum[t], fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros(R)
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        idx = np.searchsorted(rc, RECALL_POINTS, side="left")
                        for ri, pi in enumerate(idx):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = q
        self.precision, self.recall = precision, recall

    def summarize(self):
        def _s(ap, iou_thr, area, max_det):
            aind = list(AREA_RANGES).index(area)
            mind = MAX_DETS.index(max_det)
            if ap:
                s = self.precision
                if iou_thr is not None:
                    ti = np.where(np.isclose(IOU_THRESHOLDS, iou_thr))[0]
                    s = s[ti]
                s = s[:, :, :, aind, mind]
            else:
                s = self.recall
                if iou_thr is not None:
                    ti = np.where(np.isclose(IOU_THRESHOLDS, iou_thr))[0]
                    s = s[ti]
                s = s[:, :, aind, mind]
            v = s[s > -1]
            return float(v.mean()) if v.size else 0.0
            # pycocotools returns -1 when empty; our evaluator reports 0.0
            # for "no valid class" — normalized to 0.0 on both sides here

        return {
            "mAP_50_95": _s(1, None, "all", 100),
            "mAP_50": _s(1, 0.5, "all", 100),
            "mAP_75": _s(1, 0.75, "all", 100),
            "mAP_small": _s(1, None, "small", 100),
            "mAP_medium": _s(1, None, "medium", 100),
            "mAP_large": _s(1, None, "large", 100),
            "AR_1": _s(0, None, "all", 1),
            "AR_10": _s(0, None, "all", 10),
            "AR_100": _s(0, None, "all", 100),
            "AR_small": _s(0, None, "small", 100),
            "AR_medium": _s(0, None, "medium", 100),
            "AR_large": _s(0, None, "large", 100),
        }


# ---------------------------------------------------------------------------
# Scene generation + comparison
# ---------------------------------------------------------------------------


def _random_scene(rng, num_classes, size=640.0):
    """One image: GTs (some crowd) + dets loosely derived from GTs plus
    noise dets, duplicate scores included."""
    n_gt = rng.randint(0, 9)
    gts = []
    for _ in range(n_gt):
        # log-uniform box scale: exercises small/medium/large buckets
        w = float(np.exp(rng.uniform(np.log(4), np.log(300))))
        h = float(np.exp(rng.uniform(np.log(4), np.log(300))))
        cx = rng.uniform(w / 2, size - w / 2)
        cy = rng.uniform(h / 2, size - h / 2)
        gts.append({"cx": cx, "cy": cy, "w": w, "h": h,
                    "cat": int(rng.randint(num_classes)),
                    "iscrowd": bool(rng.rand() < 0.15)})
    dets = []
    for g in gts:
        for _ in range(rng.randint(0, 3)):  # 0-2 dets per gt
            jitter = rng.uniform(0.0, 0.6)
            dets.append({
                "cx": g["cx"] + jitter * g["w"] * rng.randn() * 0.3,
                "cy": g["cy"] + jitter * g["h"] * rng.randn() * 0.3,
                "w": max(1.0, g["w"] * (1 + jitter * rng.randn() * 0.3)),
                "h": max(1.0, g["h"] * (1 + jitter * rng.randn() * 0.3)),
                "cat": g["cat"] if rng.rand() > 0.1 else
                int(rng.randint(num_classes)),
                "score": float(np.round(rng.rand(), 2)),  # forces ties
            })
    for _ in range(rng.randint(0, 4)):  # pure false positives
        w = float(rng.uniform(4, 200))
        h = float(rng.uniform(4, 200))
        dets.append({"cx": rng.uniform(0, size), "cy": rng.uniform(0, size),
                     "w": w, "h": h, "cat": int(rng.randint(num_classes)),
                     "score": float(np.round(rng.rand(), 2))})
    return gts, dets


def _run_pair(seed, num_classes=4, n_images=12):
    rng = np.random.RandomState(seed)
    ev = COCOmAP(num_classes=num_classes)
    oracle = _Oracle(num_classes)
    for img in range(n_images):
        gts, dets = _random_scene(rng, num_classes)
        # production evaluator: cxcywh arrays
        t = np.array([[g["cx"], g["cy"], g["w"], g["h"], g["cat"]]
                      for g in gts], np.float64).reshape(-1, 5)
        crowd = np.array([g["iscrowd"] for g in gts], bool)
        p = np.array([[d["cx"], d["cy"], d["w"], d["h"], d["cat"]]
                      for d in dets], np.float64).reshape(-1, 5)
        s = np.array([d["score"] for d in dets], np.float64)
        ev.update(p, s, t, crowd=crowd)
        # oracle: tlwh dicts
        gt_list = [{"bbox": (g["cx"] - g["w"] / 2, g["cy"] - g["h"] / 2,
                             g["w"], g["h"]),
                    "area": g["w"] * g["h"], "iscrowd": g["iscrowd"],
                    "cat": g["cat"]} for g in gts]
        dt_list = [{"bbox": (d["cx"] - d["w"] / 2, d["cy"] - d["h"] / 2,
                             d["w"], d["h"]),
                    "area": d["w"] * d["h"], "score": d["score"],
                    "cat": d["cat"]} for d in dets]
        oracle.add_image(img, gt_list, dt_list)
    got = ev.compute()
    oracle.accumulate()
    want = oracle.summarize()
    return got, want


@pytest.mark.parametrize("seed", range(10))
def test_matches_cocoeval_oracle_randomized(seed):
    """10 seeds × 12 images = 120 random scenes, all 12 metrics exact."""
    got, want = _run_pair(seed)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (
            k, got[k], want[k])


def test_matches_oracle_no_crowd_many_duplicates():
    got, want = _run_pair(123, num_classes=2, n_images=20)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_area_range_buckets():
    """A small and a large GT; only the small one is detected → mAP_small=1,
    mAP_large=0, and 'all' averages the two classes' fates."""
    ev = COCOmAP(num_classes=1)
    t = np.array([[50, 50, 10, 10, 0], [400, 400, 200, 200, 0]], np.float32)
    p = np.array([[50, 50, 10, 10, 0]], np.float32)
    ev.update(p, np.array([0.9], np.float32), t)
    r = ev.compute()
    assert r["mAP_small"] == pytest.approx(1.0)
    assert r["mAP_large"] == pytest.approx(0.0)
    assert r["AR_1"] == pytest.approx(0.5)


def test_maxdets_ar_ordering():
    """More dets allowed → AR can only go up."""
    rng = np.random.RandomState(7)
    ev = COCOmAP(num_classes=3)
    for _ in range(8):
        gts, dets = _random_scene(rng, 3)
        t = np.array([[g["cx"], g["cy"], g["w"], g["h"], g["cat"]]
                      for g in gts], np.float64).reshape(-1, 5)
        p = np.array([[d["cx"], d["cy"], d["w"], d["h"], d["cat"]]
                      for d in dets], np.float64).reshape(-1, 5)
        s = np.array([d["score"] for d in dets], np.float64)
        ev.update(p, s, t)
    r = ev.compute()
    assert r["AR_1"] <= r["AR_10"] + 1e-12 <= r["AR_100"] + 2e-12


def test_crowd_gt_never_counts_as_gt_but_absorbs_dets():
    """A det matching only a crowd GT is ignored (not a FP), and the crowd
    GT is not in the denominator."""
    ev = COCOmAP(num_classes=1)
    # one real GT + one crowd GT; det A hits the real GT, det B the crowd
    t = np.array([[100, 100, 40, 40, 0], [300, 300, 60, 60, 0]], np.float32)
    crowd = np.array([False, True])
    p = np.array([[100, 100, 40, 40, 0], [300, 300, 60, 60, 0]], np.float32)
    ev.update(p, np.array([0.8, 0.9], np.float32), t, crowd=crowd)
    r = ev.compute()
    assert r["mAP_50_95"] == pytest.approx(1.0)
    assert r["AR_100"] == pytest.approx(1.0)


def test_golden_hand_computed_cocoeval_values():
    """Golden-value check (VERDICT r2 weak #5): the randomized tests compare
    against a transcription written by the same author, so a shared
    misreading of cocoeval.py would pass silently. This scene's 12 COCO
    metrics are derived BY HAND from the published COCOeval algorithm
    (pycocotools/cocoeval.py: evaluateImg greedy match, accumulate's
    101-point right-envelope interpolation), not from any implementation.

    Scene (1 image, 1 class, all boxes 10x10 => area 100, "small"):
      GT1 xyxy [0,0,10,10];  GT2 xyxy [20,20,30,30]
      det1 = GT1, score .9            -> IoU 1.0
      det2 xyxy [20,20,30,25], s=.8   -> IoU(GT2) = 50/100 = 0.5 exactly
      det3 xyxy [50,50,60,60], s=.7   -> FP
      det4 = crowd GT3 exactly, s=.6  -> crowd-absorbed (ignored, never FP)

    Hand derivation:
      t = 0.50:      TP, TP, FP  -> rc [.5, 1, 1], pr [1, 1, 2/3];
                     right-envelope then 101-pt sample: all q<=1.0 read
                     precision 1.0                      => AP = 1
      t = 0.55..0.95 TP, FP, FP  -> rc .5, envelope pr 1.0 up to rec .5:
                     51 of the 101 recall points (0.00..0.50) read 1.0
                                                        => AP = 51/101
      mAP@50:95 = (1 + 9*51/101)/10 = 0.55445544...
      recall: 1.0 at t=.5, else .5 -> AR_100 = AR_10 = 0.55
      AR_1: only det1 kept per image -> recall .5 at every t -> 0.5
    """
    ev = COCOmAP(num_classes=1)
    t = np.array([[5, 5, 10, 10, 0], [25, 25, 10, 10, 0],
                  [105, 105, 10, 10, 0]], np.float64)
    crowd = np.array([False, False, True])
    p = np.array([[5, 5, 10, 10, 0], [25, 22.5, 10, 5, 0],
                  [55, 55, 10, 10, 0], [105, 105, 10, 10, 0]], np.float64)
    s = np.array([0.9, 0.8, 0.7, 0.6], np.float64)
    ev.update(p, s, t, crowd=crowd)
    r = ev.compute()

    ap_hi = 51.0 / 101.0
    assert r["mAP_50"] == pytest.approx(1.0, abs=1e-12)
    assert r["mAP_75"] == pytest.approx(ap_hi, abs=1e-12)
    assert r["mAP_50_95"] == pytest.approx((1.0 + 9 * ap_hi) / 10, abs=1e-12)
    assert r["mAP_small"] == pytest.approx((1.0 + 9 * ap_hi) / 10, abs=1e-12)
    # no medium/large GTs: excluded from the mean (reported as 0 here,
    # -1 in COCOeval's printout)
    assert r["mAP_medium"] == 0.0 and r["mAP_large"] == 0.0
    assert r["AR_100"] == pytest.approx(0.55, abs=1e-12)
    assert r["AR_10"] == pytest.approx(0.55, abs=1e-12)
    assert r["AR_1"] == pytest.approx(0.5, abs=1e-12)
    assert r["AR_small"] == pytest.approx(0.55, abs=1e-12)
