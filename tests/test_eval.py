"""Evaluator tests: greedy metrics parity scenarios + COCO mAP sanity."""

import numpy as np

from custom_yolo_tpu.eval.coco_map import COCOmAP
from custom_yolo_tpu.eval.metrics import DetectionMetrics, compute_average_iou


def _det(cx, cy, w, h, cls):
    return [cx, cy, w, h, cls]


def test_perfect_predictions():
    m = DetectionMetrics(num_classes=3)
    targets = np.array([_det(10, 10, 4, 4, 0), _det(30, 30, 6, 6, 2)])
    m.update(targets.copy(), targets)
    r = m.compute()
    assert r["precision"] == 1.0 or abs(r["precision"] - 1.0) < 1e-5
    assert r["true_positives"] == 2
    assert r["false_positives"] == 0
    assert r["false_negatives"] == 0


def test_class_mismatch_is_fp_and_fn():
    m = DetectionMetrics(num_classes=3)
    preds = np.array([_det(10, 10, 4, 4, 1)])   # wrong class
    targets = np.array([_det(10, 10, 4, 4, 0)])
    m.update(preds, targets)
    r = m.compute()
    assert r["true_positives"] == 0
    assert r["false_positives"] == 1
    assert r["false_negatives"] == 1


def test_greedy_one_target_per_pred():
    """Two preds on one target: first (in order) matches, second is FP —
    exact reference semantics (metrics.py:116-154)."""
    m = DetectionMetrics(num_classes=2)
    preds = np.array([_det(10, 10, 4, 4, 0), _det(10.2, 10, 4, 4, 0)])
    targets = np.array([_det(10, 10, 4, 4, 0)])
    m.update(preds, targets)
    r = m.compute()
    assert r["true_positives"] == 1
    assert r["false_positives"] == 1
    assert r["false_negatives"] == 0


def test_empty_cases():
    m = DetectionMetrics(num_classes=2)
    m.update(np.zeros((0, 5)), np.array([_det(5, 5, 2, 2, 1)]))
    r = m.compute()
    assert r["false_negatives"] == 1
    m2 = DetectionMetrics(num_classes=2)
    m2.update(np.array([_det(5, 5, 2, 2, 1)]), np.zeros((0, 5)))
    assert m2.compute()["false_positives"] == 1


def test_average_iou():
    preds = [np.array([_det(10, 10, 4, 4, 0)])]
    targets = [np.array([_det(10, 10, 4, 4, 0)])]
    assert abs(compute_average_iou(preds, targets) - 1.0) < 1e-3


# ---------------------------------------------------------------- COCO mAP
def test_coco_map_perfect():
    ev = COCOmAP(num_classes=3)
    targets = np.array([_det(10, 10, 8, 8, 0), _det(40, 40, 10, 10, 2)])
    ev.update(targets.copy(), np.array([0.9, 0.8]), targets)
    r = ev.compute()
    assert abs(r["mAP_50_95"] - 1.0) < 1e-6
    assert abs(r["mAP_50"] - 1.0) < 1e-6


def test_coco_map_half_localized():
    """A prediction with IoU ~0.6 counts at thr<=0.6 only → mAP50=1,
    mAP@[.5:.95] ≈ 3/10 (thresholds .5, .55, .6)."""
    ev = COCOmAP(num_classes=1)
    # shift box so IoU is ~0.63: 8-wide box shifted by 1.8 → IoU = 6.2/9.8
    targets = np.array([_det(10, 10, 8, 8, 0)])
    preds = np.array([_det(11.8, 10, 8, 8, 0)])
    ev.update(preds, np.array([0.9]), targets)
    r = ev.compute()
    assert abs(r["mAP_50"] - 1.0) < 1e-6
    assert 0.2 < r["mAP_50_95"] < 0.4


def test_coco_map_ranking_matters():
    """A high-score FP before the TP drags precision: AP < 1."""
    ev = COCOmAP(num_classes=1)
    targets = np.array([_det(10, 10, 8, 8, 0)])
    preds = np.array([_det(50, 50, 8, 8, 0), _det(10, 10, 8, 8, 0)])
    ev.update(preds, np.array([0.95, 0.9]), targets)
    r = ev.compute()
    assert r["mAP_50"] < 1.0
    assert r["mAP_50"] > 0.0


def test_coco_map_missing_class_zero():
    ev = COCOmAP(num_classes=2)
    targets = np.array([_det(10, 10, 8, 8, 0), _det(30, 30, 8, 8, 1)])
    preds = np.array([_det(10, 10, 8, 8, 0)])   # class 1 never predicted
    ev.update(preds, np.array([0.9]), targets)
    r = ev.compute()
    assert abs(r["mAP_50"] - 0.5) < 1e-6  # class0 AP=1, class1 AP=0
