"""Greedy detection-metrics parity against the LIVE reference.

``eval/metrics.py::DetectionMetrics`` documents itself as semantics-parity
with the reference's greedy first-max matcher
(``/root/reference/src/training/metrics.py:44-207``). This test runs the
reference class itself (pure torch/numpy, importable) on identical random
streams — including empty-prediction, empty-target, score-filtered, and
out-of-range-class updates — and asserts every counter and every computed
metric agrees exactly.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "training")),
    reason="reference checkout unavailable")

NC = 6


@pytest.fixture(scope="module")
def ref_metrics_cls():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.training.metrics import DetectionMetrics as RefMetrics
    return RefMetrics


def _random_dets(rng, n, nc=NC, oob=False):
    if n == 0:
        return np.zeros((0, 5), np.float32), np.zeros((0,), np.float32)
    cx = rng.uniform(10, 90, n)
    cy = rng.uniform(10, 90, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    hi = nc + 2 if oob else nc  # exercise the 0<=cls<nc guards
    cls = rng.randint(0, hi, n).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return (np.stack([cx, cy, w, h, cls], 1).astype(np.float32), scores)


@pytest.mark.parametrize("seed", [0, 1])
def test_stream_parity(ref_metrics_cls, seed):
    from custom_yolo_tpu.eval.metrics import DetectionMetrics

    rng = np.random.RandomState(seed)
    ours = DetectionMetrics(NC, iou_threshold=0.5)
    ref = ref_metrics_cls(NC, iou_threshold=0.5)

    # a stream of images covering every branch: normal, no-preds, no-gt,
    # both-empty, score-filtered-to-empty, out-of-range class ids
    cases = [(5, 4, False), (0, 3, False), (4, 0, False), (0, 0, False),
             (6, 5, True), (3, 3, False), (8, 2, False), (2, 8, False)]
    for n_pred, n_gt, oob in cases:
        preds, scores = _random_dets(rng, n_pred, oob=oob)
        gts, _ = _random_dets(rng, n_gt, oob=oob)
        thr = float(rng.uniform(0.2, 0.8))
        ours.update(preds, gts, pred_scores=scores, score_threshold=thr)
        ref.update(torch.from_numpy(preds), torch.from_numpy(gts),
                   pred_scores=torch.from_numpy(scores),
                   score_threshold=thr)

    assert ours.true_positives == ref.true_positives
    assert ours.false_positives == ref.false_positives
    assert ours.false_negatives == ref.false_negatives
    assert ours.total_predictions == ref.total_predictions
    assert ours.total_ground_truths == ref.total_ground_truths
    np.testing.assert_array_equal(ours.class_tp, ref.class_tp.numpy())
    np.testing.assert_array_equal(ours.class_fp, ref.class_fp.numpy())
    np.testing.assert_array_equal(ours.class_fn, ref.class_fn.numpy())
    np.testing.assert_array_equal(ours.class_gt_count,
                                  ref.class_gt_count.numpy())

    ours_c, ref_c = ours.compute(), ref.compute()
    assert set(ours_c) == set(ref_c)
    for key in ref_c:
        assert ours_c[key] == pytest.approx(ref_c[key], rel=1e-6), key
    for cls in range(NC):
        ours_k = ours.get_class_metrics(cls)
        ref_k = ref.get_class_metrics(cls)
        for key in ref_k:
            assert ours_k[key] == pytest.approx(ref_k[key], rel=1e-6), \
                (cls, key)
