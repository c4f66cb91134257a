"""Batched fixed-shape NMS tests (vs a trivially-correct python greedy NMS)."""

import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.ops.boxes import box_iou_pairwise
from custom_yolo_tpu.ops.nms import batched_nms, nms_to_lists


def _greedy_nms_python(boxes, scores, iou_thres):
    """O(n²) reference greedy NMS on sorted scores (class-agnostic)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    iou = np.asarray(box_iou_pairwise(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_thres
        suppressed[i] = True
    return keep


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]],
                        jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.7]])
    classes = jnp.zeros((1, 3), jnp.int32)
    r = batched_nms(boxes, scores, classes, conf_thres=0.1, iou_thres=0.5,
                    top_k=8, max_det=8)
    assert int(r.num_valid[0]) == 2
    kept = np.asarray(r.boxes[0][np.asarray(r.valid[0])])
    np.testing.assert_allclose(kept[0], [0, 0, 10, 10])
    np.testing.assert_allclose(kept[1], [50, 50, 60, 60])


def test_nms_class_aware():
    # identical overlapping boxes, different classes → both survive
    boxes = jnp.asarray([[[0, 0, 10, 10], [0, 0, 10, 10]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]])
    classes = jnp.asarray([[0, 1]], jnp.int32)
    r = batched_nms(boxes, scores, classes, conf_thres=0.1, top_k=4,
                    max_det=4)
    assert int(r.num_valid[0]) == 2
    r2 = batched_nms(boxes, scores, classes, conf_thres=0.1, top_k=4,
                     max_det=4, agnostic=True)
    assert int(r2.num_valid[0]) == 1


def test_nms_conf_gate_and_empty():
    boxes = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)
    scores = jnp.asarray([[0.01]])
    classes = jnp.zeros((1, 1), jnp.int32)
    r = batched_nms(boxes, scores, classes, conf_thres=0.25, top_k=4,
                    max_det=4)
    assert int(r.num_valid[0]) == 0
    lists = nms_to_lists(r)
    assert lists[0].shape == (0, 6)


def test_nms_matches_python_greedy(rng):
    n = 64
    centers = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 30 + 5
    boxes_np = np.concatenate([centers - wh / 2, centers + wh / 2],
                              axis=1).astype(np.float32)
    scores_np = rng.rand(n).astype(np.float32)
    expected = _greedy_nms_python(boxes_np, scores_np, 0.5)

    r = batched_nms(jnp.asarray(boxes_np)[None], jnp.asarray(scores_np)[None],
                    jnp.zeros((1, n), jnp.int32), conf_thres=0.0,
                    iou_thres=0.5, top_k=n, max_det=n, agnostic=True)
    got_boxes = np.asarray(r.boxes[0][np.asarray(r.valid[0])])
    exp_boxes = boxes_np[expected]
    assert got_boxes.shape == exp_boxes.shape
    np.testing.assert_allclose(got_boxes, exp_boxes, rtol=1e-5)


def test_nms_max_det_cap():
    n = 20
    # disjoint boxes, all high score → capped at max_det
    xs = np.arange(n, dtype=np.float32) * 100
    boxes = np.stack([xs, xs, xs + 10, xs + 10], axis=1)[None]
    scores = np.full((1, n), 0.9, np.float32)
    r = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.zeros((1, n), jnp.int32), conf_thres=0.1,
                    top_k=n, max_det=5)
    assert int(r.num_valid[0]) == 5


def test_pallas_kernel_matches_xla_interpret(rng):
    """The Pallas greedy-NMS kernel (interpret mode on CPU) must produce
    the exact keep-set of the XLA reference sweep."""
    import jax.numpy as jnp
    from custom_yolo_tpu.ops.pallas.nms_kernel import nms_keep_pallas
    from custom_yolo_tpu.ops.nms import _suppress

    n, k = 2, 128
    centers = rng.rand(n, k, 2) * 200
    wh = rng.rand(n, k, 2) * 50 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                           axis=2).astype(np.float32)
    valid = rng.rand(n, k) > 0.1
    from custom_yolo_tpu.ops.pallas.nms_kernel import (
        nms_keep_pallas_batched)
    keep_p = np.asarray(nms_keep_pallas(jnp.asarray(boxes),
                                        jnp.asarray(valid), 0.5,
                                        interpret=True))
    keep_b = np.asarray(nms_keep_pallas_batched(jnp.asarray(boxes),
                                                jnp.asarray(valid), 0.5,
                                                interpret=True))
    np.testing.assert_array_equal(keep_p, keep_b)
    for i in range(n):
        iou = box_iou_pairwise(jnp.asarray(boxes[i]), jnp.asarray(boxes[i]))
        import jax.numpy as jnp2
        keep_x = np.asarray(_suppress(iou, 0.5,
                                      init_keep=jnp2.asarray(valid[i])))
        np.testing.assert_array_equal(keep_p[i], keep_x)


# ---------------------------------------------------------------- merge-NMS
def _reference_merge_nms(boxes, scores, classes, conf_thres, iou_thres,
                         max_wh=7680.0):
    """Numpy transcription of the reference merge branch
    (model_utils.py:259-272): torchvision-NMS keep set, then weighted-mean
    merge over ALL candidates, then the redundancy requirement."""
    sel = scores > conf_thres
    b, s, c = boxes[sel], scores[sel], classes[sel]
    order = np.argsort(-s, kind="stable")
    b, s, c = b[order], s[order], c[order]
    shifted = b + (c[:, None].astype(np.float64) * max_wh)
    keep_idx = _greedy_nms_python(shifted, s, iou_thres)
    n = len(b)
    if not (1 < n < 3000):
        return b[keep_idx], s[keep_idx], c[keep_idx]
    iou = np.asarray(box_iou_pairwise(jnp.asarray(shifted),
                                      jnp.asarray(shifted)))
    out_boxes, out_scores, out_classes = [], [], []
    for i in keep_idx:
        ov = iou[i] > iou_thres
        w = ov * s
        merged = (w @ b) / w.sum()
        if ov.sum() > 1:  # redundant (self counts once)
            out_boxes.append(merged)
            out_scores.append(s[i])
            out_classes.append(c[i])
    return (np.asarray(out_boxes).reshape(-1, 4), np.asarray(out_scores),
            np.asarray(out_classes))


def test_merge_nms_matches_reference_semantics(rng):
    for seed in range(4):
        r = np.random.RandomState(seed)
        n = 40
        centers = r.rand(n, 2) * 100
        wh = r.rand(n, 2) * 20 + 5
        boxes_np = np.concatenate([centers - wh / 2, centers + wh / 2],
                                  axis=1).astype(np.float32)
        scores_np = r.rand(n).astype(np.float32)
        classes_np = r.randint(0, 3, n).astype(np.int32)

        eb, es, ec = _reference_merge_nms(boxes_np, scores_np, classes_np,
                                          conf_thres=0.2, iou_thres=0.5)
        res = batched_nms(jnp.asarray(boxes_np[None]),
                          jnp.asarray(scores_np[None]),
                          jnp.asarray(classes_np[None]), conf_thres=0.2,
                          iou_thres=0.5, top_k=64, max_det=64, merge=True,
                          backend="xla")
        v = np.asarray(res.valid[0])
        got_s = np.asarray(res.scores[0])[v]
        got_b = np.asarray(res.boxes[0])[v]
        got_c = np.asarray(res.classes[0])[v]
        # same surviving set (scores identify candidates uniquely here)
        np.testing.assert_allclose(np.sort(got_s)[::-1], np.sort(es)[::-1],
                                   rtol=1e-6)
        order_e = np.argsort(-es, kind="stable")
        np.testing.assert_allclose(got_b, eb[order_e], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(got_c, ec[order_e])


def test_merge_nms_single_candidate_passthrough():
    """n==1 skips the merge branch (reference: 1 < n) — the lone box
    survives even though it has no supporter."""
    boxes = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)
    r = batched_nms(boxes, jnp.asarray([[0.9]]),
                    jnp.zeros((1, 1), jnp.int32), conf_thres=0.1,
                    merge=True, top_k=4, max_det=4, backend="xla")
    assert int(r.num_valid[0]) == 1


def test_class_filter():
    boxes = jnp.asarray([[[0, 0, 10, 10], [20, 20, 30, 30],
                          [40, 40, 50, 50]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.7]])
    classes = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = batched_nms(boxes, scores, classes, conf_thres=0.1, top_k=4,
                    max_det=4, class_filter=(0, 2))
    v = np.asarray(r.valid[0])
    assert int(r.num_valid[0]) == 2
    assert set(np.asarray(r.classes[0])[v].tolist()) == {0, 2}


def test_multi_label_emits_one_candidate_per_class():
    boxes = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)
    all_scores = jnp.asarray([[[0.9, 0.8, 0.1]]])  # two classes above gate
    best = jnp.max(all_scores, -1)
    cls = jnp.argmax(all_scores, -1).astype(jnp.int32)
    r1 = batched_nms(boxes, best, cls, conf_thres=0.5, top_k=8, max_det=8)
    assert int(r1.num_valid[0]) == 1
    r2 = batched_nms(boxes, best, cls, conf_thres=0.5, top_k=8, max_det=8,
                     multi_label=True, all_scores=all_scores)
    v = np.asarray(r2.valid[0])
    assert int(r2.num_valid[0]) == 2  # class-offset keeps both
    assert set(np.asarray(r2.classes[0])[v].tolist()) == {0, 1}


def test_pool_overflow_keeps_highest_scores(rng):
    """More candidates above the gate than top_k (early-training regime,
    VERDICT #3): the pool keeps exactly the top_k best-scored boxes and NMS
    still returns the global best survivors."""
    n = 600
    r = np.random.RandomState(3)
    # non-overlapping grid → nothing suppressed; survivors = top-scored
    xs = (np.arange(n) % 30) * 20.0
    ys = (np.arange(n) // 30) * 20.0
    boxes_np = np.stack([xs, ys, xs + 10, ys + 10], 1).astype(np.float32)
    scores_np = r.rand(n).astype(np.float32) * 0.5 + 0.5  # all above gate
    classes_np = np.zeros(n, np.int32)
    res = batched_nms(jnp.asarray(boxes_np[None]),
                      jnp.asarray(scores_np[None]),
                      jnp.asarray(classes_np[None]), conf_thres=0.25,
                      top_k=128, max_det=128, backend="xla")
    got = np.sort(np.asarray(res.scores[0])[np.asarray(res.valid[0])])[::-1]
    want = np.sort(scores_np)[::-1][:128]
    np.testing.assert_allclose(got, want, rtol=1e-6)
