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
