"""Unit tests for geometry / anchor / DFL ops (golden numerics)."""

import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.ops.anchors import level_shapes, make_anchors, num_anchors
from custom_yolo_tpu.ops.boxes import (
    bbox2dist, box_ciou, box_iou_aligned, box_iou_pairwise, dist2bbox,
    xywh2xyxy, xyxy2xywh)
from custom_yolo_tpu.ops.dfl import dfl_decode, dfl_expectation_matmul


def test_make_anchors_640():
    shapes = level_shapes((640, 640))
    assert shapes == [(80, 80), (40, 40), (20, 20)]
    anchors, strides = make_anchors(shapes, (8, 16, 32))
    assert anchors.shape == (8400, 2)
    assert strides.shape == (8400, 1)
    assert num_anchors((640, 640)) == 8400
    # first anchor is cell center (0.5, 0.5); x varies fastest
    np.testing.assert_allclose(anchors[0], [0.5, 0.5])
    np.testing.assert_allclose(anchors[1], [1.5, 0.5])
    np.testing.assert_allclose(anchors[80], [0.5, 1.5])
    # stride blocks
    assert float(strides[0, 0]) == 8.0
    assert float(strides[6400, 0]) == 16.0
    assert float(strides[8000, 0]) == 32.0


def test_xywh_xyxy_roundtrip(rng):
    xywh = jnp.asarray(rng.rand(10, 4) * 100 + 1)
    xyxy = xywh2xyxy(xywh)
    back = xyxy2xywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywh), rtol=1e-6)


def test_dist2bbox_inverse():
    anchors = jnp.asarray([[5.0, 5.0], [10.0, 3.0]])
    dist = jnp.asarray([[1.0, 2.0, 3.0, 4.0], [0.5, 0.5, 0.5, 0.5]])
    xyxy = dist2bbox(dist, anchors, xywh=False)
    np.testing.assert_allclose(np.asarray(xyxy[0]), [4, 3, 8, 9])
    rec = bbox2dist(xyxy, anchors, reg_max=16)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(dist), atol=1e-6)


def test_iou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0],
                     [5.0, 5.0, 15.0, 15.0]])
    iou = box_iou_pairwise(a, b)
    np.testing.assert_allclose(np.asarray(iou[0, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou[0, 1]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(iou[0, 2]), 25 / 175, atol=1e-5)


def test_iou_aligned_matches_pairwise_diag(rng):
    boxes1 = jnp.asarray(rng.rand(6, 4) * 50)
    boxes1 = boxes1.at[:, 2:].add(boxes1[:, :2] + 1)  # ensure x2>x1
    boxes2 = jnp.asarray(rng.rand(6, 4) * 50)
    boxes2 = boxes2.at[:, 2:].add(boxes2[:, :2] + 1)
    full = box_iou_pairwise(boxes1, boxes2)
    diag = box_iou_aligned(boxes1, boxes2)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(full)),
                               np.asarray(diag), rtol=1e-5)


def test_ciou_bounds_and_perfect():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    ciou_self = box_ciou(a, a)
    np.testing.assert_allclose(np.asarray(ciou_self), 1.0, atol=1e-5)
    b = jnp.asarray([[100.0, 100.0, 110.0, 120.0]])
    assert float(box_ciou(a, b)[0]) < 0.0  # disjoint + center penalty


def test_dfl_decode_expectation():
    # one-hot logits at bin k decode to ~k
    logits = np.full((1, 1, 64), -20.0, np.float32)
    for side, k in enumerate([0, 3, 7, 15]):
        logits[0, 0, side * 16 + k] = 20.0
    out = dfl_decode(jnp.asarray(logits), 16)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 3, 7, 15],
                               atol=1e-3)
    # uniform logits decode to midpoint
    uniform = dfl_decode(jnp.zeros((1, 1, 64)), 16)
    np.testing.assert_allclose(np.asarray(uniform[0, 0]), [7.5] * 4,
                               atol=1e-5)


def test_dfl_matmul_variant_matches(rng):
    x = jnp.asarray(rng.randn(2, 5, 64).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dfl_decode(x, 16)),
                               np.asarray(dfl_expectation_matmul(x, 16)),
                               rtol=1e-5)
