"""Loss tests: numpy re-derivation of the reference semantics (per-image
loop, ``src/model/losses.py:84-281``) vs the vectorized JAX implementation,
plus padding-invariance and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_yolo_tpu.ops.anchors import level_shapes, make_anchors
from custom_yolo_tpu.train.losses import DetectionLoss, LossConfig

NC = 9
RM = 16
SIZE = (64, 64)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _reference_loss_numpy(preds, anchors, strides, gt_list, num_classes,
                          lambda_cls=1.0, lambda_dfl=1.5):
    """Independent numpy transcription of the reference loss *semantics*
    (losses.py:93-281), per-image python loop and all, including the
    swapped-operand IoU bug (:20). Used as the parity oracle."""
    n, m, _ = preds.shape
    pred_dist = preds[:, :, : 4 * RM].reshape(n, m, 4, RM)
    pred_scores = preds[:, :, 4 * RM:]
    ltrb = (_softmax(pred_dist) * np.arange(RM)).sum(-1)  # (n, m, 4)

    ax, ay = anchors[:, 0], anchors[:, 1]
    s = strides[:, 0]
    x1 = (ax - ltrb[:, :, 0]) * s
    y1 = (ay - ltrb[:, :, 1]) * s
    x2 = (ax + ltrb[:, :, 2]) * s
    y2 = (ay + ltrb[:, :, 3]) * s
    pred_xywh = np.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1],
                         axis=2)

    total_dfl, total_cls = 0.0, 0.0
    for b in range(n):
        gt = gt_list[b]
        target_scores = np.zeros((m, num_classes))
        if len(gt):
            gt_xywh = gt[:, :4]
            d = np.linalg.norm(gt_xywh[:, None, :2]
                               - pred_xywh[b][None, :, :2], axis=2)
            idx = d.argmin(1)
            # DFL
            msrt = s[idx]
            gx1 = (gt_xywh[:, 0] - gt_xywh[:, 2] / 2) / msrt
            gy1 = (gt_xywh[:, 1] - gt_xywh[:, 3] / 2) / msrt
            gx2 = (gt_xywh[:, 0] + gt_xywh[:, 2] / 2) / msrt
            gy2 = (gt_xywh[:, 1] + gt_xywh[:, 3] / 2) / msrt
            tl = np.clip(anchors[idx, 0] - gx1, 0, RM - 1 - 0.01)
            tt = np.clip(anchors[idx, 1] - gy1, 0, RM - 1 - 0.01)
            tr = np.clip(gx2 - anchors[idx, 0], 0, RM - 1 - 0.01)
            tb = np.clip(gy2 - anchors[idx, 1], 0, RM - 1 - 0.01)
            tgt = np.stack([tl, tt, tr, tb], 1)
            dfl = 0.0
            for i in range(4):
                logp = np.log(_softmax(pred_dist[b][idx, i]))
                left = tgt[:, i].astype(int)
                right = left + 1
                wl = right - tgt[:, i]
                wr = tgt[:, i] - left
                ce_l = -logp[np.arange(len(gt)), left]
                ce_r = -logp[np.arange(len(gt)), np.clip(right, 0, RM - 1)]
                dfl += (ce_l * wl + ce_r * wr).mean()
            total_dfl += dfl / 4.0
            # QFL target: reference-bug IoU
            mp = pred_xywh[b][idx]
            b1x1 = mp[:, 0] - mp[:, 2] / 2
            b1y1 = mp[:, 1] - mp[:, 3] / 2
            b1x2 = mp[:, 0] + mp[:, 2] / 2
            b1y2 = mp[:, 3] + mp[:, 1] / 2  # reference bug losses.py:20
            b2x1 = gt_xywh[:, 0] - gt_xywh[:, 2] / 2
            b2y1 = gt_xywh[:, 1] - gt_xywh[:, 3] / 2
            b2x2 = gt_xywh[:, 0] + gt_xywh[:, 2] / 2
            b2y2 = gt_xywh[:, 1] + gt_xywh[:, 3] / 2
            iw = np.clip(np.minimum(b1x2, b2x2) - np.maximum(b1x1, b2x1), 0,
                         None)
            ih = np.clip(np.minimum(b1y2, b2y2) - np.maximum(b1y1, b2y1), 0,
                         None)
            inter = iw * ih
            union = ((b1x2 - b1x1) * (b1y2 - b1y1)
                     + (b2x2 - b2x1) * (b2y2 - b2y1) - inter)
            iou = inter / (union + 1e-6)
            for g in range(len(gt)):
                target_scores[idx[g]] = 0.0
                target_scores[idx[g], int(gt[g, 4])] = iou[g]
        sig = 1 / (1 + np.exp(-pred_scores[b]))
        pos = target_scores * (1 - sig) ** 2 * np.log(sig + 1e-12)
        neg = (1 - target_scores) * sig ** 2 * np.log(1 - sig + 1e-12)
        total_cls += -(pos + neg).sum() / m
    mean_dfl = total_dfl / n
    mean_cls = total_cls / n
    return lambda_dfl * mean_dfl + lambda_cls * mean_cls, mean_dfl, mean_cls


@pytest.fixture(scope="module")
def setup():
    anchors, strides = make_anchors(level_shapes(SIZE), (8, 16, 32))
    m = anchors.shape[0]
    rng = np.random.RandomState(7)
    preds = rng.randn(2, m, 4 * RM + NC).astype(np.float32)
    gt_list = [
        np.array([[20, 20, 12, 16, 2], [40, 30, 20, 10, 5]], np.float32),
        np.array([[32, 32, 30, 30, 1]], np.float32),
    ]
    return anchors, strides, preds, gt_list


def _pad(gt_list, g_max):
    n = len(gt_list)
    boxes = np.zeros((n, g_max, 4), np.float32)
    labels = np.zeros((n, g_max), np.int32)
    mask = np.zeros((n, g_max), bool)
    for i, gt in enumerate(gt_list):
        k = len(gt)
        boxes[i, :k] = gt[:, :4]
        labels[i, :k] = gt[:, 4].astype(np.int32)
        mask[i, :k] = True
    return boxes, labels, mask


def test_vectorized_matches_reference_semantics(setup):
    anchors, strides, preds, gt_list = setup
    exp_total, exp_dfl, exp_cls = _reference_loss_numpy(
        preds, np.asarray(anchors), np.asarray(strides), gt_list, NC)

    loss_fn = DetectionLoss(LossConfig(num_classes=NC, lambda_cls=1.0,
                                       lambda_dfl=1.5,
                                       iou_compat_bug=True))
    boxes, labels, mask = _pad(gt_list, 8)
    total, mets = loss_fn(jnp.asarray(preds), anchors, strides,
                          jnp.asarray(boxes), jnp.asarray(labels),
                          jnp.asarray(mask))
    np.testing.assert_allclose(float(mets["box_loss"]), exp_dfl, rtol=1e-4)
    np.testing.assert_allclose(float(mets["cls_loss"]), exp_cls, rtol=1e-4)
    np.testing.assert_allclose(float(total), exp_total, rtol=1e-4)


def test_padding_invariance(setup):
    anchors, strides, preds, gt_list = setup
    loss_fn = DetectionLoss(LossConfig(num_classes=NC))
    outs = []
    for g_max in (4, 16):
        boxes, labels, mask = _pad(gt_list, g_max)
        total, _ = loss_fn(jnp.asarray(preds), anchors, strides,
                           jnp.asarray(boxes), jnp.asarray(labels),
                           jnp.asarray(mask))
        outs.append(float(total))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_grad_flows_and_finite(setup):
    anchors, strides, preds, gt_list = setup
    boxes, labels, mask = _pad(gt_list, 8)
    for assigner in ("nearest", "tal"):
        loss_fn = DetectionLoss(LossConfig(num_classes=NC,
                                           assigner=assigner))
        g = jax.grad(lambda p: loss_fn(p, anchors, strides,
                                       jnp.asarray(boxes),
                                       jnp.asarray(labels),
                                       jnp.asarray(mask))[0])(
            jnp.asarray(preds))
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.linalg.norm(g)) > 0


def test_no_gt_image_contributes_zero_dfl(setup):
    anchors, strides, preds, _ = setup
    loss_fn = DetectionLoss(LossConfig(num_classes=NC))
    boxes, labels, mask = _pad([np.zeros((0, 5), np.float32),
                                np.zeros((0, 5), np.float32)], 4)
    total, mets = loss_fn(jnp.asarray(preds), anchors, strides,
                          jnp.asarray(boxes), jnp.asarray(labels),
                          jnp.asarray(mask))
    assert float(mets["box_loss"]) == 0.0
    assert float(mets["cls_loss"]) > 0.0  # background QFL still applies
    assert bool(jnp.isfinite(total))


def test_sparse_targets_match_dense(setup):
    """The sparse-target formulation (no (N, M, C) target tensor — the
    round-3 train-step memory optimization) must agree with the dense
    scatter path in value AND gradient, including duplicate assignments
    (two GTs matched to the same anchor+class must merge by max IoU)."""
    anchors, strides, preds, _ = setup
    # engineered duplicates: same center & label twice (same nearest
    # anchor, same class), plus a same-anchor different-label pair
    gt_list = [
        np.array([[20, 20, 12, 16, 2], [20, 20, 20, 10, 2],
                  [20.5, 20.5, 8, 8, 3], [40, 30, 20, 10, 5]], np.float32),
        np.array([[32, 32, 30, 30, 1], [32, 32, 30, 30, 1]], np.float32),
    ]
    boxes, labels, mask = _pad(gt_list, 8)
    args = (anchors, strides, jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(mask))
    for assigner in ("nearest", "tal"):
        outs, grads = [], []
        for sparse in (False, True):
            loss_fn = DetectionLoss(LossConfig(
                num_classes=NC, assigner=assigner, sparse_targets=sparse))
            val, grad = jax.value_and_grad(
                lambda p: loss_fn(p, *args)[0])(jnp.asarray(preds))
            outs.append(float(val))
            grads.append(np.asarray(grad))
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5)
        np.testing.assert_allclose(grads[0], grads[1], rtol=1e-4,
                                   atol=1e-7)


def test_tal_assigner_positive_anchors(setup):
    """TAL must mark anchors inside the GT box as positives and produce
    bounded target scores."""
    anchors, strides, preds, gt_list = setup
    from custom_yolo_tpu.ops.boxes import xywh2xyxy
    from custom_yolo_tpu.train.assigner import task_aligned_assign

    boxes, labels, mask = _pad(gt_list, 8)
    m = anchors.shape[0]
    pred_scores = jnp.asarray(
        1 / (1 + np.exp(-preds[:, :, 4 * RM:])))
    anchor_px = anchors * strides
    # plausible predictions: a 16px box centered on every anchor (overlaps
    # GT so IoU^beta is non-zero — TAL yields no positives when nothing
    # overlaps, by design)
    pred_boxes = jnp.tile(jnp.concatenate(
        [anchor_px - 8.0, anchor_px + 8.0], axis=-1)[None], (2, 1, 1))
    asn = task_aligned_assign(pred_scores, pred_boxes, anchor_px,
                              xywh2xyxy(jnp.asarray(boxes)),
                              jnp.asarray(labels), jnp.asarray(mask), NC)
    assert bool(jnp.any(asn.fg_mask))
    assert float(jnp.max(asn.target_scores)) <= 1.0 + 1e-6
    # positives only where some GT exists
    assert int(jnp.sum(asn.fg_mask[1])) > 0


def test_tal_iterative_topk_matches_lax_topk():
    """The TAL assigner's k-round argmax+mask selection (r3: replaces the
    full-sort lax.top_k, which dominated the assigner on TPU) must pick
    the EXACT positive set lax.top_k picked — including duplicate metric
    values (ties keep the lowest anchor index) and rows with fewer than k
    positives above eps."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    n, g, m, k, eps = 3, 6, 97, 10, 1e-9
    metric = rng.rand(n, g, m).astype(np.float32)
    # engineered ties + all-zero rows + sparse rows
    metric[0, 0] = 0.0                       # no positives at all
    metric[0, 1, :20] = 0.5                  # 20-way tie across the k edge
    metric[0, 1, 20:] = 0.0
    metric[1, 2] = 0.0
    metric[1, 2, [5, 50, 90]] = [0.9, 0.9, 0.8]   # fewer than k positives
    metric = jnp.asarray(metric)

    tv, ti = jax.lax.top_k(metric, k)
    want = np.zeros((n, g, m), bool)
    bi = np.arange(n)[:, None, None]
    gi = np.arange(g)[None, :, None]
    np.maximum.at(want, (bi, gi, np.asarray(ti)), np.asarray(tv > eps))

    got = np.zeros((n, g, m), bool)
    remaining = metric
    for _ in range(k):
        best = jnp.argmax(remaining, axis=-1)
        hit = best[..., None] == jnp.arange(m)[None, None, :]
        ok = jnp.take_along_axis(remaining, best[..., None], axis=-1) > eps
        got |= np.asarray(hit & ok)
        remaining = jnp.where(hit, -jnp.inf, remaining)
    np.testing.assert_array_equal(got, want)


def test_qfl_finite_at_saturated_logits():
    """Saturated logits (σ rounds to exactly 1.0 in f32, any |x| ≳ 17) must
    NOT produce inf/nan. The reference's log(1 - σ + 1e-12) idiom loses the
    epsilon under XLA:TPU reassociation (measured: one saturated anchor
    poisoned the whole x/640² train step); the log-space form clamps at
    log(1e-12) exactly like the reference's epsilon does."""
    import jax
    import jax.numpy as jnp

    from custom_yolo_tpu.train.losses import (_log_sig_eps, _qfl_sparse,
                                              quality_focal_loss)

    logits = jnp.asarray([[-100.0, -17.0, 0.0, 17.0, 100.0]] * 8,
                         jnp.float32).reshape(1, 8, 5)
    targets = jnp.zeros((1, 8, 5), jnp.float32).at[0, 2, 3].set(0.7)
    qfl = quality_focal_loss(logits, targets)
    assert np.isfinite(np.asarray(qfl)).all()

    # the clamp must match the reference's epsilon semantics: at σ==1,
    # log(1-σ+1e-12) == log(1e-12)
    v = float(_log_sig_eps(jnp.float32(100.0)))
    assert abs(v) < 1e-6                       # log(σ+eps) ≈ log(1) = 0
    w = float(_log_sig_eps(jnp.float32(-100.0)))
    assert abs(w - np.log(1e-12)) < 1e-4       # clamped exactly at log eps

    # sparse path: same protection
    idx = jnp.zeros((1, 2), jnp.int32)
    labels = jnp.zeros((1, 2), jnp.int32)
    iou = jnp.asarray([[0.9, 0.0]], jnp.float32)
    mask = jnp.asarray([[True, False]])
    sp = _qfl_sparse(logits, idx, labels, iou, mask, 2.0)
    assert np.isfinite(np.asarray(sp)).all()


def test_two_bin_ce_onehot_matches_gather():
    """_two_bin_ce selects its two bins by one-hot multiply-reduce (a
    lane-indexed take_along_axis is near-serial on XLA:TPU — docs/PERF.md
    r3). The reduction form must be BIT-identical to the gather form,
    including integer targets (wr == 0) and targets just below reg_max-1."""
    import jax.numpy as jnp

    from custom_yolo_tpu.train.losses import _two_bin_ce

    rm = 16
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(64, 4, rm).astype(np.float32) * 8)
    t = rng.rand(64, 4).astype(np.float32) * (rm - 1 - 0.01)
    t[0] = [0.0, 1.0, 7.0, 14.0]            # exact-integer targets
    t[1] = [rm - 1 - 0.01] * 4              # the bbox2dist clamp value
    target = jnp.asarray(t)

    got = np.asarray(_two_bin_ce(logits, target))

    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    left = np.floor(t).astype(np.int64)
    right = np.clip(left + 1, 0, rm - 1)
    wl = (left + 1).astype(np.float32) - t
    wr = t - left.astype(np.float32)
    ce_l = -np.take_along_axis(logp, left[..., None], axis=-1)[..., 0]
    ce_r = -np.take_along_axis(logp, right[..., None], axis=-1)[..., 0]
    want = ce_l * wl + ce_r * wr
    np.testing.assert_array_equal(got, want.astype(np.float32))
