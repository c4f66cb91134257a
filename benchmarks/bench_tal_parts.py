#!/usr/bin/env python
"""Decompose the TAL loss-only time (VERDICT r2 #2 follow-up).

`bench_train_step.py --loss_only --assigner tal` measures the whole
assigner+loss subgraph (26.7 ms fwd+bwd at x/640²/B=16/G=64, r3). This
probe times its pieces separately — same N-steps-in-one-scan scalar-fetch
methodology — so optimization effort lands on the right chunk:

  assign_fwd   task_aligned_assign alone (fwd only — it sits under
               stop_gradient in the real loss)
  iou_metric   box_iou_pairwise + per-GT class gather + metric + in_box
  topk         the k-round argmax+mask loop, metric precomputed
  posttopk     conflict resolution + target gathers + score normalization
  loss_tail    TAL loss terms (BCE/CIoU/DFL) fwd+bwd with the assignment
               precomputed as constants
  full         the real thing (cross-check vs bench_train_step)

``--consume {both,value_only,grads_only} [--assigner a]`` instead times the
full loss with different outputs consumed — the *consumption ablation* that
found the r3 lane-gather pathology: a pure-forward evaluation that costs as
much as fwd+bwd while a grads-only one is cheap means XLA DCE'd a serial
op in the value chain (gather VJPs are scatters, so the backward never
needs the forward gathers). See docs/PERF.md "The lane-gather discovery".

Reference context: the assigner replaces the per-image python loop of
``src/model/losses.py:195-266``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--input_size", type=int, default=640)
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--parts", default="all")
    p.add_argument("--consume", default=None,
                   choices=["both", "value_only", "grads_only"],
                   help="consumption-ablation mode (overrides --parts)")
    p.add_argument("--assigner", default="tal",
                   choices=["nearest", "tal"],
                   help="assigner for --consume mode")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_TEST_CACHE", "/tmp/custom_yolo_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from custom_yolo_tpu.ops.anchors import make_anchors
    from custom_yolo_tpu.ops.boxes import box_iou_pairwise, xywh2xyxy
    from custom_yolo_tpu.ops.dfl import dfl_decode
    from custom_yolo_tpu.ops.boxes import dist2bbox
    from custom_yolo_tpu.train.assigner import task_aligned_assign
    from custom_yolo_tpu.train.losses import DetectionLoss, LossConfig

    b, g, c = args.batch_size, args.max_gt, 172
    size = args.input_size
    m = sum((size // s) ** 2 for s in (8, 16, 32))
    no = 4 * 16 + c
    feat_shapes = [(size // s, size // s) for s in (8, 16, 32)]
    anchors, strides = make_anchors(feat_shapes, (8, 16, 32), offset=0.5)
    anchor_px = anchors * strides

    rng = np.random.RandomState(0)
    preds0 = jnp.asarray(rng.randn(b, m, no).astype(np.float32)) * 2.0
    gt_boxes = jnp.asarray((rng.rand(b, g, 4) * 300 + 50).astype(np.float32))
    gt_labels = jnp.asarray(rng.randint(0, c, (b, g)).astype(np.int32))
    gt_mask = jnp.asarray(rng.rand(b, g) > 0.5)
    gt_xyxy = xywh2xyxy(gt_boxes)
    labels_safe = jnp.clip(gt_labels, 0, c - 1).astype(jnp.int32)
    gt_valid = gt_mask.astype(bool)

    loss_fn = DetectionLoss(LossConfig(num_classes=c, assigner="tal"))
    iters = args.iters

    if args.consume:
        lf = DetectionLoss(LossConfig(num_classes=c, assigner=args.assigner))

        def loss_of(preds):
            return lf(preds, anchors, strides, gt_boxes, gt_labels,
                      gt_mask)[0]

        def bench(preds):
            def body(acc, i):
                pi = preds + (i.astype(preds.dtype) * 1e-6)
                if args.consume == "value_only":
                    return acc + loss_of(pi), None
                loss, grads = jax.value_and_grad(loss_of)(pi)
                gsum = jnp.sum(grads.astype(jnp.float32))
                return acc + (loss + gsum if args.consume == "both"
                              else gsum), None
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return acc

        f = jax.jit(bench)
        float(f(preds0))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(preds0))
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(json.dumps({"consume": args.consume,
                          "assigner": args.assigner,
                          "ms": round(dt * 1000, 3)}))
        return

    def decode(preds):
        pred_dist = preds[..., :64]
        pred_logits = preds[..., 64:]
        ltrb = dfl_decode(pred_dist, 16)
        stride_v = strides[None, :, 0:1]
        pred_xyxy_px = dist2bbox(ltrb, anchors[None], xywh=False) * stride_v
        return pred_dist, pred_logits, pred_xyxy_px

    # ---- precomputed pieces for the isolated stages
    pred_dist0, pred_logits0, pred_xyxy0 = jax.jit(decode)(preds0)
    pred_scores0 = jax.nn.sigmoid(pred_logits0)

    def metric_of(pred_scores, pred_xyxy_px):
        ax = anchor_px[None, None, :, 0]
        ay = anchor_px[None, None, :, 1]
        x1, y1 = gt_xyxy[..., 0:1], gt_xyxy[..., 1:2]
        x2, y2 = gt_xyxy[..., 2:3], gt_xyxy[..., 3:4]
        in_box = ((ax > x1) & (ax < x2) & (ay > y1) & (ay < y2))
        in_box &= gt_valid[..., None]
        iou = jnp.clip(box_iou_pairwise(gt_xyxy, pred_xyxy_px), 0.0)
        cls_scores = jnp.take_along_axis(
            pred_scores.transpose(0, 2, 1), labels_safe[..., None], axis=1)
        metric = (cls_scores ** 0.5) * (iou ** 6.0)
        return jnp.where(in_box, metric, 0.0), iou, in_box

    metric0, iou0, in_box0 = jax.jit(metric_of)(pred_scores0, pred_xyxy0)

    def topk_of(metric):
        pos = jnp.zeros((b, g, m), dtype=bool)
        remaining = metric
        for _ in range(10):
            best = jnp.argmax(remaining, axis=-1)
            hit = best[..., None] == jnp.arange(m)[None, None, :]
            ok = jnp.take_along_axis(remaining, best[..., None],
                                     axis=-1) > 1e-9
            pos |= hit & ok
            remaining = jnp.where(hit, -jnp.inf, remaining)
        return pos

    pos0 = jax.jit(topk_of)(metric0)

    asn0 = jax.jit(lambda s, x: task_aligned_assign(
        s, x, anchor_px, gt_xyxy, gt_labels, gt_mask, num_classes=c,
        dense_scores=False))(pred_scores0, pred_xyxy0)

    def posttopk_of(pos, metric, iou):
        masked_iou = jnp.where(pos, iou, -1.0)
        best_gt = jnp.argmax(masked_iou, axis=1).astype(jnp.int32)
        fg = jnp.any(pos, axis=1)
        keep = jax.nn.one_hot(best_gt, g, axis=1, dtype=bool) & pos
        tb = jnp.take_along_axis(gt_xyxy, best_gt[..., None], axis=1)
        tl = jnp.take_along_axis(labels_safe, best_gt, axis=1)
        tl = jnp.where(fg, tl, 0)
        metric_pos = jnp.where(keep, metric, 0.0)
        max_metric = jnp.max(metric_pos, axis=-1, keepdims=True)
        max_iou = jnp.max(jnp.where(keep, iou, 0.0), axis=-1, keepdims=True)
        norm = metric_pos * max_iou / (max_metric + 1e-9)
        anchor_score = jnp.max(norm, axis=1)
        return tb, tl, fg, jnp.where(fg, anchor_score, 0.0)

    def loss_tail(preds):
        pred_dist, pred_logits, pred_xyxy_px = decode(preds)
        cfg = loss_fn.cfg
        score_sum = jnp.maximum(jnp.sum(asn0.anchor_scores), 1.0)
        base = jnp.sum(jnp.maximum(pred_logits, 0)
                       + jnp.log1p(jnp.exp(-jnp.abs(pred_logits))))
        tl_logit = jnp.take_along_axis(
            pred_logits, asn0.target_labels[..., None], axis=-1)[..., 0]
        cls_loss = (base - jnp.sum(tl_logit * asn0.anchor_scores)) / score_sum
        from custom_yolo_tpu.ops.boxes import bbox2dist, box_ciou
        from custom_yolo_tpu.train.losses import _two_bin_ce
        weight = asn0.anchor_scores
        ciou = box_ciou(pred_xyxy_px, asn0.target_boxes)
        box_loss = jnp.sum(jnp.where(asn0.fg_mask, (1.0 - ciou) * weight,
                                     0.0)) / score_sum
        stride_v = strides[None, :, 0:1]
        tgt_ltrb = bbox2dist(asn0.target_boxes / stride_v, anchors[None], 16)
        dfl_all = _two_bin_ce(pred_dist.reshape(b, m, 4, 16), tgt_ltrb)
        dfl_loss = jnp.sum(jnp.where(asn0.fg_mask[..., None],
                                     dfl_all * weight[..., None] / 4.0,
                                     0.0)) / score_sum
        return cls_loss + 1.5 * box_loss + 1.5 * dfl_loss

    def timed(name, fn, x):
        def bench(x):
            def body(acc, i):
                xi = x + i.astype(x.dtype) * 1e-6
                out = fn(xi)
                # consume EVERY output leaf so nothing is dead-code-eliminated
                leaves = jax.tree.leaves(out)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in leaves), None
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return acc
        f = jax.jit(bench)
        float(f(x))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(json.dumps({"part": name, "ms": round(dt * 1000, 3)}))

    parts = args.parts.split(",") if args.parts != "all" else [
        "assign_fwd", "iou_metric", "topk", "posttopk", "loss_tail", "full"]

    if "assign_fwd" in parts:
        timed("assign_fwd", lambda s: task_aligned_assign(
            s, pred_xyxy0, anchor_px, gt_xyxy, gt_labels, gt_mask,
            num_classes=c, dense_scores=False), pred_scores0)
    if "iou_metric" in parts:
        timed("iou_metric", lambda s: metric_of(s, pred_xyxy0), pred_scores0)
    if "topk" in parts:
        timed("topk", topk_of, metric0)
    if "posttopk" in parts:
        # vary iou (pos/metric captured) so the per-iter body can't hoist
        timed("posttopk", lambda iou: posttopk_of(pos0, metric0, iou), iou0)
    if "loss_tail" in parts:
        timed("loss_tail",
              lambda x: jax.value_and_grad(loss_tail)(x)[1], preds0)
    if "full" in parts:
        def full(preds):
            loss, _ = loss_fn(preds, anchors, strides, gt_boxes, gt_labels,
                              gt_mask)
            return loss
        timed("full", lambda x: jax.value_and_grad(full)(x)[1], preds0)


if __name__ == "__main__":
    main()
