#!/usr/bin/env python
"""Decompose detection quality into score-RANKING vs box-LOCALIZATION.

For a checkpoint, collects val-set predictions once (near-zero gate, like
``scripts/sweep_eval.py``), then scores COCO mAP@50:95 twice:

* ``as-is``   — the model's own confidence ranking;
* ``oracle``  — identical boxes/labels, scores replaced by each
  prediction's best IoU against a same-class GT (perfect ranking).

``oracle − as-is`` is pure mis-ranking loss; a low ``oracle`` means the
boxes themselves are bad.  Also reports the mean best-IoU over GT boxes
(coverage-localization) and the Spearman rank correlation between
confidence and best-IoU over predictions.  Built for the matched-recipe
gap attribution in docs/QUALITY_PARITY.md (VERDICT r4 task 1).

    python scripts/rank_diag.py --config configs/parity_n_matched.yaml \
        --checkpoint dataset_parity/experiments/matched_s0 --epoch 79 \
        --device cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_THRESHOLD = 5e-4


def parse_args():
    p = argparse.ArgumentParser(description="ranking/localization diagnostic")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint parent dir")
    p.add_argument("--epoch", type=int, required=True)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--ref_box_convention", action="store_true")
    p.add_argument("--no_ema", action="store_true")
    return p.parse_args()


def iou_matrix(a, b):
    """IoU between (N,4) and (M,4) center-xywh boxes."""
    import numpy as np
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    ix = (np.minimum(ax2[:, None], bx2[None]) -
          np.maximum(ax1[:, None], bx1[None])).clip(0)
    iy = (np.minimum(ay2[:, None], by2[None]) -
          np.maximum(ay1[:, None], by1[None])).clip(0)
    inter = ix * iy
    union = ((ax2 - ax1) * (ay2 - ay1))[:, None] + \
            ((bx2 - bx1) * (by2 - by1))[None] - inter
    return inter / np.maximum(union, 1e-9)


def main():
    args = parse_args()
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from custom_yolo_tpu.config import Config
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader
    from custom_yolo_tpu.data.transforms import make_device_batch
    from custom_yolo_tpu.eval.coco_map import COCOmAP
    from custom_yolo_tpu.eval.decode import (decode_predictions,
                                             decoded_to_lists)
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.train.optim import build_optimizer
    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager
    from custom_yolo_tpu.utils.common import get_num_workers

    cfg = Config.from_yaml(args.config)
    policy = resolve_policy(cfg.training.sharding.precision)
    model = YoloModel(width=tuple(cfg.model.width),
                      depth=tuple(cfg.model.depth),
                      csp=tuple(cfg.model.csp),
                      num_classes=cfg.model.num_classes,
                      reg_max=cfg.model.reg_max, policy=policy)
    variables0 = model.init(
        jax.random.key(0),
        jnp.zeros((1, *cfg.model.input_size, 3), policy.compute_dtype),
        train=False)
    manager = CheckpointManager(args.checkpoint)

    edir = os.path.join(args.checkpoint, f"model_epoch_{args.epoch}")
    if os.path.exists(os.path.join(edir, "transforms.json")):
        from custom_yolo_tpu.models import Detector
        det = Detector(cfg.model.width, cfg.model.depth, cfg.model.csp,
                       num_classes=cfg.model.num_classes,
                       reg_max=cfg.model.reg_max,
                       precision=cfg.training.sharding.precision,
                       input_size=tuple(cfg.model.input_size))
        det.load_weights(edir)
        model, variables = det.module, det.variables
    else:
        tx = build_optimizer(cfg.training)
        cfg_ema = cfg.training.ema_decay > 0
        state = None
        for ema_flag in (cfg_ema, not cfg_ema):
            template = jax.device_get(
                TrainState.create(variables0, tx, jax.random.key(0),
                                  ema=ema_flag))
            try:
                state = manager.restore(template, epoch=args.epoch)
                break
            except ValueError:
                continue
        if state is None:
            raise SystemExit(f"[ERROR] cannot restore epoch {args.epoch}")
        variables = state.variables if args.no_ema else state.eval_variables

    ds = DetectionDataset(
        os.path.join(cfg.data.processed_dir, cfg.data.val_parquet),
        cfg.data.val_images, input_size=tuple(cfg.model.input_size),
        is_test=cfg.training.is_test, max_gt=cfg.data.max_gt_boxes,
        seed=cfg.project.seed, letterbox=cfg.data.letterbox)
    loader = DataLoader(ds, cfg.training.batch_size, shuffle=False,
                        drop_last=False, num_workers=get_num_workers(),
                        seed=cfg.project.seed)
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))

    per_image = []
    key = jax.random.key(0)
    for host_batch in loader:
        batch = make_device_batch(host_batch, key, train=False)
        preds, anchors, strides = forward(variables, batch["images"])
        decoded = decode_predictions(
            preds, anchors, strides, conf_threshold=BASE_THRESHOLD,
            top_k=args.top_k)
        pred_lists = decoded_to_lists(decoded)
        scores = np.asarray(decoded.scores)
        valid = np.asarray(decoded.valid)
        gt_boxes = np.asarray(batch["gt_boxes"])
        gt_labels = np.asarray(batch["gt_labels"])
        gt_mask = np.asarray(batch["gt_mask"])
        pad = np.asarray(host_batch.get(
            "sample_pad", np.zeros(gt_boxes.shape[0], bool)))
        for i, plist in enumerate(pred_lists):
            if pad[i]:
                continue
            if args.ref_box_convention and len(plist):
                plist = plist.copy()
                plist[:, 0] += plist[:, 2] / 2
                plist[:, 1] += plist[:, 3] / 2
            m = gt_mask[i]
            targets = np.concatenate(
                [gt_boxes[i][m],
                 gt_labels[i][m, None].astype(np.float32)], axis=1)
            per_image.append((plist, scores[i][valid[i]], targets))

    # best same-class IoU per prediction and per GT
    def best_ious(plist, targets):
        ious = iou_matrix(plist[:, :4], targets[:, :4])
        same = plist[:, 4:5] == targets[None, :, 4]
        ious = ious * same
        per_pred = ious.max(axis=1) if ious.shape[1] else \
            np.zeros(len(plist), np.float32)
        per_gt = ious.max(axis=0) if ious.shape[0] else \
            np.zeros(len(targets), np.float32)
        return per_pred, per_gt

    import numpy as np
    cmap_asis = COCOmAP(cfg.model.num_classes)
    cmap_oracle = COCOmAP(cfg.model.num_classes)
    all_conf, all_iou, gt_cov = [], [], []
    for plist, sc, targets in per_image:
        per_pred, per_gt = best_ious(plist, targets)
        cmap_asis.update(plist, sc, targets)
        cmap_oracle.update(plist, per_pred, targets)
        all_conf.append(sc)
        all_iou.append(per_pred)
        gt_cov.append(per_gt)
    asis = {k: float(v) for k, v in cmap_asis.compute().items()}
    oracle = {k: float(v) for k, v in cmap_oracle.compute().items()}
    conf = np.concatenate(all_conf)
    iou = np.concatenate(all_iou)
    cov = np.concatenate(gt_cov)
    # Spearman via rank transform (scipy-free)
    def ranks(x):
        r = np.empty(len(x))
        r[np.argsort(x)] = np.arange(len(x))
        return r
    rho = float(np.corrcoef(ranks(conf), ranks(iou))[0, 1]) \
        if len(conf) > 1 else float("nan")
    print(f"[diag] epoch {args.epoch}: {len(per_image)} images, "
          f"{len(conf)} preds, {len(cov)} GT")
    print(f"  as-is  COCO mAP@50:95 = {asis['mAP_50_95']:.4f}  "
          f"mAP@50 = {asis['mAP_50']:.4f}")
    print(f"  oracle COCO mAP@50:95 = {oracle['mAP_50_95']:.4f}  "
          f"mAP@50 = {oracle['mAP_50']:.4f}   "
          f"(ranking loss = {oracle['mAP_50_95'] - asis['mAP_50_95']:.4f})")
    print(f"  mean best-IoU over GT   = {cov.mean():.4f}  "
          f"(GT with IoU>=0.5: {(cov >= 0.5).mean():.3f})")
    print(f"  spearman(conf, best-IoU) = {rho:.4f}")


if __name__ == "__main__":
    main()
