#!/usr/bin/env python
"""Checkpoint × confidence-threshold evaluation sweep.

Runs the val-set forward ONCE per checkpoint at a near-zero confidence
gate, caches the decoded per-image predictions on the host, then scores
every requested confidence threshold post-hoc — exact, because the decode's
top-k is score-ordered, so gate-then-topk ≡ topk-then-gate
(``custom_yolo_tpu/eval/decode.py:53-60``).

Built for two VERDICT r4 follow-ups (docs/QUALITY_PARITY.md):

* best-mAP checkpoint selection for our runs (the reference side of the
  head-to-head picked its best self-reported-mAP epoch; ours picked best
  val-loss — asymmetric selection this sweep removes);
* the greedy-metric operating-point sweep: the reference's own
  single-threshold metric (``src/training/metrics.py:159-191``) at each
  side's best conf threshold, not just the fixed 0.25.

Metrics per (checkpoint, threshold): greedy P/R/F1/"mAP" (reference
semantics, no NMS — quirk #5) and true COCO mAP@50:95 / mAP@50 over the
threshold-gated detection set.

    python scripts/sweep_eval.py --config configs/parity_n_matched.yaml \
        --epochs all --thresholds 0.05,0.1,0.25,0.4 --out /tmp/sweep.json
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_THRESHOLD = 5e-4  # forward/decode gate; all swept thresholds are above


def parse_args():
    p = argparse.ArgumentParser(description="checkpoint/threshold sweep")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint parent dir (defaults to config's)")
    p.add_argument("--epochs", default="all",
                   help="'all', 'latest', or comma-separated epoch numbers")
    p.add_argument("--thresholds",
                   default="0.001,0.05,0.1,0.25,0.4,0.5,0.6,0.75")
    p.add_argument("--top_k", type=int, default=100,
                   help="per-image detection cap (reference decode: 100)")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ref_box_convention", action="store_true",
                   help="score predictions as top-left-xywh (quirk #2 "
                        "correction for migrated reference checkpoints)")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--out", default=None, help="write results JSON here")
    return p.parse_args()


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
    from custom_yolo_tpu.eval.metrics import DetectionMetrics
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.train.optim import build_optimizer
    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager
    from custom_yolo_tpu.utils.common import get_num_workers

    cfg = Config.from_yaml(args.config)
    if args.batch_size:
        cfg.training.batch_size = args.batch_size

    ckpt_dir = args.checkpoint or cfg.checkpoint.checkpoint_dir
    epoch_dirs = sorted(
        glob.glob(os.path.join(ckpt_dir, "model_epoch_*")),
        key=lambda d: int(os.path.basename(d).rsplit("_", 1)[1]))
    if not epoch_dirs:
        raise SystemExit(f"[ERROR] no model_epoch_* under {ckpt_dir}")
    epochs_avail = [int(os.path.basename(d).rsplit("_", 1)[1])
                    for d in epoch_dirs]
    if args.epochs == "all":
        epochs = epochs_avail
    elif args.epochs == "latest":
        epochs = [epochs_avail[-1]]
    else:
        epochs = [int(e) for e in args.epochs.split(",")]
    thresholds = [float(t) for t in args.thresholds.split(",")]
    assert all(t >= BASE_THRESHOLD for t in thresholds), (
        f"thresholds must be ≥ the decode gate {BASE_THRESHOLD}")

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
    manager = CheckpointManager(ckpt_dir)

    ds = DetectionDataset(
        os.path.join(cfg.data.processed_dir, cfg.data.val_parquet),
        cfg.data.val_images, input_size=tuple(cfg.model.input_size),
        is_test=cfg.training.is_test, max_gt=cfg.data.max_gt_boxes,
        seed=cfg.project.seed, letterbox=cfg.data.letterbox)
    loader = DataLoader(ds, cfg.training.batch_size, shuffle=False,
                        drop_last=False, num_workers=get_num_workers(),
                        seed=cfg.project.seed)
    print(f"[INFO] sweeping {len(epochs)} checkpoints × "
          f"{len(thresholds)} thresholds over {len(ds)} images")

    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def load_epoch(epoch):
        edir = os.path.join(ckpt_dir, f"model_epoch_{epoch}")
        if os.path.exists(os.path.join(edir, "transforms.json")):
            from custom_yolo_tpu.models import Detector
            det = Detector(cfg.model.width, cfg.model.depth, cfg.model.csp,
                           num_classes=cfg.model.num_classes,
                           reg_max=cfg.model.reg_max,
                           precision=cfg.training.sharding.precision,
                           input_size=tuple(cfg.model.input_size))
            det.load_weights(edir)
            return det.module, det.variables
        tx = build_optimizer(cfg.training)
        # the checkpoint's EMA presence may differ from the config's (e.g.
        # sweeping a matched-recipe checkpoint dir with a quality config):
        # try the config's setting first, fall back to the opposite
        cfg_ema = cfg.training.ema_decay > 0
        state = None
        for ema_flag in (cfg_ema, not cfg_ema):
            template = jax.device_get(
                TrainState.create(variables0, tx, jax.random.key(0),
                                  ema=ema_flag))
            try:
                state = manager.restore(template, epoch=epoch)
                break
            except ValueError:
                continue
        if state is None:
            raise SystemExit(f"[ERROR] cannot restore epoch {epoch}")
        v = state.variables if args.no_ema else state.eval_variables
        return model, v

    def collect(mdl, variables):
        """One forward pass; per-image (pred(M,5), score(M,), target(T,5))."""
        fwd = (forward if mdl is model
               else jax.jit(lambda v, x: mdl.apply(v, x, train=False)))
        per_image = []
        key = jax.random.key(0)
        for host_batch in loader:
            batch = make_device_batch(host_batch, key, train=False)
            preds, anchors, strides = fwd(variables, batch["images"])
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
        return per_image

    def score(per_image, thr):
        det = DetectionMetrics(cfg.model.num_classes)
        cmap = COCOmAP(cfg.model.num_classes)
        for plist, sc, targets in per_image:
            keep = sc >= thr
            det.update(plist[keep], targets)
            cmap.update(plist[keep], sc[keep], targets)
        out = {k: float(v) for k, v in det.compute().items()}
        out.update({k: float(v) for k, v in cmap.compute().items()})
        return out

    results = {}
    for epoch in epochs:
        mdl, variables = load_epoch(epoch)
        per_image = collect(mdl, variables)
        n_preds = sum(len(p[0]) for p in per_image)
        results[str(epoch)] = {}
        for thr in thresholds:
            r = score(per_image, thr)
            results[str(epoch)][f"{thr:g}"] = r
            print(f"[epoch {epoch:>3}] conf={thr:<5g} "
                  f"P={r.get('precision', 0):.4f} "
                  f"R={r.get('recall', 0):.4f} "
                  f"greedy_mAP={r.get('mAP', 0):.4f} "
                  f"coco={r['mAP_50_95']:.4f} coco50={r['mAP_50']:.4f}",
                  flush=True)
        print(f"[epoch {epoch:>3}] {n_preds} raw preds at "
              f"gate {BASE_THRESHOLD}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[INFO] wrote {args.out}")


if __name__ == "__main__":
    main()
