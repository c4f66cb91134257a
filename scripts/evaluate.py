#!/usr/bin/env python
"""Validation / evaluation entry point (BASELINE config #1: single-process
eval on a COCO val subset).

The CLI analogue of the reference's evaluation notebook
(``notebooks/04_evaluation_and_plots.ipynb``): load a checkpoint, run the
val set through the jitted forward + decode, and report both the
reference-parity greedy metrics and true COCO mAP@50:95.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="checkpoint evaluation")
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (defaults to config's)")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--dataset_percent", type=float, default=1.0)
    p.add_argument("--conf_threshold", type=float, default=0.25)
    p.add_argument("--use_nms", action="store_true",
                   help="apply NMS before metrics (the reference's metric "
                        "decode skips NMS — quirk #5)")
    p.add_argument("--coco_map", action="store_true",
                   help="also compute true COCO mAP@50:95")
    p.add_argument("--model_coords", action="store_true",
                   help="score COCO mAP in 640² model space instead of "
                        "original-image coordinates (the official protocol "
                        "uses original coordinates — area ranges depend on "
                        "true pixel sizes)")
    p.add_argument("--ref_box_convention", action="store_true",
                   help="interpret predicted box centers as TOP-LEFT "
                        "corners (SURVEY quirk #2: the reference trains on "
                        "top-left-xywh GT fed to a center-xywh loss, so "
                        "its weights place 'centers' at corners). Shifts "
                        "predictions by +[w/2, h/2] — the charitable "
                        "format-corrected scoring of a migrated reference "
                        "checkpoint (docs/QUALITY_PARITY.md)")
    p.add_argument("--quantize", default="none",
                   choices=["none", "dynamic", "static"],
                   help="evaluate the int8 serving path: fuse+quantize the "
                        "restored weights; 'static' additionally calibrates "
                        "activation scales on the first --calib_batches "
                        "batches (the throughput-viable mode — docs/PERF.md)")
    p.add_argument("--calib_batches", type=int, default=4)
    p.add_argument("--no_ema", action="store_true",
                   help="evaluate the LIVE params even when the checkpoint "
                        "tracks EMA weights (default scores the EMA tree — "
                        "the deployed weights)")
    args = p.parse_args()

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
    from custom_yolo_tpu.eval.decode import (
        decode_predictions, decoded_to_lists)
    from custom_yolo_tpu.eval.metrics import DetectionMetrics
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.train.optim import build_optimizer
    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager
    from custom_yolo_tpu.utils.common import get_num_workers

    cfg = Config.from_yaml(args.config)
    if args.batch_size:
        cfg.training.batch_size = args.batch_size

    policy = resolve_policy(cfg.training.sharding.precision)
    model = YoloModel(width=tuple(cfg.model.width),
                      depth=tuple(cfg.model.depth),
                      csp=tuple(cfg.model.csp),
                      num_classes=cfg.model.num_classes,
                      reg_max=cfg.model.reg_max, policy=policy)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, *cfg.model.input_size, 3), policy.compute_dtype),
        train=False)

    ckpt_dir = args.checkpoint or cfg.checkpoint.checkpoint_dir
    # accept a specific model_epoch_N dir too (common foot-gun: the manager
    # scans a PARENT dir; silently evaluating init weights poisons any
    # parity measurement)
    pinned_epoch = None
    base = os.path.basename(os.path.normpath(ckpt_dir))
    if base.startswith("model_epoch_") and base[12:].isdigit():
        pinned_epoch = int(base[12:])
        ckpt_dir = os.path.dirname(os.path.normpath(ckpt_dir))
    ckpt = CheckpointManager(ckpt_dir)
    latest = ckpt.latest_epoch()
    epoch_dir = (os.path.join(ckpt_dir, f"model_epoch_{pinned_epoch}")
                 if pinned_epoch is not None else
                 (os.path.join(ckpt_dir, f"model_epoch_{latest}")
                  if latest is not None else None))
    if (epoch_dir is not None
            and os.path.exists(os.path.join(epoch_dir, "transforms.json"))):
        # Detector.save_weights layout (raw variables + transforms sidecar)
        # — what scripts/import_torch.py writes for migrated reference
        # checkpoints; no TrainState wrapper to restore into
        from custom_yolo_tpu.models import Detector
        det = Detector(cfg.model.width, cfg.model.depth, cfg.model.csp,
                       num_classes=cfg.model.num_classes,
                       reg_max=cfg.model.reg_max,
                       precision=cfg.training.sharding.precision,
                       input_size=tuple(cfg.model.input_size))
        det.load_weights(epoch_dir)
        model, variables = det.module, det.variables
        print(f"[INFO] loaded Detector weights from {epoch_dir}")
    elif latest is not None:
        tx = build_optimizer(cfg.training)
        template = jax.device_get(
            TrainState.create(variables, tx, jax.random.key(0),
                              ema=cfg.training.ema_decay > 0))
        state = ckpt.restore(template, epoch=pinned_epoch)
        # EMA params (when tracked) are the deployed weights
        variables = state.variables if args.no_ema else state.eval_variables
        which = ("live" if args.no_ema or state.ema_params is None
                 else "EMA")
        print(f"[INFO] restored epoch {int(state.epoch)} from {ckpt_dir} "
              f"({which} params)")
    elif args.checkpoint:
        raise SystemExit(f"[ERROR] no model_epoch_* checkpoints under "
                         f"{ckpt_dir} — refusing to silently score init "
                         "weights (pass no --checkpoint to allow that)")
    else:
        print(f"[WARN] no checkpoint under {ckpt_dir}; evaluating init "
              "weights")

    ds = DetectionDataset(
        os.path.join(cfg.data.processed_dir, cfg.data.val_parquet),
        cfg.data.val_images, input_size=tuple(cfg.model.input_size),
        is_test=cfg.training.is_test, percent=args.dataset_percent,
        max_gt=cfg.data.max_gt_boxes, seed=cfg.project.seed,
        letterbox=cfg.data.letterbox)
    loader = DataLoader(ds, cfg.training.batch_size, shuffle=False,
                        drop_last=False, num_workers=get_num_workers(),
                        seed=cfg.project.seed)
    print(f"[INFO] evaluating {len(ds)} images")

    if args.quantize != "none":
        from custom_yolo_tpu.models import fuse_params
        from custom_yolo_tpu.ops.quant import (DEFAULT_QUANT_SKIP,
                                               bake_static_scales,
                                               quantize_fused_params)
        variables = {"params": quantize_fused_params(
            fuse_params(variables)["params"], skip=DEFAULT_QUANT_SKIP)}
        model = model.clone(fused=True, quantized=True,
                            quant_skip=DEFAULT_QUANT_SKIP)
        if args.quantize == "static":
            observe = jax.jit(lambda v, x: model.apply(
                v, x, train=False, mutable=["quant_stats"])[1]["quant_stats"])
            agg = None
            key0 = jax.random.key(0)
            for _, host_batch in zip(range(args.calib_batches), loader):
                batch = make_device_batch(host_batch, key0, train=False)
                stats = observe(variables, batch["images"])
                agg = stats if agg is None else jax.tree_util.tree_map(
                    jnp.maximum, agg, stats)
            variables = {"params": bake_static_scales(
                variables["params"], jax.device_get(agg))}
            print(f"[INFO] int8 static scales calibrated on "
                  f"{args.calib_batches} batches")
        else:
            print("[INFO] evaluating dynamic-int8 serving path")

    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    det = DetectionMetrics(cfg.model.num_classes)
    cmap = COCOmAP(cfg.model.num_classes) if args.coco_map else None
    key = jax.random.key(0)
    t0 = time.time()
    n_images = 0
    for host_batch in loader:
        batch = make_device_batch(host_batch, key, train=False)
        preds, anchors, strides = forward(variables, batch["images"])
        decoded = decode_predictions(
            preds, anchors, strides, conf_threshold=args.conf_threshold,
            use_nms=args.use_nms)
        pred_lists = decoded_to_lists(decoded)
        gt_boxes = np.asarray(batch["gt_boxes"])
        gt_labels = np.asarray(batch["gt_labels"])
        gt_mask = np.asarray(batch["gt_mask"])
        scores = np.asarray(decoded.scores)
        valid = np.asarray(decoded.valid)
        scale = np.asarray(host_batch["scale"])    # (N, 2) sx, sy
        offset = np.asarray(host_batch["offset"])  # (N, 2) dx, dy
        pad = np.asarray(host_batch.get(
            "sample_pad", np.zeros(gt_boxes.shape[0], bool)))

        def to_original(arr5, i):
            """center-xywh+cls in model space → original-image pixels:
            orig = (model - offset) / scale (official COCO protocol —
            area ranges depend on true pixel sizes)."""
            out = arr5.copy()
            out[:, 0] = (arr5[:, 0] - offset[i, 0]) / scale[i, 0]
            out[:, 1] = (arr5[:, 1] - offset[i, 1]) / scale[i, 1]
            out[:, 2] = arr5[:, 2] / scale[i, 0]
            out[:, 3] = arr5[:, 3] / scale[i, 1]
            return out

        for i, plist in enumerate(pred_lists):
            if pad[i]:
                continue  # repeated sample padding a sharded batch
            if args.ref_box_convention and len(plist):
                # predicted "center" is really the top-left corner — the
                # true center sits half an extent down-right of it
                plist = plist.copy()
                plist[:, 0] += plist[:, 2] / 2
                plist[:, 1] += plist[:, 3] / 2
            m = gt_mask[i]
            targets = np.concatenate(
                [gt_boxes[i][m], gt_labels[i][m, None].astype(np.float32)],
                axis=1)
            det.update(plist, targets)
            if cmap is not None:
                if args.model_coords:
                    cmap.update(plist, scores[i][valid[i]], targets)
                else:
                    cmap.update(to_original(plist, i), scores[i][valid[i]],
                                to_original(targets, i))
        n_images += int((~pad).sum())
    dt = time.time() - t0

    results = det.compute()
    print(f"[INFO] {n_images} images in {dt:.1f}s "
          f"({n_images / max(dt, 1e-9):.1f} img/s)")
    for k, v in results.items():
        print(f"  {k}: {v}")
    if cmap is not None:
        for k, v in cmap.compute().items():
            print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
