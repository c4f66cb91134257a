#!/usr/bin/env python
"""Checkpoint → inference → visualization demo — script equivalent of the
reference's ``notebooks/04_evaluation_and_plots.ipynb`` (checkpoint load +
``Model.inference`` + visual compare)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True, help="image path")
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--save", default=None, help="output figure path")
    p.add_argument("--fuse", action="store_true",
                   help="fold conv+BN before inference")
    args = p.parse_args()

    import jax
    import numpy as np

    from custom_yolo_tpu.config import Config
    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.train.optim import build_optimizer
    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager

    cfg = Config.from_yaml(args.config)
    det = Detector(cfg.model.width, cfg.model.depth, cfg.model.csp,
                   num_classes=cfg.model.num_classes,
                   reg_max=cfg.model.reg_max,
                   precision=cfg.training.sharding.precision,
                   input_size=tuple(cfg.model.input_size))
    det.init(seed=cfg.project.seed)

    ckpt_dir = args.checkpoint or cfg.checkpoint.checkpoint_dir
    ckpt = CheckpointManager(ckpt_dir)
    if ckpt.latest_epoch() is not None:
        tx = build_optimizer(cfg.training)
        template = jax.device_get(TrainState.create(
            det.variables, tx, jax.random.key(0),
            ema=cfg.training.ema_decay > 0))
        state = ckpt.restore(template)
        # EMA weights (when tracked) are the deployed ones
        det.load_variables(state.eval_variables)
        print(f"[INFO] restored epoch {int(state.epoch)}")
    else:
        print("[WARN] no checkpoint; using random init")

    if args.fuse:
        det.fuse()

    detections = det.inference(args.image, conf_thres=args.conf,
                               iou_thres=args.iou)[0]
    print(f"{len(detections)} detections:")
    for x1, y1, x2, y2, conf, cls in detections[:25]:
        print(f"  cls={int(cls):3d} conf={conf:.3f} "
              f"box=({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")

    if args.save:
        from PIL import Image

        from custom_yolo_tpu.utils.visualization import draw_bboxes
        img = np.asarray(Image.open(args.image).convert("RGB").resize(
            (det.input_size[1], det.input_size[0])))
        boxes_xywh = np.stack([
            (detections[:, 0] + detections[:, 2]) / 2,
            (detections[:, 1] + detections[:, 3]) / 2,
            detections[:, 2] - detections[:, 0],
            detections[:, 3] - detections[:, 1]], axis=1) \
            if len(detections) else np.zeros((0, 4))
        ax = draw_bboxes(img, boxes_xywh, detections[:, 5],
                         detections[:, 4], color="red")
        ax.figure.savefig(args.save, dpi=120, bbox_inches="tight")
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
