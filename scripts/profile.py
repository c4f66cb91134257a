#!/usr/bin/env python
"""Capture a jax.profiler trace of the training step (makes the reference's
dead ``project.profile_dir`` key real — SURVEY §5). View the output in
TensorBoard or Perfetto."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--preset", default=None,
                   help="model preset override (n/s/m/l/x)")
    p.add_argument("--assigner", default=None, choices=["nearest", "tal"],
                   help="loss assigner override (default: config)")
    p.add_argument("--max_gt", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from custom_yolo_tpu.config import Config
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.train.losses import DetectionLoss, LossConfig
    from custom_yolo_tpu.train.optim import build_optimizer
    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.train.train_step import make_train_step
    from custom_yolo_tpu.utils.profiling import trace

    cfg = Config.from_yaml(args.config)
    if args.preset:
        preset = PRESETS[args.preset]
        cfg.model.width = preset["width"]
        cfg.model.depth = preset["depth"]
        cfg.model.csp = preset["csp"]

    policy = resolve_policy(cfg.training.sharding.precision)
    model = YoloModel(width=tuple(cfg.model.width),
                      depth=tuple(cfg.model.depth),
                      csp=tuple(cfg.model.csp),
                      num_classes=cfg.model.num_classes, policy=policy)
    x = jnp.zeros((args.batch_size, *cfg.model.input_size, 3),
                  policy.compute_dtype)
    variables = model.init(jax.random.key(0), x, train=False)

    tx = build_optimizer(cfg.training)
    state = TrainState.create(variables, tx, jax.random.key(1))
    loss_cfg = LossConfig(num_classes=cfg.model.num_classes,
                          assigner=args.assigner or "nearest")
    loss_fn = DetectionLoss(loss_cfg)
    step = make_train_step(model, loss_fn, tx, donate=False)

    rng = np.random.RandomState(0)
    g = args.max_gt or cfg.data.max_gt_boxes
    batch = {
        "images": jnp.asarray(rng.rand(args.batch_size,
                                       *cfg.model.input_size, 3)
                              .astype(np.float32)),
        "gt_boxes": jnp.asarray(
            (rng.rand(args.batch_size, g, 4) * 300 + 50).astype(np.float32)),
        "gt_labels": jnp.asarray(rng.randint(
            0, cfg.model.num_classes, (args.batch_size, g)).astype(np.int32)),
        "gt_mask": jnp.asarray(rng.rand(args.batch_size, g) > 0.7),
    }

    # warmup/compile outside the trace
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])

    profile_dir = cfg.project.profile_dir
    os.makedirs(profile_dir, exist_ok=True)
    print(f"[INFO] tracing {args.steps} steps into {profile_dir}")
    with trace(profile_dir):
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        jax.block_until_ready(metrics["total_loss"])
    print(f"[INFO] done; loss={float(metrics['total_loss']):.4f}. "
          f"View with: tensorboard --logdir {profile_dir}")


if __name__ == "__main__":
    main()
