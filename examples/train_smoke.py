#!/usr/bin/env python
"""Tiny-fixture training smoke run — script equivalent of the reference's
``notebooks/03_training_experiements.ipynb`` (1 epoch on the 20-image
``is_test`` subset, batch 4; SURVEY §6 records that run's numbers).

Runs entirely from the config; use --synthetic when no COCO data is on
disk (random images + boxes, still exercising the full jitted step)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--preset", default="n")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--input_size", type=int, default=640)
    args = p.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_TEST_CACHE", "/tmp/custom_yolo_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    cfg = Config.from_yaml(args.config)
    preset = PRESETS[args.preset]
    policy = resolve_policy(cfg.training.sharding.precision)
    model = YoloModel(width=tuple(preset["width"]),
                      depth=tuple(preset["depth"]),
                      csp=tuple(preset["csp"]),
                      num_classes=cfg.model.num_classes, policy=policy)
    size = (args.input_size, args.input_size)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, *size, 3), policy.compute_dtype),
                           train=False)
    tx = build_optimizer(cfg.training)
    state = TrainState.create(variables, tx, jax.random.key(1))
    loss_fn = DetectionLoss(LossConfig(num_classes=cfg.model.num_classes,
                                       assigner=cfg.training.assigner))
    step = make_train_step(model, loss_fn, tx, donate=False)

    if args.synthetic:
        rng = np.random.RandomState(0)
        b, g = args.batch_size, 16
        batch = {
            "images": jnp.asarray(rng.rand(b, *size, 3).astype(np.float32)),
            "gt_boxes": jnp.asarray(
                (rng.rand(b, g, 4) * size[0] / 2 + 20).astype(np.float32)),
            "gt_labels": jnp.asarray(rng.randint(
                0, cfg.model.num_classes, (b, g)).astype(np.int32)),
            "gt_mask": jnp.asarray(rng.rand(b, g) > 0.5),
        }
        batches = lambda: (batch for _ in range(args.steps))
    else:
        from custom_yolo_tpu.data.dataset import DetectionDataset
        from custom_yolo_tpu.data.loader import DataLoader
        from custom_yolo_tpu.data.transforms import make_device_batch
        ds = DetectionDataset(
            os.path.join(cfg.data.processed_dir, cfg.data.train_parquet),
            cfg.data.train_images, input_size=size, is_test=True,
            max_gt=cfg.data.max_gt_boxes)
        loader = DataLoader(ds, args.batch_size, shuffle=True,
                            drop_last=True, num_workers=4)

        def batches():
            key = jax.random.key(0)
            for i, hb in enumerate(loader):
                yield make_device_batch(hb, jax.random.fold_in(key, i))

    t0 = time.time()
    n = 0
    for i, batch in enumerate(batches()):
        state, metrics = step(state, batch)
        n += 1
        if i % 5 == 0:
            m = jax.device_get(metrics)
            print(f"step {i}: total={float(m['total_loss']):.3f} "
                  f"box={float(m['box_loss']):.3f} "
                  f"cls={float(m['cls_loss']):.3f}")
        if n >= args.steps:
            break
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    print(f"{n} steps, {n / dt:.2f} it/s, "
          f"{n * args.batch_size / dt:.1f} img/s")


if __name__ == "__main__":
    main()
