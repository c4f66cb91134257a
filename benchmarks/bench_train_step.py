#!/usr/bin/env python
"""BASELINE config #3: single-chip bf16 training-step throughput
(assigner + loss + backward + AdamW as one XLA program).

Methodology matches bench.py: N steps inside one jitted lax.scan, timed by
a scalar fetch, so relayed/async dispatch cannot distort the number.
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
    p.add_argument("--preset", default="x")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--assigner", default="nearest",
                   choices=["nearest", "tal"])
    p.add_argument("--input_size", type=int, default=640)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.train.losses import DetectionLoss, LossConfig

    preset = PRESETS[args.preset]
    policy = resolve_policy("bfloat16")
    model = YoloModel(width=tuple(preset["width"]),
                      depth=tuple(preset["depth"]),
                      csp=tuple(preset["csp"]), num_classes=172,
                      policy=policy)
    size = (args.input_size, args.input_size)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, *size, 3), policy.compute_dtype),
                           train=False)
    loss_fn = DetectionLoss(LossConfig(num_classes=172,
                                       assigner=args.assigner))
    tx = optax.adamw(1e-4, weight_decay=1e-4)
    opt_state = tx.init(variables["params"])

    b, g = args.batch_size, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, *size, 3).astype(np.float32))
    gt_boxes = jnp.asarray((rng.rand(b, g, 4) * 300 + 50).astype(np.float32))
    gt_labels = jnp.asarray(rng.randint(0, 172, (b, g)).astype(np.int32))
    gt_mask = jnp.asarray(rng.rand(b, g) > 0.5)

    iters = args.iters

    def loss_of(params, batch_stats, images):
        (preds, anchors, strides), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        loss, _ = loss_fn(preds, anchors, strides, gt_boxes, gt_labels,
                          gt_mask)
        return loss, mut["batch_stats"]

    def bench_fn(params, batch_stats, opt_state, images):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            xi = images + (i.astype(images.dtype) * 1e-6)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params, batch_stats, xi)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), loss
        carry, losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(iters))
        return losses[-1]

    f = jax.jit(bench_fn)
    stats = variables.get("batch_stats", {})
    float(f(variables["params"], stats, opt_state, images))  # compile
    t0 = time.perf_counter()
    float(f(variables["params"], stats, opt_state, images))
    dt = (time.perf_counter() - t0) / iters

    img_s = b / dt
    print(json.dumps({
        "metric": f"train_step_throughput_{args.input_size}_bf16_"
                  f"{args.preset}_{args.assigner}",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1000, 2),
    }))


if __name__ == "__main__":
    main()
