"""Benchmark harness: 640×640 bf16 inference throughput on the flagship
model, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline for vs_baseline: the BASELINE.json north-star target of
2000 images/sec/chip (the reference publishes no numbers — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_IMG_S = 2000.0


def main():
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.models.presets import PRESETS

    preset = PRESETS["x"]
    policy = resolve_policy("bfloat16")
    model = YoloModel(width=tuple(preset["width"]),
                      depth=tuple(preset["depth"]),
                      csp=tuple(preset["csp"]), num_classes=172,
                      policy=policy)

    batch = 32
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 640, 640, 3),
                    policy.compute_dtype)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 640, 640, 3),
                                     policy.compute_dtype), train=False)

    @jax.jit
    def forward(v, x):
        preds, _, _ = model.apply(v, x, train=False)
        return preds

    # warmup / compile
    jax.block_until_ready(forward(variables, x))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(json.dumps({
        "metric": "inference_throughput_640_bf16",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / NORTH_STAR_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
