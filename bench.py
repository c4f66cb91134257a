"""Benchmark harness: 640×640 bf16 inference throughput of the flagship
model (the reference's active config — 'x' preset, 172 classes, ~57M
params, 200.8 GFLOPs/img), single chip.

Methodology: ITERS forwards inside ONE jitted ``lax.scan`` with the
iteration index folded into the input (prevents hoisting/dedup), timed by a
scalar host fetch. This measures on-device execution only — host dispatch
through tunneled/relayed device transports would otherwise dominate or,
worse, under-report (async dispatch returning before execution).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json north-star target of
2000 images/sec/chip (the reference publishes no numbers — BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat runs skip the multi-minute first compile
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE",
                                 "/tmp/custom_yolo_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NORTH_STAR_IMG_S = 2000.0
# B=128 is the measured throughput sweet spot on v5e (B=64: 523 img/s,
# B=128: 603, B=256: 615 — docs/PERF.md); 128 keeps compile+memory sane.
BATCH = 128
ITERS = 8


def main():
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models import YoloModel, fuse_params
    from custom_yolo_tpu.models.presets import PRESETS

    preset = PRESETS["x"]
    policy = resolve_policy("bfloat16")
    model = YoloModel(width=tuple(preset["width"]),
                      depth=tuple(preset["depth"]),
                      csp=tuple(preset["csp"]), num_classes=172,
                      policy=policy)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 640, 640, 3), policy.compute_dtype), train=False)
    # inference path: conv+BN folded
    infer_model = model.clone(fused=True)
    infer_vars = fuse_params(variables)

    def bench_fn(v, x):
        def body(acc, i):
            xi = x + (i.astype(x.dtype) * 1e-6)
            preds, _, _ = infer_model.apply(v, xi, train=False)
            return acc + jnp.sum(preds.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return acc

    f = jax.jit(bench_fn)
    x0 = jnp.asarray(np.random.RandomState(0).rand(BATCH, 640, 640, 3),
                     policy.compute_dtype)
    float(f(infer_vars, x0))  # compile + warmup

    x1 = jnp.asarray(np.random.RandomState(1).rand(BATCH, 640, 640, 3),
                     policy.compute_dtype)
    dt = float("inf")  # best-of-3: tunneled transports add stragglers
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(infer_vars, x1))  # scalar fetch == true completion
        dt = min(dt, (time.perf_counter() - t0) / ITERS)

    img_s = BATCH / dt
    print(json.dumps({
        "metric": "inference_throughput_640_bf16_x",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / NORTH_STAR_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
