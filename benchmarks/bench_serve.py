#!/usr/bin/env python
"""End-to-end serving throughput: forward + DFL decode + class argmax +
batched (Pallas) NMS as one XLA program — the full production inference
path, not just the conv trunk.

Same scan methodology as bench.py (relay-safe)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--preset", default="x")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--top_k", type=int, default=1024,
                   help="NMS candidate-pool size (lane-aligned multiples "
                        "of 128 pick the Pallas kernel; 512 halves the "
                        "suppression sweep for light presets)")
    p.add_argument("--merge", action="store_true", help="merge-NMS")
    p.add_argument("--s2d", action="store_true",
                   help="space-to-depth stem (exact transform)")
    p.add_argument("--quant", action="store_true",
                   help="int8 serving path, dynamic act scales (ops.quant)")
    p.add_argument("--static_quant", action="store_true",
                   help="int8 serving with calibrated static act scales "
                        "(quantize→calibrate; the throughput-viable mode)")
    p.add_argument("--quant_skip", default="auto",
                   help="'auto' (measured bf16-kept stages), 'none', or a "
                        "comma list of backbone stage names")
    p.add_argument("--c3k_merge", action="store_true",
                   help="horizontal C3K conv1/conv2 merge (exact)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models import YoloModel, fuse_params
    from custom_yolo_tpu.models.detector import decode_raw_predictions
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.ops.nms import batched_nms

    preset = PRESETS[args.preset]
    policy = resolve_policy("bfloat16")
    raw = YoloModel(width=tuple(preset["width"]),
                    depth=tuple(preset["depth"]),
                    csp=tuple(preset["csp"]), num_classes=172,
                    policy=policy)
    model = raw.clone(fused=True)
    variables = fuse_params(raw.init(
        jax.random.key(0), jnp.zeros((1, 640, 640, 3),
                                     policy.compute_dtype), train=False))
    if args.s2d:
        from custom_yolo_tpu.models.detector import convert_stem_variables
        model = model.clone(s2d_stem=True)
        variables = convert_stem_variables(variables)
    if args.c3k_merge:
        from custom_yolo_tpu.models.detector import merge_c3k_params
        model = model.clone(merged=True)
        variables = {"params": merge_c3k_params(variables["params"])}
    if args.quant or args.static_quant:
        from custom_yolo_tpu.ops.quant import (DEFAULT_QUANT_SKIP,
                                               quantize_fused_params)
        qskip = (() if args.quant_skip == "none"
                 else DEFAULT_QUANT_SKIP if args.quant_skip == "auto"
                 else tuple(args.quant_skip.split(",")))
        model = model.clone(quantized=True, quant_skip=qskip)
        variables = {"params": quantize_fused_params(variables["params"],
                                                     skip=qskip)}
    if args.static_quant:
        # calibrate static activation scales on one random batch (a
        # throughput bench is value-independent; real deployments use
        # Detector.calibrate over representative data)
        from custom_yolo_tpu.ops.quant import bake_static_scales
        cal = jnp.asarray(np.random.RandomState(1).rand(
            8, 640, 640, 3), policy.compute_dtype)
        _, stats = jax.jit(lambda v, x: model.apply(
            v, x, train=False, mutable=["quant_stats"]))(variables, cal)
        variables = {"params": bake_static_scales(
            variables["params"], jax.device_get(stats["quant_stats"]))}

    b, iters = args.batch_size, args.iters

    def serve_once(v, x):
        preds, anchors, strides = model.apply(v, x, train=False)
        boxes, scores = decode_raw_predictions(preds, anchors, strides, 16)
        best_scores = jnp.max(scores, axis=-1)
        best_classes = jnp.argmax(scores, axis=-1)
        return batched_nms(boxes, best_scores, best_classes,
                           conf_thres=args.conf, max_det=300,
                           top_k=args.top_k, merge=args.merge)

    def bench_fn(v, x):
        def body(acc, i):
            xi = x + (i.astype(x.dtype) * 1e-6)
            r = serve_once(v, xi)
            return acc + jnp.sum(r.num_valid.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    f = jax.jit(bench_fn)
    x = jnp.asarray(np.random.RandomState(0).rand(b, 640, 640, 3),
                    policy.compute_dtype)
    float(f(variables, x))  # compile + warmup
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(variables, x))
        dt = min(dt, (time.perf_counter() - t0) / iters)

    dtype_tag = ("int8static" if args.static_quant
                 else "int8dyn" if args.quant else "bf16")
    print(json.dumps({
        "metric": f"serve_throughput_640_{dtype_tag}_{args.preset}",
        "value": round(b / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_batch": round(dt * 1000, 2),
        "includes": "forward+decode+nms",
    }))


if __name__ == "__main__":
    main()
