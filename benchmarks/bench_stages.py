#!/usr/bin/env python
"""Per-stage device timing of the flagship fused-inference forward.

Times each backbone stage / neck / head as its own jitted ``lax.scan``
(same methodology as bench.py — N iterations inside one program, scalar
fetch), so relay dispatch overheads cancel. Used to target Pallas fusion
work (CLAUDE.md round-2 candidate #3 / VERDICT #1).

NOTE: params and inputs must be jit ARGUMENTS, not captured constants —
the axon remote-compile relay rejects requests whose serialized constants
exceed its body limit (HTTP 413).

Usage: python benchmarks/bench_stages.py [--batch 64] [--iters 8] [--preset x]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE",
                                 "/tmp/custom_yolo_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_scan(fn, params, x, iters):
    """seconds/iter for fn(params, x) run ``iters`` times in one scan.
    The loop index is folded into x to prevent hoisting/dedup."""

    def f(v, xx):
        def body(acc, i):
            xi = jax.tree.map(lambda t: t + (i.astype(t.dtype) * 1e-6), xx)
            out = fn(v, xi)
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out)]
            return acc + sum(leaves), None
        return jax.lax.scan(body, 0.0, jnp.arange(iters))[0]

    f = jax.jit(f)
    float(f(params, x))  # compile + warmup
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(params, x))
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--preset", default="x")
    ap.add_argument("--train", action="store_true",
                    help="unfused train-mode forward instead of fused")
    ap.add_argument("--stages", action="store_true",
                    help="also time every backbone stage individually")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem (exact transform)")
    ap.add_argument("--quant", action="store_true",
                    help="int8 serving path (dynamic act scales)")
    ap.add_argument("--static_quant", action="store_true",
                    help="int8 with calibrated static act scales")
    ap.add_argument("--merge", action="store_true",
                    help="horizontal C3K conv1/conv2 merge (exact)")
    args = ap.parse_args()

    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models import YoloModel, fuse_params
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.models.backbone import Backbone
    from custom_yolo_tpu.models.neck import Neck
    from custom_yolo_tpu.models.head import Head

    p = PRESETS[args.preset]
    policy = resolve_policy("bfloat16")
    kw = dict(width=tuple(p["width"]), depth=tuple(p["depth"]),
              csp=tuple(p["csp"]))
    model = YoloModel(num_classes=172, policy=policy, **kw)
    B = args.batch
    x = jnp.zeros((1, 640, 640, 3), policy.compute_dtype)
    variables = model.init(jax.random.key(0), x, train=False)
    fused = not args.train
    if fused:
        variables = fuse_params(variables)
    model = model.clone(fused=fused)
    if args.s2d:
        from custom_yolo_tpu.models.detector import convert_stem_variables
        model = model.clone(s2d_stem=True)
        variables = convert_stem_variables(variables)
    if args.merge:
        from custom_yolo_tpu.models.detector import merge_c3k_params
        assert fused, "--merge requires the fused path"
        model = model.clone(merged=True)
        variables = {"params": merge_c3k_params(variables["params"])}
    if args.quant or args.static_quant:
        from custom_yolo_tpu.ops.quant import quantize_fused_params
        assert fused, "--quant requires the fused path"
        args.quant = True
        model = model.clone(quantized=True)
        variables = {"params": quantize_fused_params(variables["params"])}
    if args.static_quant:
        from custom_yolo_tpu.ops.quant import bake_static_scales
        cal = jnp.asarray(np.random.RandomState(1).rand(4, 640, 640, 3),
                          policy.compute_dtype)
        _, stats = jax.jit(lambda v, xx: model.apply(
            v, xx, train=False, mutable=["quant_stats"]))(variables, cal)
        variables = {"params": bake_static_scales(
            variables["params"], jax.device_get(stats["quant_stats"]))}

    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.rand(B, 640, 640, 3), policy.compute_dtype)

    def fwd(v, xi):
        preds, _, _ = model.apply(v, xi, train=False)
        return preds

    total = timed_scan(fwd, variables, xb, args.iters)
    print(json.dumps({"stage": "total_forward", "ms": round(total * 1e3, 2),
                      "img_s": round(B / total, 1)}), flush=True)

    bb = Backbone(policy=policy, fused=fused, s2d_stem=args.s2d,
                  quantized=args.quant, merged=args.merge, **kw)
    bpar = {"params": variables["params"]["net"]}
    if not fused:
        bpar["batch_stats"] = variables["batch_stats"]["net"]

    feats = jax.jit(lambda v, xi: bb.apply(v, xi, train=False))(bpar, xb)
    p3, p4, p5 = feats

    t_bb = timed_scan(lambda v, xi: bb.apply(v, xi, train=False), bpar, xb,
                      args.iters)
    print(json.dumps({"stage": "backbone", "ms": round(t_bb * 1e3, 2)}),
          flush=True)

    neck = Neck(width=tuple(p["width"]), depth=tuple(p["depth"]),
                csp=tuple(p["csp"]), policy=policy, fused=fused,
                quantized=args.quant, merged=args.merge)
    npar = {"params": variables["params"]["fpn"]}
    if not fused:
        npar["batch_stats"] = variables["batch_stats"]["fpn"]
    t_neck = timed_scan(lambda v, f: neck.apply(v, f, train=False), npar,
                        (p3, p4, p5), args.iters)
    print(json.dumps({"stage": "neck", "ms": round(t_neck * 1e3, 2)}),
          flush=True)

    n3, n4, n5 = jax.jit(lambda v, f: neck.apply(v, f, train=False))(
        npar, (p3, p4, p5))
    w = p["width"]
    head = Head(num_classes=172, filters=(w[3], w[4], w[5]), policy=policy,
                fused=fused, quantized=args.quant)
    hpar = {"params": variables["params"]["head"]}
    if not fused:
        hpar["batch_stats"] = variables["batch_stats"]["head"]
    t_head = timed_scan(lambda v, f: head.apply(v, f, train=False), hpar,
                        (n3, n4, n5), args.iters)
    print(json.dumps({"stage": "head", "ms": round(t_head * 1e3, 2)}),
          flush=True)

    if not args.stages:
        return

    from custom_yolo_tpu.nn.blocks import PSA, SPPF, C3K2, ConvBN

    w, d, c = p["width"], p["depth"], p["csp"]
    bp = variables["params"]["net"]

    def sub(mod, pname, xi):
        par = {"params": bp[pname]}
        if not fused:
            par["batch_stats"] = variables["batch_stats"]["net"][pname]
        t = timed_scan(lambda v, a: mod.apply(v, a, train=False), par, xi,
                       args.iters)
        out = jax.jit(lambda v, a: mod.apply(v, a, train=False))(par, xi)
        print(json.dumps({"stage": pname, "ms": round(t * 1e3, 2),
                          "in": list(xi.shape), "out": list(out.shape)}),
              flush=True)
        return out

    bkw = dict(policy=policy, fused=fused, quantized=args.quant)
    ckw2 = dict(bkw, merged=args.merge)
    cur = xb
    if args.s2d:
        from custom_yolo_tpu.models.backbone import space_to_depth
        cur = space_to_depth(cur, 2)
        cur = sub(ConvBN(w[1], kernel_size=2, strides=1,
                         padding=((1, 0), (1, 0)), **bkw), "p1_conv", cur)
    else:
        cur = sub(ConvBN(w[1], kernel_size=3, strides=2, padding=1, **bkw),
                  "p1_conv", cur)
    cur = sub(ConvBN(w[2], kernel_size=3, strides=2, padding=1, **bkw),
              "p2_conv", cur)
    cur = sub(C3K2(w[3], d[0], c[0], r=4, **ckw2), "p2_csp", cur)
    cur = sub(ConvBN(w[3], kernel_size=3, strides=2, padding=1, **bkw),
              "p3_conv", cur)
    cur = sub(C3K2(w[4], d[1], c[0], r=4, **ckw2), "p3_csp", cur)
    cur = sub(ConvBN(w[4], kernel_size=3, strides=2, padding=1, **bkw),
              "p4_conv", cur)
    cur = sub(C3K2(w[4], d[2], c[1], r=2, **ckw2), "p4_csp", cur)
    cur = sub(ConvBN(w[5], kernel_size=3, strides=2, padding=1, **bkw),
              "p5_conv", cur)
    cur = sub(C3K2(w[5], d[3], c[1], r=2, **ckw2), "p5_csp", cur)
    cur = sub(SPPF(w[5], **bkw), "p5_sppf", cur)
    cur = sub(PSA(d[4], **bkw), "p5_psa", cur)


if __name__ == "__main__":
    main()
