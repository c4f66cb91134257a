#!/usr/bin/env python
"""Micro-benchmarks of the individual conv shapes inside the flagship's hot
stages — tells us where XLA sits vs the MXU lane-efficiency floor, to target
Pallas fusion (VERDICT #1).

Usage: python benchmarks/bench_micro.py [--batch 64]
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

PEAK_TFLOPS = 197.0  # v5e bf16


def timed(fn, args, iters=8):
    def f(*a):
        def body(acc, i):
            a2 = list(a)
            a2[-1] = a2[-1] + i.astype(a2[-1].dtype) * 1e-6
            out = fn(*a2)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        return jax.lax.scan(body, 0.0, jnp.arange(iters))[0]

    f = jax.jit(f)
    float(f(*args))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return dt


def conv_case(name, b, hw, cin, cout, k, groups=1, act=True, stride=1):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, hw, hw, cin), jnp.bfloat16)
    w = jnp.asarray(rng.rand(k, k, cin // groups, cout) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.rand(cout), jnp.bfloat16)

    def fn(wb, bb, xx):
        y = jax.lax.conv_general_dilated(
            xx, wb, (stride, stride), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
        y = y + bb
        return jax.nn.silu(y) if act else y

    dt = timed(fn, (w, bias, x))
    out_hw = hw // stride
    flops = 2 * b * out_hw * out_hw * cout * (k * k * cin // groups)
    eff = flops / dt / 1e12 / PEAK_TFLOPS
    print(json.dumps({"case": name, "ms": round(dt * 1e3, 3),
                      "gflops": round(flops / 1e9, 1),
                      "mxu_eff": round(eff, 3)}), flush=True)
    return dt


def chain_case(name, b, hw, c, n_convs):
    """n sequential 3x3 same convs c->c with bias+silu (the C3K residual
    chain shape)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, hw, hw, c), jnp.bfloat16)
    ws = [jnp.asarray(rng.rand(3, 3, c, c) * 0.1, jnp.bfloat16)
          for _ in range(n_convs)]
    bs = [jnp.asarray(rng.rand(c), jnp.bfloat16) for _ in range(n_convs)]

    def fn(ws, bs, xx):
        y = xx
        for w, bb in zip(ws, bs):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.silu(y + bb)
        return y

    dt = timed(fn, (ws, bs, x))
    flops = 2 * b * hw * hw * c * 9 * c * n_convs
    eff = flops / dt / 1e12 / PEAK_TFLOPS
    print(json.dumps({"case": name, "ms": round(dt * 1e3, 3),
                      "gflops": round(flops / 1e9, 1),
                      "mxu_eff": round(eff, 3)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    b = args.batch

    # p2_csp inner shapes (x preset: hidden 96, inner 48 @160²)
    conv_case("3x3_48_48_160", b, 160, 48, 48, 3)
    chain_case("chain4_3x3_48_160", b, 160, 48, 4)
    conv_case("1x1_96_48_160", b, 160, 96, 48, 1)
    conv_case("1x1_192_192_160", b, 160, 192, 192, 1)
    conv_case("1x1_384_384_160", b, 160, 384, 384, 1)
    # p3_csp inner (inner 96 @80²)
    conv_case("3x3_96_96_80", b, 80, 96, 96, 3)
    chain_case("chain4_3x3_96_80", b, 80, 96, 4)
    conv_case("1x1_768_768_80", b, 80, 768, 768, 1)
    # lane-aligned comparisons
    conv_case("3x3_128_128_160", b, 160, 128, 128, 3)
    conv_case("3x3_256_256_80", b, 80, 256, 256, 3)
    # downsample convs
    conv_case("3x3s2_96_192_320", b, 320, 96, 192, 3, stride=2)
    conv_case("3x3s2_384_384_160", b, 160, 384, 384, 3, stride=2)
    # head depthwise
    conv_case("dw3x3_384_80", b, 80, 384, 384, 3, groups=384)


if __name__ == "__main__":
    main()
