#!/usr/bin/env python
"""Microbenchmark: is the v5e int8 MXU path reachable from JAX/XLA?

Times three equivalent contractions (M×K @ K×N) with the scan methodology
(see bench.py): bf16 dot, int8 dot (preferred int32), and the same int8
contraction expressed as a 1×1 conv. v5e MXU is 394 int8 TOPS vs 197 bf16
TFLOPs — if int8-dot beats bf16-dot ~2× but int8-conv does not, the
quantized serving path should route 1×1 convs through reshape+dot.

Usage: python benchmarks/bench_int8.py [--m 65536] [--k 384] [--n 384]
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


def timed(fn, args_, iters):
    # fold the loop index into the FIRST operand via a one-element dynamic
    # update — unhoistable for every dtype (x + i*0 folds away and lets XLA
    # lift the contraction out of the scan, which under-reports 10×)
    def body(acc, i, a):
        first = a[0].reshape(-1).at[0].set(
            (i % 2).astype(a[0].dtype)).reshape(a[0].shape)
        out = fn(first, *a[1:])
        return acc + jnp.sum(out.astype(jnp.float32)), None

    f = jax.jit(lambda *a: jax.lax.scan(
        lambda acc, i: body(acc, i, a), 0.0, jnp.arange(iters))[0])
    float(f(*args_))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args_))
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=65536)
    p.add_argument("--k", type=int, default=384)
    p.add_argument("--n", type=int, default=384)
    p.add_argument("--iters", type=int, default=32)
    args = p.parse_args()
    m, k, n = args.m, args.k, args.n
    macs = m * k * n
    rng = np.random.RandomState(0)

    a16 = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b16 = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)

    dt = timed(lambda a, b: jnp.dot(a, b), (a16, b16), args.iters)
    print(json.dumps({"op": "dot_bf16", "ms": round(dt * 1e3, 3),
                      "tops": round(2 * macs / dt / 1e12, 1)}), flush=True)

    dt = timed(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), (a8, b8), args.iters)
    print(json.dumps({"op": "dot_int8_s32", "ms": round(dt * 1e3, 3),
                      "tops": round(2 * macs / dt / 1e12, 1)}), flush=True)

    # the same contraction as a 1×1 conv (what ops/quant.int8_conv emits)
    h = 256
    w = m // 256
    a8c = a8.reshape(1, h, w, k)
    b8c = b8.reshape(1, 1, k, n)
    dt = timed(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32), (a8c, b8c), args.iters)
    print(json.dumps({"op": "conv1x1_int8_s32", "ms": round(dt * 1e3, 3),
                      "tops": round(2 * macs / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
