"""Profiling — makes the reference's dead ``project.profile_dir`` key real
(SURVEY §5: declared at config.yaml:15, never consumed). Wraps
``jax.profiler`` trace capture (viewable in TensorBoard/Perfetto) and a
block-until-ready timing harness."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed block (no-op when
    profile_dir is falsy)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Wall-clock a jitted function with proper device synchronization."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {"total_s": dt, "mean_s": dt / iters, "iters": iters}
