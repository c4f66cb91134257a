"""Multi-process (multi-host) array plumbing.

The reference's multi-node story is torchrun + ``DistributedSampler``: each
rank loads its own rows and ``DDP``/``FSDP`` sync gradients
(``src/data/data_loader.py:17-24``, ``src/training/distributed_setup.py:6-26``).
Here the same roles map onto jax.distributed + GSPMD: each process's loader
yields its shard (``data/loader.py`` ``process_index/process_count``), this
module assembles the per-process shards into ONE global jax.Array over the
mesh, and the jitted step computes on it — gradient sync is whatever
collectives the partitioner inserts, not an explicit allreduce.

Two directions:

* host→device: :func:`globalize_batch` — per-process local rows → global
  batch-sharded array (``jax.make_array_from_process_local_data``). A plain
  ``device_put`` would mis-treat each process's local rows as the full
  global value.
* device→host: :func:`local_rows` / :func:`fetch_local` — a global array
  cannot be ``device_get`` when this process does not own every shard;
  validation needs exactly this process's batch rows back (they line up
  with the process-local ``host_batch`` GT rows), and metric scalars are
  replicated so shard 0 carries the value.

Everything degrades to the trivial path at ``jax.process_count() == 1`` so
single-process callers pay nothing.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def globalize_batch(batch: Dict[str, Any], sharding) -> Dict[str, Any]:
    """Per-process local batch (leading dim = local rows) → global arrays
    sharded by ``sharding`` (global leading dim = local × process_count).

    Accepts device or host arrays; device leaves are fetched to host first
    (``make_array_from_process_local_data`` consumes host buffers)."""

    def one(x):
        x = np.asarray(jax.device_get(x))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, batch)


def put_global(x, sharding):
    """Place one host (or single-device) value onto a sharding that may span
    processes. ``device_put`` refuses non-addressable shardings; the
    multi-process path materializes each local shard from the full host
    value via ``make_array_from_callback`` — valid because every process
    passes the SAME global value (seed-identical init / restored state)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                     jax.dtypes.extended):
        # typed PRNG keys: place the raw key data, re-wrap
        data = put_global(jax.random.key_data(x), sharding)
        return jax.random.wrap_key_data(data,
                                        impl=jax.random.key_impl(x))
    host = np.asarray(jax.device_get(x))
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def local_rows(x) -> np.ndarray:
    """This process's batch rows of a (possibly) cross-process array, in
    global index order.

    Replicated arrays (every shard covers the full array — metric scalars,
    anchors/strides) return the single local copy. Batch-sharded arrays
    return the concatenation of this process's shards sorted by their
    global batch offset — which matches the row order of this process's
    host batch (``make_array_from_process_local_data`` preserves it)."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    by_offset = {}
    for s in x.addressable_shards:
        idx = s.index[0] if s.index else slice(None)
        start = idx.start or 0 if isinstance(idx, slice) else 0
        by_offset.setdefault(start, s)   # dedupe replicated copies
    shards = [by_offset[k] for k in sorted(by_offset)]
    parts = [np.asarray(s.data) for s in shards]
    return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)


def fetch_local(tree):
    """``jax.device_get`` that also works on cross-process arrays: every
    leaf is resolved to this process's local view via :func:`local_rows`
    (scalars/replicated leaves come back whole)."""
    return jax.tree.map(local_rows, tree)


def barrier(name: str, timeout_s: float = 3600.0) -> None:
    """Coordination-service barrier across all processes.

    Pure KV-store rendezvous — no device collectives execute, so it is safe
    to use BEFORE the backend's collective contexts exist (which is exactly
    when it is needed: see :class:`AlignedJit`). No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed
    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


class AlignedJit:
    """Compile-skew guard for multi-process jit dispatch.

    The first collective of a freshly compiled program must rendezvous
    within the backend's context-init window (Gloo on CPU: ~30 s
    ``GetKeyValue`` timeout) on EVERY process — but cold jit compiles of a
    train step take minutes and skew freely across processes, so the fast
    process's collective times out while the slow one is still compiling
    (the torch analogue is NCCL_TIMEOUT around a lazy-init process group).
    Fix: AOT-compile (process-local, executes nothing), barrier on the
    coordination service, THEN dispatch the compiled executable — skew at
    the collective is the barrier release jitter (~ms), independent of
    compile times. One entry per argument shape/dtype signature; the
    executable is reused for every later call (shapes are static here —
    padded loaders). Transparent pass-through single-process."""

    def __init__(self, jitted, tag: str):
        self.jitted = jitted
        self.tag = tag
        self._compiled: Dict[str, Any] = {}

    def __call__(self, *args):
        if jax.process_count() == 1:
            return self.jitted(*args)
        key = str(jax.tree.map(
            lambda x: (getattr(x, "shape", None),
                       str(getattr(x, "dtype", type(x).__name__))), args))
        exe = self._compiled.get(key)
        if exe is None:
            exe = self.jitted.lower(*args).compile()
            barrier(f"align/{self.tag}/{len(self._compiled)}")
            self._compiled[key] = exe
        return exe(*args)
