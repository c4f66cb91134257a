"""Host-level collective helpers.

Equivalent of the reference's ``reduce_value``
(``src/training/distributed_setup.py:28-63`` — ``dist.all_reduce`` of scalar
metrics). Under GSPMD the *loss* needs no explicit reduction (it is a global
mean over the sharded batch inside jit); these helpers are for host-side
quantities that live outside jit — e.g. per-process detection-metric
accumulators under multi-host data loading (the reference never reduced
those: only rank 0's partition was reported, quirk #10).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def reduce_value(value, average: bool = True):
    """All-reduce a python/numpy scalar (or array) across processes.
    No-op in single-process runs."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = np.asarray(value, np.float64)
    gathered = multihost_utils.process_allgather(jnp.asarray(arr))
    total = np.sum(np.asarray(gathered), axis=0)
    return total / jax.process_count() if average else total


def reduce_metrics(metrics: Dict[str, float], average: bool = True
                   ) -> Dict[str, float]:
    """Reduce a whole metrics dict across processes (order-stable)."""
    if jax.process_count() == 1:
        return metrics
    keys = sorted(metrics)
    stacked = np.asarray([float(metrics[k]) for k in keys], np.float64)
    reduced = reduce_value(stacked, average=average)
    return {k: float(v) for k, v in zip(keys, np.asarray(reduced))}
