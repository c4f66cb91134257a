"""SLURM/host resource helpers (reference ``src/utils/common.py:6-43``)."""

from __future__ import annotations

import multiprocessing
import os
from typing import Optional


def get_num_workers(cap: int = 16) -> int:
    """Decode-worker count from SLURM env (SLURM_CPUS_PER_TASK /
    SLURM_CPUS_PER_GPU) or host CPU count, capped (reference
    common.py:6-23)."""
    for var in ("SLURM_CPUS_PER_TASK", "SLURM_CPUS_PER_GPU"):
        val = os.environ.get(var)
        if val:
            try:
                return max(1, min(int(val), cap))
            except ValueError:
                pass
    return max(1, min(multiprocessing.cpu_count(), cap))


def get_num_threads(world_size: int = 1) -> int:
    """Host threads available per process (reference common.py:25-43)."""
    return max(1, multiprocessing.cpu_count() // max(1, world_size))


def find_latest_checkpoint(folder: str) -> Optional[str]:
    """Most-recently-modified checkpoint path in a folder (reference
    common.py:58-78)."""
    if not os.path.isdir(folder):
        return None
    entries = [os.path.join(folder, f) for f in os.listdir(folder)
               if not f.startswith(".")]
    entries = [e for e in entries if os.path.basename(e) != "model_config.json"]
    if not entries:
        return None
    return max(entries, key=os.path.getmtime)
