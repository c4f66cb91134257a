"""Model summary — the torchinfo analogue the reference uploads to wandb
(``scripts/distributed_training.py:111-119``): per-module parameter counts,
shapes, and totals from a flax variables tree."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _walk(tree: Dict[str, Any], prefix: str = ""
          ) -> List[Tuple[str, int]]:
    rows = []
    total = 0
    for key, value in sorted(tree.items()):
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            sub = _walk(value, path)
            rows.extend(sub)
        else:
            rows.append((path, int(np.prod(value.shape))))
    return rows


def count_params(variables: Dict[str, Any]) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree.leaves(variables.get("params", {})))


def summarize(variables: Dict[str, Any], depth: int = 2) -> str:
    """Human-readable summary string grouped to `depth` module levels."""
    rows = _walk(variables.get("params", {}))
    grouped: Dict[str, int] = {}
    for path, n in rows:
        key = "/".join(path.split("/")[:depth])
        grouped[key] = grouped.get(key, 0) + n
    total = sum(n for _, n in rows)
    stats_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(
        variables.get("batch_stats", {})))
    lines = [f"{'module':<48s} {'params':>14s}", "-" * 63]
    for key in sorted(grouped):
        lines.append(f"{key:<48s} {grouped[key]:>14,d}")
    lines.append("-" * 63)
    lines.append(f"{'total trainable':<48s} {total:>14,d}")
    if stats_total:
        lines.append(f"{'batch statistics':<48s} {stats_total:>14,d}")
    return "\n".join(lines)
