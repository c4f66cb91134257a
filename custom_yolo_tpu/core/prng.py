"""Explicit PRNG key threading.

The reference declared ``project.seed: 42`` but never consumed it
(SURVEY.md §5 — no ``manual_seed`` call exists). JAX makes seeding
structural: every source of randomness takes an explicit key derived here.
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def split_named(key: jax.Array, *names: str) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    """Deterministic per-epoch key (replaces
    ``DistributedSampler.set_epoch``, train_model.py:220-221)."""
    return jax.random.fold_in(key, epoch)


def step_keys(key: jax.Array, num_steps: int) -> Iterator[Tuple[int, jax.Array]]:
    for step in range(num_steps):
        yield step, jax.random.fold_in(key, step)
