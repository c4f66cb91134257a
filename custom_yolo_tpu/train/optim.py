"""Optimizer + LR schedule.

Equivalent of the reference ``get_optimizer``
(``src/training/utils_train.py:20-36``): AdamW + ReduceLROnPlateau. Unlike
the reference, ``grad_clip`` (config.yaml:67) is actually applied (quirk —
the reference accepts it and never uses it, SURVEY §2.2), and the
plateau scheduler state is part of the checkpointed train state (the
reference loses scheduler state across resume, SURVEY §5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax

from custom_yolo_tpu.config import TrainingConfig


class PlateauState(NamedTuple):
    """ReduceLROnPlateau: scale LR by `factor` after `patience` epochs
    without val-loss improvement (torch semantics, threshold=1e-4 rel)."""
    scale: jnp.ndarray        # current multiplicative LR factor
    best: jnp.ndarray         # best val loss seen
    bad_epochs: jnp.ndarray   # epochs since last improvement


def plateau_init() -> PlateauState:
    return PlateauState(scale=jnp.asarray(1.0, jnp.float32),
                        best=jnp.asarray(jnp.inf, jnp.float32),
                        bad_epochs=jnp.asarray(0, jnp.int32))


def plateau_update(state: PlateauState, val_loss: jnp.ndarray,
                   patience: int, factor: float,
                   threshold: float = 1e-4, base_lr: float = 1.0,
                   min_lr: float = 0.0, eps: float = 1e-8) -> PlateauState:
    """One ``ReduceLROnPlateau.step(val_loss)`` with full torch semantics
    (rel-threshold improvement, patience counting, ``min_lr`` floor, and the
    ``eps`` guard that skips LR changes smaller than eps — torch defaults).
    ``base_lr`` converts the tracked multiplicative ``scale`` into LR units
    for the min_lr/eps comparisons (pass the optimizer's configured LR).
    Trajectory pinned against live torch in tests/test_optim_vs_reference.py."""
    improved = val_loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, val_loss, state.best)
    bad = jnp.where(improved, 0, state.bad_epochs + 1)
    trigger = bad > patience
    candidate = jnp.maximum(state.scale * factor, min_lr / base_lr)
    apply = trigger & ((state.scale - candidate) * base_lr > eps)
    scale = jnp.where(apply, candidate, state.scale)
    bad = jnp.where(trigger, 0, bad)
    return PlateauState(scale=scale, best=best, bad_epochs=bad)


def build_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    """AdamW with global-norm clipping; LR is modulated at apply time by the
    plateau scale through ``optax.inject_hyperparams``."""
    if cfg.optimizer.lower() != "adamw":
        raise ValueError(f"unsupported optimizer {cfg.optimizer!r} "
                         "(reference supports adamw only, "
                         "utils_train.py:20-36)")

    def make(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(learning_rate=learning_rate,
                        weight_decay=cfg.weight_decay),
        )

    return optax.inject_hyperparams(make)(learning_rate=cfg.learning_rate)


def set_learning_rate(opt_state, lr: jnp.ndarray):
    """Update the injected learning_rate hyperparam in-place (functional)."""
    return opt_state._replace(hyperparams={**opt_state.hyperparams,
                                           "learning_rate": lr})


def current_learning_rate(opt_state) -> jnp.ndarray:
    return opt_state.hyperparams["learning_rate"]
