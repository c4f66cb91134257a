"""Train state pytree: params, batch_stats, optimizer state, step, PRNG,
plateau-scheduler state, optional EMA params — everything needed for exact
resume (the reference checkpoints only {epoch, model, optimizer, val_loss},
losing scheduler and RNG state; SURVEY §5 checkpoint gaps)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from custom_yolo_tpu.train.optim import PlateauState, plateau_init


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray
    rng: jax.Array
    plateau: PlateauState
    # exponential moving average of params AND batch_stats (None when
    # disabled) — a training-quality extension the reference lacks;
    # standard for detection serving (ultralytics ModelEMA averages
    # buffers too: EMA conv weights paired with LIVE BN statistics are
    # statistically inconsistent — the running stats were accumulated
    # under different weights — and measurably collapse detection
    # confidence). Updated inside the jitted train step, evaluated /
    # served via eval_variables, checkpointed with the rest of the state.
    ema_params: Any = None
    ema_batch_stats: Any = None

    @classmethod
    def create(cls, variables: Dict[str, Any], tx, rng: jax.Array,
               ema: bool = False) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
            epoch=jnp.asarray(0, jnp.int32),
            rng=rng,
            plateau=plateau_init(),
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
            ema_batch_stats=(jax.tree.map(
                jnp.copy, variables.get("batch_stats", {}))
                if ema else None),
        )

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    @property
    def eval_variables(self) -> Dict[str, Any]:
        """Variables for validation/serving: the EMA tree when tracked
        (the averaged weights — params AND BN statistics — are what gets
        deployed), else the live ones."""
        ema = self.ema_params is not None
        v = {"params": self.ema_params if ema else self.params}
        if self.batch_stats:
            v["batch_stats"] = (self.ema_batch_stats
                                if ema and self.ema_batch_stats
                                else self.batch_stats)
        return v
