"""Jitted train / eval steps.

The compiled replacement for the reference's hot loop
(``src/training/train_model.py:234-253``): forward + loss + backward +
AdamW update as ONE XLA program — no host round-trips, no GradScaler (bf16
needs none), no per-image python in the loss. Under a sharded mesh the same
program is the DDP/FSDP replacement: XLA inserts the gradient collectives
(the reference's bucketed allreduce / reduce-scatter) over ICI.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from custom_yolo_tpu.train.losses import DetectionLoss
from custom_yolo_tpu.train.optim import (
    current_learning_rate, set_learning_rate)
from custom_yolo_tpu.train.train_state import TrainState


def make_train_step(module, loss_fn: DetectionLoss, tx,
                    donate: bool = True,
                    accumulate_steps: int = 1,
                    ema_decay: float = 0.0,
                    ema_tau: float = 2000.0,
                    warmup_steps: int = 0) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    batch: dict with
      images    (N, H, W, 3) float
      gt_boxes  (N, G, 4) center-xywh px
      gt_labels (N, G) int32
      gt_mask   (N, G) bool

    When ``accumulate_steps > 1`` the batch is split into that many
    microbatches scanned on device; gradients are averaged before ONE
    optimizer update (gradient accumulation — absent from the reference,
    SURVEY §2.2; lets the effective batch exceed HBM). N must be divisible
    by accumulate_steps; BN statistics update per microbatch.

    ``ema_decay > 0`` additionally maintains an exponential moving average
    of the params and BN batch_stats inside the same program
    (state.ema_params must be non-None):
    ema ← d·ema + (1−d)·params with the standard warm-up ramp
    d = decay · (1 − exp(−(step+1)/tau)) so early steps track the live
    weights closely. Training extension (the reference has no EMA).

    ``warmup_steps > 0`` linearly ramps the effective LR over the first N
    steps: lr_eff = lr · min((step+1)/N, 1). The ramp is applied inside
    the program to the injected hyperparam for this update only; the
    persisted opt_state keeps the un-ramped LR so the host-side plateau
    scheduler stays the single owner of the base LR. Training extension
    (the reference starts at full LR).
    """

    def loss_of(params, batch_stats, batch):
        (preds, anchors, strides), mutated = module.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"])
        loss, metrics = loss_fn(preds, anchors, strides,
                                batch["gt_boxes"], batch["gt_labels"],
                                batch["gt_mask"])
        return loss, (metrics, mutated["batch_stats"])

    grad_fn = jax.value_and_grad(loss_of, has_aux=True)

    def compute_grads(params, batch_stats, batch):
        if accumulate_steps <= 1:
            (_, (metrics, new_stats)), grads = grad_fn(params, batch_stats,
                                                       batch)
            return grads, metrics, new_stats

        micro = jax.tree.map(
            lambda x: x.reshape(accumulate_steps,
                                x.shape[0] // accumulate_steps,
                                *x.shape[1:]), batch)

        def body(carry, microbatch):
            acc_grads, stats = carry
            (_, (metrics, new_stats)), grads = grad_fn(params, stats,
                                                       microbatch)
            acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
            return (acc_grads, new_stats), metrics

        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, new_stats), metrics_seq = jax.lax.scan(
            body, (zero, batch_stats), micro)
        grads = jax.tree.map(lambda g: g / accumulate_steps, grads)
        metrics = jax.tree.map(lambda m: jnp.mean(m), metrics_seq)
        return grads, metrics, new_stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        grads, metrics, new_stats = compute_grads(
            state.params, state.batch_stats, batch)
        opt_in = state.opt_state
        if warmup_steps > 0:
            base_lr = current_learning_rate(state.opt_state)
            ramp = jnp.minimum(
                (state.step + 1).astype(jnp.float32) / warmup_steps, 1.0)
            opt_in = set_learning_rate(state.opt_state, base_lr * ramp)
        updates, new_opt = tx.update(grads, opt_in, state.params)
        if warmup_steps > 0:
            # keep the base (plateau-owned) LR in the carried state
            new_opt = set_learning_rate(new_opt, base_lr)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            rng=jax.random.fold_in(state.rng, state.step),
        )
        if ema_decay > 0.0:
            assert state.ema_params is not None, \
                "ema_decay set but state was created without ema=True"
            d = ema_decay * (1.0 - jnp.exp(
                -(state.step + 1).astype(jnp.float32) / ema_tau))
            blend = lambda e, p: (e * d + (1.0 - d) * p).astype(e.dtype)
            new_state = new_state.replace(
                ema_params=jax.tree.map(blend, state.ema_params,
                                        new_params),
                # BN statistics are averaged too (ultralytics buffers
                # semantics): EMA weights with live running stats are
                # inconsistent and collapse detection confidence
                ema_batch_stats=jax.tree.map(blend, state.ema_batch_stats,
                                             new_stats))
        return new_state, metrics

    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(train_step, **kwargs)


def make_eval_step(module, loss_fn: DetectionLoss) -> Callable:
    """eval_step(state, batch) -> (metrics, preds, anchors, strides) —
    forward in inference mode (running BN stats) + loss, all on device
    (reference validation loop, train_model.py:305-321)."""

    def eval_step(state: TrainState, batch):
        preds, anchors, strides = module.apply(
            state.eval_variables, batch["images"], train=False)
        loss, metrics = loss_fn(preds, anchors, strides,
                                batch["gt_boxes"], batch["gt_labels"],
                                batch["gt_mask"])
        return metrics, preds, anchors, strides

    return jax.jit(eval_step)
