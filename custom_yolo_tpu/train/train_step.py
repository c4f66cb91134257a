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
from custom_yolo_tpu.train.train_state import TrainState


def make_train_step(module, loss_fn: DetectionLoss, tx,
                    donate: bool = True,
                    accumulate_steps: int = 1) -> Callable:
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
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
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
        return new_state, metrics

    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(train_step, **kwargs)


def make_eval_step(module, loss_fn: DetectionLoss) -> Callable:
    """eval_step(state, batch) -> (metrics, preds, anchors, strides) —
    forward in inference mode (running BN stats) + loss, all on device
    (reference validation loop, train_model.py:305-321)."""

    def eval_step(state: TrainState, batch):
        preds, anchors, strides = module.apply(
            state.variables, batch["images"], train=False)
        loss, metrics = loss_fn(preds, anchors, strides,
                                batch["gt_boxes"], batch["gt_labels"],
                                batch["gt_mask"])
        return metrics, preds, anchors, strides

    return jax.jit(eval_step)
