"""Epoch/step training engine.

Equivalent of the reference ``train()`` (``src/training/train_model.py:
145-384``) rebuilt around the jitted train/eval steps:

* per-epoch deterministic reshuffle + per-step PRNG keys (replaces
  ``sampler.set_epoch``; the reference never seeds anything);
* metrics are device scalars fetched once per log interval (the reference
  syncs every step for tqdm); cross-device reduction is implicit — the
  jitted loss is a global mean over the sharded batch, replacing
  ``reduce_value`` allreduces (distributed_setup.py:28-63);
* validation runs the jitted eval step + fixed-shape decode, then the
  greedy DetectionMetrics (parity) and optionally true COCO mAP;
* ReduceLROnPlateau on val loss, real grad clipping, early stopping
  (dead config in the reference — SURVEY §7 quirk #6);
* orbax checkpoint every ``save_interval`` epochs with full state.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.config import Config
from custom_yolo_tpu.core import prng
from custom_yolo_tpu.core.mesh import MeshSpec, create_mesh
from custom_yolo_tpu.data.transforms import make_device_batch
from custom_yolo_tpu.eval.decode import decode_predictions, decoded_to_lists
from custom_yolo_tpu.eval.metrics import DetectionMetrics
from custom_yolo_tpu.parallel.multihost import fetch_local, local_rows
from custom_yolo_tpu.parallel.sharding import (
    activation_spec, shard_batch, shard_train_state)
from custom_yolo_tpu.train.losses import DetectionLoss, LossConfig
from custom_yolo_tpu.train.optim import (
    build_optimizer, plateau_update, set_learning_rate)
from custom_yolo_tpu.train.train_state import TrainState
from custom_yolo_tpu.train.train_step import make_eval_step, make_train_step


class Trainer:
    def __init__(self, config: Config, model, variables,
                 logger=None, metrics_logger=None,
                 checkpoint_manager=None):
        self.config = config
        self.model = model
        self.logger = logger
        self.metrics_logger = metrics_logger
        self.ckpt = checkpoint_manager

        tcfg = config.training
        self.tx = build_optimizer(tcfg)
        self.loss_fn = DetectionLoss(LossConfig(
            num_classes=config.model.num_classes,
            reg_max=config.model.reg_max,
            lambda_cls=tcfg.lambda_cls,
            lambda_box=tcfg.lambda_box,
            lambda_dfl=tcfg.lambda_dfl,
            assigner=tcfg.assigner))

        self.mesh = None
        mode = tcfg.sharding.mode
        if mode != "single" and jax.device_count() > 1:
            self.mesh = create_mesh(MeshSpec.for_mode(mode))
            # pin activations batch-sharded so fsdp param shardings never
            # leak into the activation layout (GSPMD involuntary remat)
            if getattr(model, "act_spec", None) is None:
                model = model.clone(act_spec=activation_spec())
                self.model = model

        self.train_step = make_train_step(
            model, self.loss_fn, self.tx,
            accumulate_steps=tcfg.accumulate_steps,
            ema_decay=tcfg.ema_decay, ema_tau=tcfg.ema_tau,
            warmup_steps=tcfg.warmup_steps)
        self.eval_step = make_eval_step(model, self.loss_fn)
        if jax.process_count() > 1:
            # multi-process: align compile completion across processes before
            # the first collective executes (Gloo context init would time out
            # against a process still minutes deep in its cold compile)
            from custom_yolo_tpu.parallel.multihost import AlignedJit
            self.train_step = AlignedJit(self.train_step, "train_step")
            self.eval_step = AlignedJit(self.eval_step, "eval_step")

        rng = prng.root_key(config.project.seed)
        # defensive copy: the jitted train step donates state buffers for
        # memory reuse; the caller's `variables` must stay valid (e.g. to
        # build another Trainer)
        variables = jax.tree.map(jnp.array, variables)
        self.state = TrainState.create(variables, self.tx, rng,
                                       ema=tcfg.ema_decay > 0)
        if self.mesh is not None:
            self.state = shard_train_state(
                self.state, self.mesh,
                min_weight_size=tcfg.sharding.fsdp_min_weight_size)
        self.base_lr = tcfg.learning_rate
        self.history: list = []

    # ------------------------------------------------------------------
    def load_state(self, state) -> None:
        """Install a (restored) train state, re-sharding it over the mesh
        (orbax restore yields host/default-placed arrays)."""
        if self.mesh is not None:
            with jax.sharding.set_mesh(self.mesh):
                state = shard_train_state(
                    state, self.mesh,
                    min_weight_size=self.config.training.sharding
                    .fsdp_min_weight_size)
        self.state = state

    # ------------------------------------------------------------------
    def _log(self, msg: str) -> None:
        if self.logger is not None:
            self.logger.info(msg)
        else:
            print(msg)

    def _device_batch(self, host_batch, key, train: bool,
                      mosaic_prob: float = 0.0, mixup_prob: float = 0.0):
        batch = make_device_batch(host_batch, key, train=train,
                                  mosaic_prob=mosaic_prob,
                                  mixup_prob=mixup_prob)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def _device_batches(self, loader, ekey, train: bool,
                        mosaic_prob: float = 0.0, mixup_prob: float = 0.0):
        """Yield ``(step, host_batch, device_batch)`` with device staging
        ahead of consumption (``data.pin_memory``): batch N+1's H2D transfer
        + on-device augment are *dispatched* (async) while the caller is
        still blocked on batch N's compute — the TPU analogue of the
        reference's pinned-memory + prefetch_factor staging
        (``src/data/data_loader.py:27-37``). Depth 1 (no overlap) when
        pin_memory is off."""
        depth = 2 if self.config.data.pin_memory else 1
        buf: deque = deque()
        for step, host_batch in enumerate(loader):
            key = jax.random.fold_in(ekey, step)
            buf.append((step, host_batch,
                        self._device_batch(host_batch, key, train,
                                           mosaic_prob=mosaic_prob,
                                           mixup_prob=mixup_prob)))
            if len(buf) >= depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader,
            epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.config.training
        ckpt_cfg = self.config.checkpoint
        epochs = epochs if epochs is not None else cfg.epochs
        self._epochs_total = epochs   # close_mosaic gating in _train_epoch
        start_epoch = int(self.state.epoch)
        # best-model tracking per checkpoint.best_model_metric/mode
        # (decorative keys in the reference — live here). "val/loss" (the
        # reference's name) aliases our "val/total_loss".
        metric_key = {"val/loss": "val/total_loss"}.get(
            ckpt_cfg.best_model_metric, ckpt_cfg.best_model_metric)
        sign = 1.0 if ckpt_cfg.best_model_mode == "min" else -1.0
        best_val = float("inf")
        best_epoch = None
        bad_epochs = 0
        ctx = (jax.sharding.set_mesh(self.mesh) if self.mesh is not None
               else _nullcontext())
        with ctx:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                train_metrics = self._train_epoch(train_loader, epoch)
                val_metrics, det_metrics = self._validate(val_loader, epoch)

                # plateau scheduler (torch ReduceLROnPlateau semantics)
                val_loss = jnp.asarray(val_metrics["total_loss"], jnp.float32)
                plateau = plateau_update(
                    self.state.plateau, val_loss,
                    patience=cfg.learning_rate_patience,
                    factor=cfg.learning_rate_factor,
                    base_lr=self.base_lr)
                lr = self.base_lr * plateau.scale
                self.state = self.state.replace(
                    plateau=plateau,
                    opt_state=set_learning_rate(self.state.opt_state, lr),
                    epoch=jnp.asarray(epoch + 1, jnp.int32))

                record = {
                    **{f"train/{k}": v for k, v in train_metrics.items()},
                    **{f"val/{k}": v for k, v in val_metrics.items()},
                    **{f"val/{k}": v for k, v in det_metrics.items()},
                    "lr": float(lr),
                    "epoch_time_s": time.time() - t0,
                }
                self.history.append(record)
                if self.metrics_logger is not None:
                    self.metrics_logger.log(record, step=epoch)
                self._log(
                    f"epoch {epoch}: train_loss="
                    f"{train_metrics['total_loss']:.4f} "
                    f"val_loss={val_metrics['total_loss']:.4f} "
                    f"P={det_metrics.get('precision', 0):.4f} "
                    f"R={det_metrics.get('recall', 0):.4f} "
                    f"mAP={det_metrics.get('mAP', 0):.4f} lr={float(lr):.2e} "
                    f"({record['epoch_time_s']:.1f}s)")

                if self.ckpt is not None and \
                        (epoch + 1) % self.config.checkpoint.save_interval == 0:
                    self.ckpt.save(epoch, jax.device_get(self.state),
                                   metrics={k: float(v)
                                            for k, v in record.items()})

                # best tracking + early stopping (dead config in the
                # reference)
                tracked = sign * float(record.get(
                    metric_key, val_metrics["total_loss"]))
                if tracked < best_val - 1e-6:
                    best_val = tracked
                    best_epoch = epoch
                    bad_epochs = 0
                else:
                    bad_epochs += 1
                    if bad_epochs > cfg.early_stopping_patience:
                        self._log(f"early stopping at epoch {epoch}")
                        break
        if self.ckpt is not None:
            self.ckpt.wait()
        return {"history": self.history,
                "best_val_loss": sign * best_val,
                "best_metric": sign * best_val,
                "best_metric_name": metric_key,
                "best_epoch": best_epoch}

    # ------------------------------------------------------------------
    def _train_epoch(self, loader, epoch: int) -> Dict[str, float]:
        cfg = self.config.training
        loader.set_epoch(epoch)
        ekey = prng.epoch_key(prng.root_key(self.config.project.seed), epoch)
        # mosaic/mixup disabled for the final close_mosaic epochs (train on
        # clean images before the end — ultralytics convention)
        total = getattr(self, "_epochs_total", cfg.epochs)
        heavy_aug = epoch < total - cfg.close_mosaic
        mosaic_prob = cfg.mosaic if cfg.mosaic > 0 and heavy_aug else 0.0
        mixup_prob = cfg.mixup if cfg.mixup > 0 and heavy_aug else 0.0
        sums: Dict[str, float] = {}
        count = 0
        pending = None
        for step, _, batch in self._device_batches(
                loader, ekey, train=self.config.data.augment,
                mosaic_prob=mosaic_prob, mixup_prob=mixup_prob):
            self.state, metrics = self.train_step(self.state, batch)
            pending = metrics
            count += 1
            if (step + 1) % cfg.log_interval == 0:
                fetched = fetch_local(metrics)
                for k, v in fetched.items():
                    sums[k] = sums.get(k, 0.0) + float(v) * cfg.log_interval
                if self.metrics_logger is not None:
                    self.metrics_logger.log(
                        {f"step/{k}": float(v) for k, v in fetched.items()},
                        step=int(self.state.step))
                pending = None
        if pending is not None:
            fetched = fetch_local(pending)
            rem = count % cfg.log_interval or cfg.log_interval
            for k, v in fetched.items():
                sums[k] = sums.get(k, 0.0) + float(v) * rem
        if count == 0:
            return {"total_loss": float("nan")}
        return {k: v / count for k, v in sums.items()}

    # ------------------------------------------------------------------
    def _validate(self, loader, epoch: int):
        ekey = prng.epoch_key(prng.root_key(self.config.project.seed + 1),
                              epoch)
        det = DetectionMetrics(self.config.model.num_classes)
        sums: Dict[str, float] = {}
        count = 0
        multiproc = jax.process_count() > 1
        for step, host_batch, batch in self._device_batches(loader, ekey,
                                                            train=False):
            metrics, preds, anchors, strides = self.eval_step(self.state,
                                                              batch)
            for k, v in fetch_local(metrics).items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if multiproc:
                # the global eval outputs are not fully addressable here;
                # decode THIS process's batch rows (they line up with the
                # process-local host_batch GT below), committed to a local
                # device so the jitted decode stays process-local. The
                # ambient `set_mesh(self.mesh)` from fit() would make the
                # decode jit demand the CROSS-process mesh (devices this
                # process cannot address) — shadow it with a single-local-
                # device mesh of the same axis names for the decode call.
                dev = jax.local_devices()[0]
                preds, anchors, strides = (
                    jax.device_put(local_rows(a), dev)
                    for a in (preds, anchors, strides))
                local_mesh = jax.sharding.Mesh(
                    np.asarray([dev]).reshape(
                        (1,) * len(self.mesh.axis_names)),
                    self.mesh.axis_names)
                with jax.sharding.set_mesh(local_mesh):
                    decoded = decode_predictions(preds, anchors, strides)
            else:
                decoded = decode_predictions(preds, anchors, strides)
            pred_lists = decoded_to_lists(decoded)
            gt_boxes = host_batch["gt_boxes"]
            gt_labels = host_batch["gt_labels"]
            gt_mask = host_batch["gt_mask"]
            sample_pad = host_batch.get(
                "sample_pad", np.zeros(gt_boxes.shape[0], bool))
            for i, plist in enumerate(pred_lists):
                if sample_pad[i]:
                    continue  # mesh-divisibility padding, not a real image
                m = gt_mask[i]
                targets = np.concatenate(
                    [gt_boxes[i][m],
                     gt_labels[i][m, None].astype(np.float32)], axis=1)
                det.update(plist, targets)
            count += 1
        loss_metrics = ({k: v / count for k, v in sums.items()}
                        if count else {"total_loss": float("nan")})
        if jax.process_count() > 1:
            det.all_reduce()
            from custom_yolo_tpu.parallel.collectives import reduce_metrics
            loss_metrics = reduce_metrics(loss_metrics)
        return loss_metrics, det.compute()


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
