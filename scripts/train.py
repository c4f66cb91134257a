#!/usr/bin/env python
"""Training/validation entry point.

Same CLI surface as the reference ``scripts/distributed_training.py``
(:203-224) with TPU-native semantics: ``--mode`` selects the mesh sharding
(dp replaces DDP, fsdp replaces FSDP1/FSDP2 — one GSPMD mechanism), there is
no torchrun (single process per host; multi-host via --num_processes /
--process_id / --coordinator).

Usage:
  python scripts/train.py --mode dp --precision bfloat16 --batch_size 8
  python scripts/train.py --mode fsdp --load_from_checkpoint <dir>
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="TPU detection training")
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                   help="cpu forces JAX_PLATFORMS=cpu (test mode)")
    p.add_argument("--mode", required=True,
                   choices=["dp", "fsdp", "single", "ddp", "fsdp2"],
                   help="parallelism mode (ddp/fsdp2 accepted as reference "
                        "aliases for dp/fsdp)")
    p.add_argument("--precision", default=None,
                   choices=["bfloat16", "float16", "float32"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--prefetch_factor", type=int, default=None)
    p.add_argument("--dataset_percent", type=float, default=1.0)
    p.add_argument("--load_from_checkpoint", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # experiment-sweep overrides (multi-seed error bars, checkpoint-cadence
    # studies — docs/QUALITY_PARITY.md): each defaults to the config value
    p.add_argument("--seed", type=int, default=None,
                   help="override project.seed (init + data order + augment)")
    p.add_argument("--save_interval", type=int, default=None,
                   help="override checkpoint.save_interval")
    p.add_argument("--checkpoint_dir", default=None,
                   help="override checkpoint.checkpoint_dir")
    return p.parse_args()


def main():
    args = parse_args()
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.device == "cpu":
        # env var alone is ignored when jax was pre-imported by a site hook
        jax.config.update("jax_platforms", "cpu")

    from custom_yolo_tpu.config import Config
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.core.mesh import initialize_distributed
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.train.trainer import Trainer
    from custom_yolo_tpu.utils.checkpoint import (
        CheckpointManager, load_sidecar, save_sidecar)
    from custom_yolo_tpu.utils.common import get_num_workers
    from custom_yolo_tpu.utils.logging import (
        MetricsLogger, setup_console_logging)

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    cfg = Config.from_yaml(args.config)
    mode = {"ddp": "dp", "fsdp2": "fsdp"}.get(args.mode, args.mode)
    cfg.training.sharding.mode = mode
    if args.precision:
        cfg.training.sharding.precision = args.precision
    if args.batch_size:
        cfg.training.batch_size = args.batch_size
    if args.prefetch_factor:
        cfg.data.prefetch_factor = args.prefetch_factor
    if args.epochs:
        cfg.training.epochs = args.epochs
    if args.seed is not None:
        cfg.project.seed = args.seed
    if args.save_interval is not None:
        cfg.checkpoint.save_interval = args.save_interval
    if args.checkpoint_dir is not None:
        cfg.checkpoint.checkpoint_dir = args.checkpoint_dir

    # checkpoint-resume forces arch/precision consistency via the sidecar
    # (reference distributed_training.py:43-50)
    ckpt_dir = cfg.checkpoint.checkpoint_dir
    if args.load_from_checkpoint:
        ckpt_dir = args.load_from_checkpoint
        sidecar = load_sidecar(ckpt_dir)
        if sidecar:
            cfg.model.width = sidecar["width"]
            cfg.model.depth = sidecar["depth"]
            cfg.model.csp = sidecar["csp"]
            cfg.model.num_classes = sidecar["num_classes"]
            cfg.training.sharding.precision = sidecar.get(
                "precision", cfg.training.sharding.precision)

    logger = setup_console_logging(cfg.logging.log_level,
                                   cfg.project.log_dir,
                                   cfg.logging.file_log)
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"mode={mode} precision={cfg.training.sharding.precision} "
                f"batch={cfg.training.batch_size}")

    policy = resolve_policy(cfg.training.sharding.precision)
    model = YoloModel(width=tuple(cfg.model.width),
                      depth=tuple(cfg.model.depth),
                      csp=tuple(cfg.model.csp),
                      num_classes=cfg.model.num_classes,
                      reg_max=cfg.model.reg_max, policy=policy,
                      remat=cfg.training.remat,
                      pallas_attention=cfg.model.pallas_attention)
    import jax.numpy as jnp
    variables = model.init(
        jax.random.key(cfg.project.seed),
        jnp.zeros((1, *cfg.model.input_size, 3), policy.compute_dtype),
        train=False)
    from custom_yolo_tpu.utils.summary import count_params, summarize
    logger.info(f"model params: {count_params(variables):,}")
    logger.info("\n" + summarize(variables))

    # data
    workers = get_num_workers()
    train_ds = DetectionDataset(
        os.path.join(cfg.data.processed_dir, cfg.data.train_parquet),
        cfg.data.train_images, input_size=tuple(cfg.model.input_size),
        is_test=cfg.training.is_test, percent=args.dataset_percent,
        max_gt=cfg.data.max_gt_boxes, seed=cfg.project.seed)
    val_ds = DetectionDataset(
        os.path.join(cfg.data.processed_dir, cfg.data.val_parquet),
        cfg.data.val_images, input_size=tuple(cfg.model.input_size),
        is_test=cfg.training.is_test, percent=args.dataset_percent,
        max_gt=cfg.data.max_gt_boxes, seed=cfg.project.seed)
    # batch_size is per-device (the reference's per-process semantics under
    # torchrun); the host loader must deliver its share of the global batch,
    # and sharded batches must divide the mesh
    n_devices = jax.device_count() if mode != "single" else 1
    global_batch = cfg.training.batch_size * n_devices
    local_batch = max(1, global_batch // jax.process_count())
    logger.info(f"batch: {cfg.training.batch_size}/device × {n_devices} "
                f"devices = {global_batch} global "
                f"({local_batch}/process)")
    kwargs = dict(num_workers=workers,
                  prefetch_factor=cfg.data.prefetch_factor,
                  seed=cfg.project.seed,
                  process_index=jax.process_index(),
                  process_count=jax.process_count(),
                  pad_to_multiple=n_devices)
    train_loader = DataLoader(train_ds, local_batch,
                              shuffle=True, drop_last=True, **kwargs)
    val_loader = DataLoader(val_ds, local_batch, shuffle=False,
                            drop_last=False, **kwargs)
    logger.info(f"train: {len(train_ds)} images, val: {len(val_ds)} images")
    if len(train_loader) == 0:
        raise SystemExit(
            f"train dataset ({len(train_ds)} images) yields zero batches at "
            f"local batch {local_batch} (batch_size×devices/processes) — "
            "reduce --batch_size or add data")

    ckpt = None
    metrics_logger = None
    if jax.process_index() == 0:
        save_sidecar(ckpt_dir, {
            "width": list(cfg.model.width), "depth": list(cfg.model.depth),
            "csp": list(cfg.model.csp),
            "num_classes": cfg.model.num_classes,
            "mode": mode, "precision": cfg.training.sharding.precision})
        ckpt = CheckpointManager(
            ckpt_dir, max_to_keep=cfg.checkpoint.max_to_keep)
        metrics_logger = MetricsLogger(
            cfg.wandb, log_dir=cfg.project.log_dir,
            run_name=f"{args.device}_{mode}_"
                     f"{cfg.training.sharding.precision}",
            config_dict=cfg.to_dict())
        # attach the param-tree summary to the tracking run (the reference
        # uploads torchinfo output as a wandb artifact,
        # distributed_training.py:111-119)
        metrics_logger.log_summary(
            f"params: {count_params(variables):,}\n{summarize(variables)}")

    trainer = Trainer(cfg, model, variables, logger=logger,
                      metrics_logger=metrics_logger,
                      checkpoint_manager=ckpt)
    # explicit --load_from_checkpoint, or auto-resume when the config's
    # checkpoint.resume_training is set and a checkpoint exists (this key
    # is decorative in the reference — live here)
    auto_resume = (cfg.checkpoint.resume_training and ckpt is not None
                   and ckpt.latest_epoch() is not None)
    if args.load_from_checkpoint or auto_resume:
        template = jax.device_get(trainer.state)
        trainer.load_state(ckpt.restore(template))
        logger.info(f"resumed from epoch {int(trainer.state.epoch)}")

    try:
        result = trainer.fit(train_loader, val_loader)
        logger.info(f"done; best val loss {result['best_val_loss']:.4f}")
    except Exception:
        traceback.print_exc()
        raise
    finally:
        if metrics_logger is not None:
            metrics_logger.close()
        if ckpt is not None:
            ckpt.close()


if __name__ == "__main__":
    main()
