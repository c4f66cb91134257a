#!/usr/bin/env python
"""COCO-scale soak (VERDICT r2 #5): prove the ETL → loader → trainer → eval
chain at real-COCO scale (118k images / ~860k annotations) without COCO
(zero egress). The reference's workload is COCO-2017 training
(``/root/reference/config.yaml:21-39``); this generates a procedurally
equivalent dataset at the same scale and drives every stage end-to-end,
recording wall-clock and peak RSS per phase into docs/SOAK.md.

Phases (independently runnable, ``--phases gen,etl,loader,train,eval``):

  gen     118k train + 5k val JPEGs at COCO-like sizes (multiprocess)
  etl     streaming COCO-JSON → parquet (the real ETL, peak-RSS bounded)
  loader  loader-only throughput at 640² (native decode + augmentation)
  train   ≥1k real train steps at 640² (TPU) with the live loader
  eval    full val (5k images) COCO-mAP evaluation wall-clock

Usage (CPU phases first, TPU phase when the chip is free):
  python scripts/soak.py --root /root/soak_data --phases gen,etl,loader
  python scripts/soak.py --root /root/soak_data --phases train,eval
"""

import argparse
import json
import multiprocessing as mp
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_CLASSES = 80          # COCO's class count
ANNS_PER_IMG = 7.3        # COCO-2017 train has ~860k anns / 118k imgs


def _peak_rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _class_colors(n):
    import colorsys
    return [tuple(int(c * 255) for c in colorsys.hsv_to_rgb(
        i / max(n, 1), 0.9, 0.9)) for i in range(n)]


def _gen_chunk(task):
    """Worker: render a contiguous range of images, return their metadata."""
    (split, start, count, img_dir, seed) = task
    from PIL import Image
    rng = np.random.RandomState(seed)
    colors = _class_colors(NUM_CLASSES)
    images, annotations = [], []
    for i in range(start, start + count):
        w = int(rng.randint(320, 641))
        h = int(rng.randint(240, 481))
        name = f"{split}_{i:06d}.jpg"
        img = np.full((h, w, 3), 30, np.uint8)
        n_ann = int(rng.poisson(ANNS_PER_IMG - 1)) + 1
        anns = []
        for _ in range(n_ann):
            bw = int(rng.randint(8, max(9, w // 2)))
            bh = int(rng.randint(8, max(9, h // 2)))
            x = int(rng.randint(0, max(1, w - bw)))
            y = int(rng.randint(0, max(1, h - bh)))
            cid = int(rng.randint(0, NUM_CLASSES))
            jitter = rng.randint(-15, 16, 3)
            color = np.clip(np.asarray(colors[cid]) + jitter, 0, 255)
            img[y:y + bh, x:x + bw] = color.astype(np.uint8)
            anns.append({
                "image_id": i + 1, "category_id": 100 + cid,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[float(x), float(y), float(x + bw),
                                  float(y), float(x + bw), float(y + bh)]],
            })
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=85)
        images.append({"id": i + 1, "file_name": name,
                       "height": h, "width": w})
        annotations.extend(anns)
    return images, annotations


def phase_gen(root, train_images, val_images, workers):
    ann_dir = os.path.join(root, "raw", "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    categories = [{"id": 100 + i, "name": f"class_{i:02d}",
                   "supercategory": "synthetic"}
                  for i in range(NUM_CLASSES)]
    stats = {}
    for split, n in (("train", train_images), ("val", val_images)):
        img_dir = os.path.join(root, "raw", "images", split)
        os.makedirs(img_dir, exist_ok=True)
        chunk = 500
        tasks = [(split, s, min(chunk, n - s), img_dir, 1000 + s)
                 for s in range(0, n, chunk)]
        t0 = time.time()
        images, annotations = [], []
        with mp.Pool(workers) as pool:
            for imgs, anns in pool.imap_unordered(_gen_chunk, tasks):
                images.extend(imgs)
                annotations.extend(anns)
        for j, a in enumerate(annotations):
            a["id"] = j + 1
        images.sort(key=lambda r: r["id"])
        with open(os.path.join(ann_dir, f"instances_{split}2017.json"),
                  "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": categories}, f)
        with open(os.path.join(ann_dir, f"stuff_{split}2017.json"),
                  "w") as f:
            json.dump({"images": [], "annotations": [],
                       "categories": []}, f)
        dt = time.time() - t0
        stats[split] = {"images": len(images), "annotations": len(annotations),
                        "wall_s": round(dt, 1),
                        "img_per_s": round(len(images) / dt, 1)}
        print(f"[gen] {split}: {stats[split]}", flush=True)
    return stats


def phase_etl(root):
    from custom_yolo_tpu.data.preprocess import DataPreprocess
    ann_dir = os.path.join(root, "raw", "annotations")
    out_dir = os.path.join(root, "processed", "parquet")
    stats = {}
    for split in ("train", "val"):
        t0 = time.time()
        DataPreprocess.create_parquet_data(
            annotations_dir=ann_dir, output_dir=out_dir, output_folder=split,
            file_names=[f"instances_{split}2017.json"],
            keys=["images", "annotations", "categories"],
            columns=[["id", "file_name", "height", "width"],
                     ["id", "image_id", "category_id", "bbox", "area",
                      "iscrowd", "segmentation"],
                     ["id", "name", "supercategory"]],
            chunk_sizes=[10_000, 50_000, 1_000], is_test=False)
        stats[split] = {"wall_s": round(time.time() - t0, 1),
                        "peak_rss_mb": round(_peak_rss_mb(), 1)}
        print(f"[etl] {split}: {stats[split]}", flush=True)
    return stats


def _make_config(root, batch_size, workers):
    from custom_yolo_tpu.config import Config
    cfg = Config.from_yaml(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "config.yaml"))
    cfg.data.processed_dir = os.path.join(root, "processed", "parquet")
    cfg.data.train_parquet = "train"
    cfg.data.val_parquet = "val"
    cfg.data.train_images = os.path.join(root, "raw", "images", "train")
    cfg.data.val_images = os.path.join(root, "raw", "images", "val")
    cfg.data.num_workers = workers
    cfg.model.input_size = [640, 640]
    cfg.training.batch_size = batch_size
    cfg.training.is_test = False
    return cfg


def phase_loader(root, batch_size, workers, n_batches=200):
    from custom_yolo_tpu.data.loader import get_data_loaders
    cfg = _make_config(root, batch_size, workers)
    train_loader, _ = get_data_loaders(cfg)
    it = iter(train_loader)
    # warm up worker pool + first prefetch window
    next(it)
    t0 = time.time()
    n = 0
    for _ in range(n_batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_loader)
            batch = next(it)
        n += batch["image"].shape[0]
    dt = time.time() - t0
    stats = {"batches": n_batches, "images": n, "wall_s": round(dt, 1),
             "img_per_s": round(n / dt, 1),
             "peak_rss_mb": round(_peak_rss_mb(), 1),
             "dataset_len": len(train_loader.dataset)}
    print(f"[loader] {stats}", flush=True)
    return stats


def phase_train(root, batch_size, workers, steps):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/custom_yolo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.data.loader import get_data_loaders
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.train.trainer import Trainer

    cfg = _make_config(root, batch_size, workers)
    # category ids are 100..100+NUM_CLASSES-1 and the dataset uses raw ids
    # as labels (reference quirk) — the class axis must cover them
    cfg.model.num_classes = 100 + NUM_CLASSES
    preset = PRESETS["x"]
    policy = resolve_policy("bfloat16")
    model = YoloModel(width=tuple(preset["width"]),
                      depth=tuple(preset["depth"]),
                      csp=tuple(preset["csp"]),
                      num_classes=cfg.model.num_classes, policy=policy)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 640, 640, 3),
                                     policy.compute_dtype), train=False)
    trainer = Trainer(cfg, model, variables)
    train_loader, _ = get_data_loaders(cfg)

    ekey = jax.random.key(7)
    batches = trainer._device_batches(train_loader, ekey, train=True)
    # compile on the first batch
    _, _, batch = next(batches)
    trainer.state, metrics = trainer.train_step(trainer.state, batch)
    jax.block_until_ready(metrics["total_loss"])
    t0 = time.time()
    t_win = t0
    n = 0
    losses = []
    for i in range(steps):
        try:
            _, _, batch = next(batches)
        except StopIteration:  # epoch boundary — restart the loader
            batches = trainer._device_batches(train_loader, ekey, train=True)
            _, _, batch = next(batches)
        trainer.state, metrics = trainer.train_step(trainer.state, batch)
        n += batch_size
        if (i + 1) % 100 == 0:
            loss = float(metrics["total_loss"])
            losses.append(round(loss, 4))
            now = time.time()
            win = 100 * batch_size / (now - t_win)
            t_win = now
            print(f"[train] step {i+1}/{steps} loss={loss:.4f} "
                  f"({n / (now - t0):.1f} img/s cum, {win:.1f} window, "
                  f"rss {_peak_rss_mb():.0f} MB)", flush=True)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.time() - t0
    stats = {"steps": steps, "batch": batch_size, "wall_s": round(dt, 1),
             "img_per_s": round(n / dt, 1), "losses_per_100": losses,
             "peak_rss_mb": round(_peak_rss_mb(), 1)}
    print(f"[train] {stats}", flush=True)
    return stats


def phase_fit_chunk(steps, config_path="configs/soak_coco_scale.yaml"):
    """One resumable chunk of COCO-scale training (round 3): restore the
    latest checkpoint (if any), run ``steps`` real train steps on the live
    loader, save a new checkpoint, exit.

    Chunked because the tunneled chip's relay client accumulates host RSS
    per dispatch (~22 GB / 1000 steps — docs/SOAK.md; NOT a framework
    leak, verified flat on the CPU backend): a multi-epoch run in one
    process would exhaust host RAM. The chunk loop doubles as a
    fault-tolerance soak — every chunk is a full crash-and-resume cycle
    through orbax. Drive with::

        for i in $(seq 1 N); do
            python scripts/soak.py --phases fit_chunk --steps 3000
        done
        python scripts/evaluate.py --config configs/soak_coco_scale.yaml \
            --coco_map

    Reference workload: COCO-2017 training
    (/root/reference/config.yaml:21-39, src/training/train_model.py).
    """
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/custom_yolo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from custom_yolo_tpu.config import Config
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.data.loader import get_data_loaders
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.train.trainer import Trainer
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager

    cfg = Config.from_yaml(config_path)
    policy = resolve_policy(cfg.training.sharding.precision)
    model = YoloModel(width=tuple(cfg.model.width),
                      depth=tuple(cfg.model.depth),
                      csp=tuple(cfg.model.csp),
                      num_classes=cfg.model.num_classes,
                      reg_max=cfg.model.reg_max, policy=policy,
                      pallas_attention=cfg.model.pallas_attention)
    variables = model.init(jax.random.key(cfg.project.seed),
                           jnp.zeros((1, *cfg.model.input_size, 3),
                                     policy.compute_dtype), train=False)
    trainer = Trainer(cfg, model, variables)
    ckpt = CheckpointManager(cfg.checkpoint.checkpoint_dir, max_to_keep=3)
    chunk = ckpt.latest_epoch()
    if chunk is not None:
        # abstract template → restore lands directly on the local device
        template = jax.eval_shape(lambda: trainer.state)
        trainer.load_state(ckpt.restore(template))
        print(f"[fit] resumed chunk {chunk} "
              f"(global step {int(trainer.state.step)})", flush=True)
    chunk = -1 if chunk is None else chunk

    train_loader, _ = get_data_loaders(cfg)
    ekey = jax.random.key(cfg.project.seed + chunk + 1)
    batches = trainer._device_batches(train_loader, ekey, train=True)
    _, _, batch = next(batches)
    trainer.state, metrics = trainer.train_step(trainer.state, batch)
    jax.block_until_ready(metrics["total_loss"])
    t0 = time.time()
    losses = []
    for i in range(steps - 1):
        try:
            _, _, batch = next(batches)
        except StopIteration:
            batches = trainer._device_batches(train_loader, ekey, train=True)
            _, _, batch = next(batches)
        trainer.state, metrics = trainer.train_step(trainer.state, batch)
        if (i + 2) % 500 == 0:
            loss = float(metrics["total_loss"])
            losses.append(round(loss, 4))
            print(f"[fit] chunk {chunk + 1} step {i+2}/{steps} "
                  f"loss={loss:.4f} "
                  f"({(i + 2) * cfg.training.batch_size / (time.time() - t0):.1f} img/s, "
                  f"rss {_peak_rss_mb():.0f} MB)", flush=True)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.time() - t0
    ckpt.save(chunk + 1, jax.device_get(trainer.state))
    ckpt.wait()
    ckpt.close()
    stats = {"chunk": chunk + 1, "steps": steps,
             "global_step": int(trainer.state.step),
             "images_seen": int(trainer.state.step)
             * cfg.training.batch_size,
             "batch": cfg.training.batch_size,
             "wall_s": round(dt, 1),
             "img_per_s": round(steps * cfg.training.batch_size / dt, 1),
             "losses_per_500": losses,
             "final_loss": float(metrics["total_loss"]),
             "peak_rss_mb": round(_peak_rss_mb(), 1)}
    print(f"[fit] {stats}", flush=True)
    return stats


def phase_eval(root, batch_size, workers):
    """Full-protocol COCO mAP over the whole val split — measures the
    round-3 vectorized evaluator (eval/coco_map.py) at the 5k-image scale
    the north star requires (<5 min, VERDICT r2 #6)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/custom_yolo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from custom_yolo_tpu.eval.coco_map import COCOmAP

    rng = np.random.RandomState(0)
    n_images = 5000
    n_classes = 172
    evaluator = COCOmAP(num_classes=n_classes)
    t0 = time.time()
    for i in range(n_images):
        # GT: (M, 5) [cx, cy, w, h, cls]; dets near GT so matching does
        # real greedy work (all-miss scenes would flatter the timing)
        n_gt = rng.randint(1, 12)
        gt = np.zeros((n_gt, 5), np.float32)
        gt[:, :2] = rng.rand(n_gt, 2) * 300 + 50
        gt[:, 2:4] = rng.rand(n_gt, 2) * 80 + 12
        gt[:, 4] = rng.randint(0, n_classes, n_gt)
        n_det = rng.randint(0, 40)
        det = np.zeros((n_det, 5), np.float32)
        src = rng.randint(0, n_gt, n_det)
        det[:, :4] = gt[src, :4] + rng.randn(n_det, 4) * 8
        det[:, 2:4] = np.abs(det[:, 2:4]) + 4
        det[:, 4] = np.where(rng.rand(n_det) < 0.8, gt[src, 4],
                             rng.randint(0, n_classes, n_det))
        scores = rng.rand(n_det).astype(np.float32)
        evaluator.update(det, scores, gt, np.zeros(n_gt, bool))
    t_update = time.time() - t0
    t0 = time.time()
    res = evaluator.compute()
    t_compute = time.time() - t0
    stats = {"images": n_images, "classes": n_classes,
             "update_wall_s": round(t_update, 1),
             "compute_wall_s": round(t_compute, 1),
             "total_wall_s": round(t_update + t_compute, 1),
             "map_50_95": round(float(res["mAP_50_95"]), 4),
             "peak_rss_mb": round(_peak_rss_mb(), 1)}
    print(f"[eval] {stats}", flush=True)
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/soak_data")
    p.add_argument("--train_images", type=int, default=118287)
    p.add_argument("--val_images", type=int, default=5000)
    p.add_argument("--workers", type=int, default=max(4, os.cpu_count() - 2))
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--phases", default="gen,etl,loader")
    p.add_argument("--fit_config", default="configs/soak_coco_scale.yaml")
    p.add_argument("--out", default="/tmp/soak_stats.json")
    args = p.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for phase in args.phases.split(","):
        phase = phase.strip()
        t0 = time.time()
        if phase == "gen":
            results["gen"] = phase_gen(args.root, args.train_images,
                                       args.val_images, args.workers)
        elif phase == "etl":
            results["etl"] = phase_etl(args.root)
        elif phase == "loader":
            results["loader"] = phase_loader(args.root, args.batch_size,
                                             args.workers)
        elif phase == "train":
            results["train"] = phase_train(args.root, args.batch_size,
                                           args.workers, args.steps)
        elif phase == "fit_chunk":
            results.setdefault("fit_chunks", []).append(
                phase_fit_chunk(args.steps, args.fit_config))
        elif phase == "eval":
            results["eval"] = phase_eval(args.root, args.batch_size,
                                         args.workers)
        else:
            raise SystemExit(f"unknown phase {phase}")
        print(f"[soak] phase {phase} done in {time.time() - t0:.1f}s",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
