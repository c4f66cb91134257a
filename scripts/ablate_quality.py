#!/usr/bin/env python
"""Ablate the training-quality extensions on the gen2 fixture (VERDICT r3 #3).

The reference trains plain (src/training/train_model.py:234-253 — no EMA, no
warmup, no mosaic/mixup, nearest-center assignment). This framework ships
those as opt-in extensions; this driver makes each one earn its keep: a
run-matrix over {assigner, EMA, warmup, mosaic, mixup, combo}, each cell
trained with ``scripts/train.py`` and scored with ``scripts/evaluate.py
--coco_map`` on the UNSEEN val split — val mAP@50:95 per cell.

Cells (all n-preset, dataset_gen2 256/85 imgs, identical seed/budget):

  nearest   reference-parity assignment, no extensions (the true baseline)
  tal       task-aligned assignment only — our shipped assigner
  tal+ema / tal+warmup / tal+mosaic / tal+mixup — one extension each
  combo     tal + ema + warmup + mosaic + mixup

Runs are strictly serialized (single TPU chip — the relay corrupts timing
AND queueing when two jobs overlap, CLAUDE.md). Results are written to
``<out>/ablation.json`` and a markdown table to stdout; the winning cell is
shipped as ``configs/quality_n.yaml``.

    python scripts/ablate_quality.py --base configs/ablate_gen2_n.yaml \
        --epochs 60 --out dataset_gen2/experiments/ablate
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = {
    "nearest":    {"assigner": "nearest"},
    "tal":        {"assigner": "tal"},
    "tal+ema":    {"assigner": "tal", "ema_decay": 0.999, "ema_tau": 200.0},
    "tal+warmup": {"assigner": "tal", "warmup_steps": 100},
    "tal+mosaic": {"assigner": "tal", "mosaic": 0.5, "close_mosaic": 10},
    "tal+mixup":  {"assigner": "tal", "mixup": 0.15},
    "combo":      {"assigner": "tal", "ema_decay": 0.999, "ema_tau": 200.0,
                   "warmup_steps": 100, "mosaic": 0.5, "close_mosaic": 10,
                   "mixup": 0.15},
}


def write_cell_config(base_yaml: str, cell: str, overrides: dict,
                      epochs: int, out_dir: str) -> str:
    """Materialize one cell's YAML: base + training-section overrides +
    its own checkpoint dir. Plain line-level rewrite (the base config keeps
    one `key: value` per line — configs/ablate_gen2_n.yaml)."""
    with open(base_yaml) as f:
        lines = f.read().splitlines(keepends=True)
    ckpt_dir = os.path.join(out_dir, f"ckpt_{cell.replace('+', '_')}")
    keys = dict(overrides)
    keys["epochs"] = epochs
    rewritten = []
    for ln in lines:
        m = re.match(r"^(\s+)([a-z_]+):", ln)
        if m and m.group(2) in keys:
            ln = f"{m.group(1)}{m.group(2)}: {keys.pop(m.group(2))}\n"
        elif m and m.group(2) == "checkpoint_dir":
            ln = f"{m.group(1)}checkpoint_dir: \"{ckpt_dir}\"\n"
        rewritten.append(ln)
    # any override key missing from the template is appended to training:
    if keys:
        out2 = []
        for ln in rewritten:
            out2.append(ln)
            if ln.startswith("training:"):
                for k, v in keys.items():
                    out2.append(f"  {k}: {v}\n")
        rewritten = out2
    path = os.path.join(out_dir, f"{cell.replace('+', '_')}.yaml")
    with open(path, "w") as f:
        f.write("".join(rewritten))
    return path


def run_cell(cfg_path: str, log_path: str) -> dict:
    env = dict(os.environ)
    with open(log_path, "w") as log:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "train.py"),
             "--config", cfg_path, "--mode", "single", "--device", "tpu"],
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO)
        if r.returncode != 0:
            raise RuntimeError(f"train failed for {cfg_path} — see {log_path}")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "evaluate.py"),
             "--config", cfg_path, "--coco_map", "--device", "tpu"],
            capture_output=True, text=True, env=env, cwd=REPO)
        log.write(r.stdout + r.stderr)
    if r.returncode != 0:
        raise RuntimeError(f"evaluate failed for {cfg_path}:\n{r.stdout}"
                           f"\n{r.stderr}")
    metrics = {}
    for line in r.stdout.splitlines():
        m = re.match(r"\s+(mAP_[a-z0-9_]+|precision|recall|f1"
                     r"|AR_[0-9]+): ([0-9.eE+-]+)", line)
        if m:
            metrics[m.group(1)] = float(m.group(2))
    return metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="configs/ablate_gen2_n.yaml")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--out", default="dataset_gen2/experiments/ablate")
    p.add_argument("--cells", default=None,
                   help="comma-separated subset (default: all)")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    cells = (args.cells.split(",") if args.cells else list(CELLS))
    results_path = os.path.join(args.out, "ablation.json")
    results = {}
    if os.path.exists(results_path):   # resumable across interruptions
        results = json.load(open(results_path))

    for cell in cells:
        if cell in results:
            print(f"[ablate] {cell}: cached {results[cell]}")
            continue
        cfg = write_cell_config(args.base, cell, CELLS[cell], args.epochs,
                                args.out)
        log = os.path.join(args.out, f"{cell.replace('+', '_')}.log")
        print(f"[ablate] {cell}: training ({cfg}) → {log}", flush=True)
        metrics = run_cell(cfg, log)
        results[cell] = metrics
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[ablate] {cell}: {metrics}", flush=True)

    hdr = ["cell", "mAP_50_95", "mAP_50", "mAP_75"]
    print("\n| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for cell in cells:
        r = results.get(cell, {})
        print(f"| {cell} | " + " | ".join(
            f"{r.get(k, float('nan')):.4f}" for k in hdr[1:]) + " |")


if __name__ == "__main__":
    main()
