#!/bin/bash
# Round-5 serialized TPU experiment queue (one TPU job at a time — the relay
# serializes and concurrent numbers are garbage, CLAUDE.md).
# Tasks map to VERDICT r4 "next round" items 1, 3, 4, 5.
set -u
cd /root/repo
LOG=/tmp/r5_queue.log
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # name, cmd...
  local name=$1; shift
  say "START $name: $*"
  timeout 7200 "$@" > "/tmp/r5_${name}.log" 2>&1
  say "DONE $name rc=$?"
}

say "queue begins"

# --- Task 1a + 5: ours-matched seed0, checkpoints every 10 epochs -----------
run matched_s0 python scripts/train.py --config configs/parity_n_matched.yaml \
    --mode single --seed 0 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/matched_s0

# --- Tasks 1, 3, 5: ours-quality seed0, checkpoints every 10 epochs ---------
run quality_s0 python scripts/train.py --config configs/parity_n_quality.yaml \
    --mode single --seed 0 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/quality_s0

# --- Task 1a: checkpoint sweep for the matched run (best-mAP selection) -----
run sweep_matched_s0 python scripts/sweep_eval.py \
    --config configs/parity_n_matched.yaml \
    --checkpoint ./dataset_parity/experiments/matched_s0 --epochs all \
    --thresholds "0.001,0.05,0.1,0.25,0.4,0.5" \
    --out /tmp/r5_sweep_matched_s0.json

# --- Task 3: threshold sweep for the quality run (greedy operating point) ---
run sweep_quality_s0 python scripts/sweep_eval.py \
    --config configs/parity_n_quality.yaml \
    --checkpoint ./dataset_parity/experiments/quality_s0 --epochs all \
    --thresholds "0.001,0.05,0.1,0.25,0.4,0.5,0.6,0.75" \
    --out /tmp/r5_sweep_quality_s0.json

# --- Task 1b: fp32 control of the matched run (bf16 isolation, same seed) ---
run matched_fp32 python scripts/train.py \
    --config configs/parity_n_matched_fp32.yaml \
    --mode single --seed 0 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/matched_fp32
run sweep_matched_fp32 python scripts/sweep_eval.py \
    --config configs/parity_n_matched_fp32.yaml \
    --checkpoint ./dataset_parity/experiments/matched_fp32 --epochs all \
    --thresholds "0.001,0.05,0.1,0.25,0.4,0.5" \
    --out /tmp/r5_sweep_matched_fp32.json

say ALLDONE_PHASE1
touch /tmp/r5_phase1.ALLDONE

# --- Task 4: x-scale quality-recipe comparison on gen2 ----------------------
run quality_gen2_x python scripts/train.py \
    --config configs/quality_gen2_x.yaml --mode single
run quality_gen2_xtpu python scripts/train.py \
    --config configs/quality_gen2_xtpu.yaml --mode single

say ALLDONE_PHASE2
touch /tmp/r5_phase2.ALLDONE

# --- Task 5: seeds 1,2 for both recipes --------------------------------------
run quality_s1 python scripts/train.py --config configs/parity_n_quality.yaml \
    --mode single --seed 1 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/quality_s1
run matched_s1 python scripts/train.py --config configs/parity_n_matched.yaml \
    --mode single --seed 1 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/matched_s1
run sweep_quality_s1 python scripts/sweep_eval.py \
    --config configs/parity_n_quality.yaml \
    --checkpoint ./dataset_parity/experiments/quality_s1 --epochs all \
    --thresholds "0.001,0.25" --out /tmp/r5_sweep_quality_s1.json
run sweep_matched_s1 python scripts/sweep_eval.py \
    --config configs/parity_n_matched.yaml \
    --checkpoint ./dataset_parity/experiments/matched_s1 --epochs all \
    --thresholds "0.001,0.25" --out /tmp/r5_sweep_matched_s1.json
run quality_s2 python scripts/train.py --config configs/parity_n_quality.yaml \
    --mode single --seed 2 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/quality_s2
run matched_s2 python scripts/train.py --config configs/parity_n_matched.yaml \
    --mode single --seed 2 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/matched_s2
run sweep_quality_s2 python scripts/sweep_eval.py \
    --config configs/parity_n_quality.yaml \
    --checkpoint ./dataset_parity/experiments/quality_s2 --epochs all \
    --thresholds "0.001,0.25" --out /tmp/r5_sweep_quality_s2.json
run sweep_matched_s2 python scripts/sweep_eval.py \
    --config configs/parity_n_matched.yaml \
    --checkpoint ./dataset_parity/experiments/matched_s2 --epochs all \
    --thresholds "0.001,0.25" --out /tmp/r5_sweep_matched_s2.json

say ALLDONE_PHASE3
touch /tmp/r5_phase3.ALLDONE
