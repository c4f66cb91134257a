#!/bin/bash
# Round-5 queue, part 5: after queue4's deadline drains (it skips the
# x-scale runs when <45 min remain), use the freed TPU slot for VERDICT
# task 4's primary cell — quality_gen2_x (TAL+EMA at 57M params, 200
# epochs, save every 20) — killed at its own hard deadline so the
# driver's end-of-round bench never contends, then sweep whatever
# checkpoints exist (partial-epoch cells are still informative).
set -u
cd /root/repo
LOG=/tmp/r5_queue5.log
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
TRAIN_DEADLINE_TS=$(( $(date +%s) + ${Q5_TRAIN_BUDGET_S:-4200} ))

say "waiting for /tmp/r5_q4.ALLDONE"
while [ ! -f /tmp/r5_q4.ALLDONE ]; do sleep 20; done
left=$(( TRAIN_DEADLINE_TS - $(date +%s) ))
if [ "$left" -lt 600 ]; then
  say "SKIP quality_gen2_x (only ${left}s before train deadline)"
  touch /tmp/r5_q5.ALLDONE
  exit 0
fi

say "START quality_gen2_x (${left}s train budget)"
timeout "$left" python scripts/train.py \
    --config configs/quality_gen2_x.yaml --mode single \
    > /tmp/r5_quality_gen2_x.log 2>&1
say "DONE quality_gen2_x rc=$? (124 = deadline kill, checkpoints kept)"

say "START sweep_gen2_x"
timeout 900 python scripts/sweep_eval.py \
    --config configs/quality_gen2_x.yaml \
    --checkpoint ./dataset_gen2/experiments/x_quality_checkpoints \
    --epochs all --thresholds "0.001,0.25,0.5" \
    --out docs/results/r5_sweep_gen2_x.json \
    > /tmp/r5_sweep_gen2_x.log 2>&1
say "DONE sweep_gen2_x rc=$?"

say ALLDONE_Q5
touch /tmp/r5_q5.ALLDONE
