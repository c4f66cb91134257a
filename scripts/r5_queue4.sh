#!/bin/bash
# Round-5 queue, part 4 (fresh-container restart: /tmp and all fixture
# datasets were wiped mid-round; phases 2-3 of r5_queue2.sh never ran).
# Re-runs the remaining VERDICT r4 tasks in value order with a HARD
# DEADLINE so the queue cannot collide with the driver's end-of-round
# bench run (the r4 622-regression failure mode):
#   1. quality-recipe seeds 1,2 (+sweeps)  — error bars on the headline
#   2. x-scale gen2 quality runs           — VERDICT task 4
#   3. matched-recipe seeds 1,2 (+sweeps)  — error bars on the matched cell
#   4. matched_s0_full                     — bf16 peak-epoch cell
# Waits for /tmp/fixtures.DONE and /tmp/bench1.DONE (never two TPU jobs).
set -u
cd /root/repo
LOG=/tmp/r5_queue4.log
DEADLINE_TS=$(( $(date +%s) + ${Q4_BUDGET_S:-5400} ))
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

run() { # name, est_s, cmd... — stall-retry wrapper + deadline gate
  local name=$1 est=$2; shift 2
  if [ "$(left)" -lt "$est" ]; then
    say "SKIP $name (needs ~${est}s, only $(left)s left)"
    return 1
  fi
  local attempt
  for attempt in 1 2; do
    say "START $name (attempt $attempt, $(left)s left): $*"
    timeout "$(left)" "$@" > "/tmp/r5_${name}.log" 2>&1 &
    local pid=$!
    local last_size=-1 stalled=0 quiet=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 30
      local size
      size=$(stat -c %s "/tmp/r5_${name}.log" 2>/dev/null || echo 0)
      if [ "$size" = "$last_size" ]; then quiet=$((quiet + 30)); else quiet=0; fi
      last_size=$size
      if [ "$quiet" -ge 1200 ]; then
        say "STALL $name (no output ${quiet}s) — killing pid $pid"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        stalled=1; break
      fi
    done
    if [ "$stalled" = 0 ]; then
      wait "$pid" 2>/dev/null
      say "DONE $name rc=$?"
      return 0
    fi
  done
  say "GAVEUP $name after 2 stalled attempts"
  return 1
}

say "queue4 begins; deadline in $(left)s"
while [ ! -f /tmp/fixtures.DONE ]; do sleep 20; done
say "fixtures ready"
while [ ! -f /tmp/bench1.DONE ]; do sleep 20; done
say "bench check done — TPU free"

# --- 1. quality-recipe seeds (headline error bars) --------------------------
for s in 1 2; do
  run quality_s$s 2100 python scripts/train.py \
      --config configs/parity_n_quality.yaml \
      --mode single --seed $s --save_interval 10 \
      --checkpoint_dir ./dataset_parity/experiments/quality_s$s \
  && run sweep_quality_s$s 600 python scripts/sweep_eval.py \
      --config configs/parity_n_quality.yaml \
      --checkpoint ./dataset_parity/experiments/quality_s$s --epochs all \
      --thresholds "0.001,0.25,0.5,0.75" \
      --out docs/results/r5_sweep_quality_s$s.json
done

# --- 2. x-scale gen2 quality-recipe comparison (VERDICT task 4) -------------
run quality_gen2_x 2700 python scripts/train.py \
    --config configs/quality_gen2_x.yaml --mode single
run quality_gen2_xtpu 2700 python scripts/train.py \
    --config configs/quality_gen2_xtpu.yaml --mode single

# --- 3. matched-recipe seeds ------------------------------------------------
for s in 1 2; do
  run matched_s$s 2100 python scripts/train.py \
      --config configs/parity_n_matched.yaml \
      --mode single --seed $s --save_interval 10 \
      --checkpoint_dir ./dataset_parity/experiments/matched_s$s \
  && run sweep_matched_s$s 600 python scripts/sweep_eval.py \
      --config configs/parity_n_matched.yaml \
      --checkpoint ./dataset_parity/experiments/matched_s$s --epochs all \
      --thresholds "0.001,0.25,0.5" \
      --out docs/results/r5_sweep_matched_s$s.json
done

# --- 4. matched seed-0 full-retention bf16 rerun ----------------------------
run matched_s0_full 2100 python scripts/train.py \
    --config configs/parity_n_matched.yaml \
    --mode single --seed 0 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/matched_s0_full \
&& run sweep_matched_s0_full 600 python scripts/sweep_eval.py \
    --config configs/parity_n_matched.yaml \
    --checkpoint ./dataset_parity/experiments/matched_s0_full --epochs all \
    --thresholds "0.001,0.05,0.1,0.25,0.4,0.5" \
    --out docs/results/r5_sweep_matched_s0_full.json

say ALLDONE_Q4
touch /tmp/r5_q4.ALLDONE
