#!/bin/bash
# Round-5 queue, part 2 (restart after the fp32 first-compile relay stall).
# Same serialization discipline as r5_queue.sh; adds a stall-retry wrapper:
# if a task produces no new log output for STALL_S seconds, kill and retry
# once (the documented relay first-touch cure, CLAUDE.md round-4 notes).
set -u
cd /root/repo
LOG=/tmp/r5_queue2.log
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # name, cmd... — with one stall-retry
  local name=$1; shift
  local attempt
  for attempt in 1 2; do
    say "START $name (attempt $attempt): $*"
    timeout 7200 "$@" > "/tmp/r5_${name}.log" 2>&1 &
    local pid=$!
    local last_size=-1 stalled=0 quiet=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local size
      size=$(stat -c %s "/tmp/r5_${name}.log" 2>/dev/null || echo 0)
      if [ "$size" = "$last_size" ]; then
        quiet=$((quiet + 60))
      else
        quiet=0
      fi
      last_size=$size
      # 25 min with zero output = the relay stall; first compile through
      # the relay is <5 min, epochs print every few seconds
      if [ "$quiet" -ge 1500 ]; then
        say "STALL $name (no output ${quiet}s) — killing pid $pid"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        stalled=1
        break
      fi
    done
    if [ "$stalled" = 0 ]; then
      wait "$pid" 2>/dev/null
      say "DONE $name rc=$?"
      return
    fi
  done
  say "GAVEUP $name after 2 stalled attempts"
}

say "queue2 begins"

# --- Task 1b: fp32 control of the matched run (retry-wrapped) ---------------
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
for s in 1 2; do
  run quality_s$s python scripts/train.py --config configs/parity_n_quality.yaml \
      --mode single --seed $s --save_interval 10 \
      --checkpoint_dir ./dataset_parity/experiments/quality_s$s
  run matched_s$s python scripts/train.py --config configs/parity_n_matched.yaml \
      --mode single --seed $s --save_interval 10 \
      --checkpoint_dir ./dataset_parity/experiments/matched_s$s
  run sweep_quality_s$s python scripts/sweep_eval.py \
      --config configs/parity_n_quality.yaml \
      --checkpoint ./dataset_parity/experiments/quality_s$s --epochs all \
      --thresholds "0.001,0.25,0.5,0.75" --out /tmp/r5_sweep_quality_s$s.json
  run sweep_matched_s$s python scripts/sweep_eval.py \
      --config configs/parity_n_matched.yaml \
      --checkpoint ./dataset_parity/experiments/matched_s$s --epochs all \
      --thresholds "0.001,0.25,0.5" --out /tmp/r5_sweep_matched_s$s.json
done

say ALLDONE_PHASE3
touch /tmp/r5_phase3.ALLDONE
