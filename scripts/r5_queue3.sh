#!/bin/bash
# Round-5 queue, part 3: waits for r5_queue2.sh's phase-3 marker, then
# retrains matched seed-0 in bf16 with full checkpoint retention (the
# original run pre-dates the keep-all fix and lost epochs <79, hiding its
# mid-training peak) — giving the exact same-seed bf16-vs-fp32 comparison
# at every epoch. Serialized: starts only after queue2 is fully done.
set -u
cd /root/repo
LOG=/tmp/r5_queue3.log
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for /tmp/r5_phase3.ALLDONE"
while [ ! -f /tmp/r5_phase3.ALLDONE ]; do sleep 60; done

run() { # name, cmd... — same stall-retry wrapper as r5_queue2.sh
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
      if [ "$size" = "$last_size" ]; then quiet=$((quiet + 60)); else quiet=0; fi
      last_size=$size
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

run matched_s0_full python scripts/train.py \
    --config configs/parity_n_matched.yaml \
    --mode single --seed 0 --save_interval 10 \
    --checkpoint_dir ./dataset_parity/experiments/matched_s0_full
run sweep_matched_s0_full python scripts/sweep_eval.py \
    --config configs/parity_n_matched.yaml \
    --checkpoint ./dataset_parity/experiments/matched_s0_full --epochs all \
    --thresholds "0.001,0.05,0.1,0.25,0.4,0.5" \
    --out /tmp/r5_sweep_matched_s0_full.json

say ALLDONE_PHASE4
touch /tmp/r5_phase4.ALLDONE
