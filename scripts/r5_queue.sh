#!/bin/bash
# Round-5 post-clock on-chip measurement queue.
#
# The single TPU chip is occupied by the train-clock run (clock_loop.sh)
# for ~2 h; this script waits for it to release the chip, then runs the
# round-5 measurement battery in priority order (VERDICT r4 #2/#3/#4/#7),
# logging everything to /tmp/r5_measure.log:
#   1. sweep_r5      — operating-point sweep toward the 5x north star
#   2. stage-2 step  — featmlp_train on/off A/B (profile_stage2.py)
#   3. stage-1 step  — scatter bf16 on/off A/B (bench_stage1.py)
#   4. TPU kernel exactness (tests/test_tpu_kernels.py)
#   5. compile-envelope sweep re-run (new pow2 budget members)
#
# Each step probes the tunnel first (it drops every few minutes to ~1.5 h)
# and runs under `timeout` so one hung step cannot starve the rest.
#
# Usage: CLOCK_LOOP_PID=<pid> bash scripts/r5_queue.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_measure.log
CLOCK_LOG=/tmp/apnerf_clock/clock.log
LOOP_PID="${CLOCK_LOOP_PID:-0}"

say() { echo "[r5q $(date -u +%FT%TZ)] $*" >> "$LOG"; }

probe_tunnel() {
  timeout 240 python -c "
import numpy as np, jax
np.asarray(jax.numpy.ones((8, 8)).sum())
" >> /dev/null 2>&1
}

wait_tunnel() {
  until probe_tunnel; do
    say "tunnel down — waiting 120s"
    sleep 120
  done
}

run_step() {
  local name=$1 to=$2; shift 2
  wait_tunnel
  say "=== $name start (timeout ${to}s)"
  timeout "$to" "$@" >> "$LOG" 2>&1
  say "=== $name rc=$?"
}

say "queue armed; waiting for the clock loop (pid $LOOP_PID) to finish"
while true; do
  if grep -q 'clock_loop\] \(DONE\|EXHAUSTED\)' "$CLOCK_LOG" 2>/dev/null; then
    say "clock loop finished ($(grep -o 'clock_loop\] \(DONE\|EXHAUSTED\).*' "$CLOCK_LOG" | tail -1))"
    break
  fi
  if [ "$LOOP_PID" != 0 ] && ! kill -0 "$LOOP_PID" 2>/dev/null; then
    say "clock loop pid $LOOP_PID gone without DONE marker — chip assumed free"
    break
  fi
  sleep 60
done

run_step sweep_r5 6000 python scripts/sweep_r5.py
run_step stage2_featmlp_on 2400 env APNERF_FEATMLP=1 python scripts/profile_stage2.py
run_step stage2_featmlp_off 2400 env APNERF_FEATMLP=0 python scripts/profile_stage2.py
run_step stage1_default 2400 python scripts/bench_stage1.py
run_step stage1_scatter_bf16 2400 env APNERF_SCATTER_BF16=1 python scripts/bench_stage1.py
run_step stage1_profile 2400 python scripts/profile_stage1.py
run_step stage1_components 1800 python scripts/profile_stage1c.py
run_step tpu_kernels 2400 env APNERF_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q
run_step compile_sweep 5400 python scripts/compile_sweep.py
say "battery complete"
touch /tmp/r5_measure.done
