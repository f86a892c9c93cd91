#!/bin/bash
# Retry loop for scripts/train_clock.py (VERDICT r4 #1).
#
# The axon TPU tunnel drops every few minutes to ~1.5 h and can also HANG
# (a dead tunnel wait never raises), so each invocation runs under
# `timeout` AND a progress watchdog: if neither the log nor any training
# artifact under the run dir gains mtime for WATCHDOG_S seconds, the
# invocation is killed by recorded PID (never by pattern) and retried.
# train_clock.py itself is crash-resumable (clock_state.json segments,
# --ckpt_every mid-stage checkpoints, persistent XLA compile cache), so
# every retry resumes rather than restarts.
#
# Usage: bash scripts/clock_loop.sh  (env: APNERF_CLOCK_* pass through)
set -u
cd "$(dirname "$0")/.."
WORK="${APNERF_CLOCK_DIR:-/tmp/apnerf_clock}"
LOG="$WORK/clock.log"
RUNDIR="$WORK/logs/clock400"
WATCHDOG_S="${APNERF_CLOCK_WATCHDOG:-1500}"   # > worst-case compile (490 s)
MAX_TRIES="${APNERF_CLOCK_TRIES:-40}"
mkdir -p "$WORK"

newest_mtime() {
  local best=0 t
  for p in "$LOG" "$RUNDIR"; do
    [ -e "$p" ] || continue
    t=$(find "$p" -type f -printf '%T@\n' 2>/dev/null | sort -rn | head -1)
    t=${t%%.*}
    [ -n "$t" ] && [ "$t" -gt "$best" ] && best=$t
  done
  echo "$best"
}

probe_tunnel() {
  timeout 240 python -c "
import numpy as np, jax
np.asarray(jax.numpy.ones((8, 8)).sum())
print('tunnel ok', flush=True)
" >> "$LOG" 2>&1
}

for i in $(seq 1 "$MAX_TRIES"); do
  # don't start (or restart) the trainer into a dead tunnel: backend init
  # HANGS rather than erroring, which burns a full watchdog cycle
  until probe_tunnel; do
    echo "[clock_loop] tunnel down $(date -u +%FT%TZ) — waiting 120s" >> "$LOG"
    sleep 120
  done
  echo "=== clock_loop invocation $i $(date -u +%FT%TZ) ===" >> "$LOG"
  timeout 5400 python scripts/train_clock.py >> "$LOG" 2>&1 &
  pid=$!
  echo "$pid" > "$WORK/clock.pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s); last=$(newest_mtime)
    if [ "$last" -gt 0 ] && [ $((now - last)) -gt "$WATCHDOG_S" ]; then
      echo "[clock_loop] stall ${WATCHDOG_S}s — killing $pid" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  echo "[clock_loop] invocation $i exited rc=$rc" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "[clock_loop] DONE after $i invocation(s)" >> "$LOG"
    exit 0
  fi
  sleep 15
done
echo "[clock_loop] EXHAUSTED $MAX_TRIES tries" >> "$LOG"
exit 1
