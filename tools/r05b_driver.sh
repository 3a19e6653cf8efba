#!/usr/bin/env bash
# v2-pipeline driver: waits for the attempt-1 driver (and its extras) to
# release the TPU, then babysits tools/r05b_quality_run.sh to completion
# (stage-resume retries), then reruns bench.py once so the end-of-round
# driver bench hits a warm cache + fresh backstop. Launch detached:
#   setsid nohup tools/r05b_driver.sh [wait_pid] > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=logs/r05b_quality
mkdir -p "$LOG"
note() { echo "[r05b-driver $(date +%H:%M:%S)] $*" >> "$LOG/driver.log"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID (attempt-1 driver incl. extras)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  note "pid $WAIT_PID exited -- TPU free"
fi

resume_stage() {
  local s
  s=$(grep -ho 'stage [0-9]* FAILED' "$LOG"/driver_run*.log 2>/dev/null | tail -1 | grep -o '[0-9]*')
  echo "${s:-1}"
}

TRIES=0
MAX_TRIES=6
while [ ! -f "$LOG/DONE" ] && [ "$TRIES" -lt "$MAX_TRIES" ]; do
  TRIES=$((TRIES + 1))
  S=$(resume_stage)
  note "pipeline attempt $TRIES from stage $S"
  bash tools/r05b_quality_run.sh "$S" >> "$LOG/driver_run$TRIES.log" 2>&1
  note "attempt $TRIES exited rc=$?"
done

if [ -f "$LOG/DONE" ]; then
  note "v2 pipeline COMPLETE -> final bench re-warm"
else
  note "v2 pipeline INCOMPLETE after $MAX_TRIES attempts -> bench anyway"
fi
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_tpu_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
timeout 1800 python bench.py >> "$LOG/final_bench.log" 2>&1
note "final bench exited rc=$?"
note "r05b driver done"
