#!/usr/bin/env bash
# Post-pipeline extras driver (round 5, stage C): waits for the r05b
# driver (v2 quality pipeline + its final bench) to release the TPU, then
#   1. parity-merges the two configs whose TPU children timed out in the
#      attempt-1 run (tokenize_decode, rollout) into PARITY_r05.json,
#   2. finishes the scaling sweep's train points (T=32 / 128px train died
#      on the extras budget; incremental persistence now keeps progress),
#   3. runs one last full bench.py so the end-of-round driver bench hits
#      the warmest possible cache + freshest backstop.
# Launch detached:  setsid nohup tools/r05c_driver.sh <wait_pid> > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=logs/r05c_extras
mkdir -p "$LOG"
note() { echo "[r05c $(date +%H:%M:%S)] $*" >> "$LOG/driver.log"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID (r05b driver)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  note "pid $WAIT_PID exited -- TPU free"
fi

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_tpu_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  note "start $name: $*"
  timeout "$tmo" "$@" >> "$LOG/$name.log" 2>&1
  note "$name exited rc=$?"
}

run parity 3600 python tools/parity_check.py --merge \
  --configs tokenize_decode,rollout --timeout 1200 --out PARITY_r05.json
run scaling 3000 python tools/r04_scaling.py
BENCH_BUDGET_S=1700 run bench 1800 python bench.py
note "r05c done"
touch "$LOG/DONE"
