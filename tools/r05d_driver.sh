#!/usr/bin/env bash
# Post-extras driver (round 5, stage D): waits for the r05c extras driver,
# then lands the remaining executed-evidence items on the v2 checkpoints:
#   1. tokenizer eval WITHOUT --ema (EMA-vs-raw delta for EVAL_r05.json --
#      VERDICT r4 item 7 asked for the comparison, not just the EMA number),
#   2. tokenizer eval at 128 batches (4x the token sample, fairer pooled
#      codebook-usage reading than 32 batches of a 2^18 vocab),
#   3. the missing remat=dots MFU point (its one attempt died on a
#      remote-compile drop).
# Launch detached:  setsid nohup tools/r05d_driver.sh <wait_pid> > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=logs/r05d_extras
mkdir -p "$LOG"
note() { echo "[r05d $(date +%H:%M:%S)] $*" >> "$LOG/driver.log"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  note "waiting for pid $WAIT_PID (r05c driver)"
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

run eval_tok_raw 1800 python -m open_genie_tpu.cli eval tokenizer \
  --config configs/r05b_tokenizer.yaml --ckpt checkpoints/r05b_tok \
  --max-batches 32
run eval_tok_ema128 2400 python -m open_genie_tpu.cli eval tokenizer \
  --config configs/r05b_tokenizer.yaml --ckpt checkpoints/r05b_tok \
  --max-batches 128 --ema
run mfu_dots 1800 python tools/r04_mfu.py --modes dots
note "r05d done"
touch "$LOG/DONE"
