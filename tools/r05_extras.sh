#!/usr/bin/env bash
# Round-5 post-pipeline chip work (VERDICT r4 items 2/3/4/6), run AFTER
# tools/r05_quality_run.sh releases the TPU -- one process at a time on
# the tunneled chip:
#   1. PARITY_r05.json      re-pin CPU<->TPU parity on the post-LFQ-fix code
#   2. r04_mfu.py           remat-mode A/B (full/dots/off) at b4f8
#   3. r04_scaling.py       128px / T=32 scaling points
#   4. bench.py             full live bench -> fresh .bench_results.json
# Stages are independent; pass a start stage (1-4) to skip earlier ones.
set -uo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_tpu_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

LOG=logs/r05_quality
mkdir -p "$LOG"
START=${1:-1}

stage() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
run_stage() {  # run_stage <num> <timeout_s> <log> <cmd...>
  local num=$1 tmo=$2 log=$3; shift 3
  if [ "$START" -gt "$num" ]; then stage "extras $num: SKIP (start=$START)"; return 0; fi
  stage "extras $num: $*"
  timeout "$tmo" "$@" 2>&1 | tee "$LOG/$log"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    stage "extras $num FAILED (rc=$rc) -- continuing (stages independent)"
  fi
}

run_stage 1 2400 x1_parity.log python tools/parity_check.py --out PARITY_r05.json
run_stage 2 1800 x2_mfu.log    python tools/r04_mfu.py
run_stage 3 2400 x3_scaling.log python tools/r04_scaling.py
run_stage 4 1500 x4_bench.log  python bench.py
stage "extras done"
