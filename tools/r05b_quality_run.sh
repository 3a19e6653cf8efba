#!/usr/bin/env bash
# Round-5 FLAGSHIP quality run v2: the r05 pipeline on the REALISTIC-MOTION
# corpus (motion_scale=0.4) with the round-5 fixes live end to end:
#   * bit-balance anneal to floor (configs/r05b_tokenizer.yaml) -- at
#     convergence the balance term was 2-3x the rec loss,
#   * stage-5 full-genie warm start (model.genie_ckpt) -- attempt 1
#     re-initialized the latent action randomly and the measured
#     action_to_noise_ratio came out 1.006 (actions ignored),
#   * controllability sampled from the emitted-id pool,
#   * stage-8 rollout replays real emitted actions (--actions-from-data).
# Writes EVAL_r05.json (preserving attempt 1's numbers under
# `fast_motion_attempt`) + samples/r05_rollout.mp4.
#
# Run on the TPU box with NO other TPU process:
#   bash tools/r05b_quality_run.sh [start_stage]
set -uo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_tpu_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

LOG=logs/r05b_quality
mkdir -p "$LOG" samples
START=${1:-1}

stage() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
run_stage() {  # run_stage <num> <timeout_s> <log> <cmd...>
  local num=$1 tmo=$2 log=$3; shift 3
  if [ "$START" -gt "$num" ]; then stage "stage $num: SKIP (start=$START)"; return 0; fi
  stage "stage $num: $*"
  timeout "$tmo" "$@" 2>&1 | tee "$LOG/$log"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    stage "stage $num FAILED (rc=$rc) -- resume with: bash tools/r05b_quality_run.sh $num"
    exit "$rc"
  fi
}

if [ ! -d data/r05b/videos/Coinrun/train ]; then
  stage "0: generate realistic-motion mp4 dataset (CPU)"
  PYTHONPATH= JAX_PLATFORMS=cpu python -m open_genie_tpu.cli make-data \
    --root data/r05b/videos --num-videos 1152 --timeout 32 --size 64 \
    --motion-scale 0.4 2>&1 | tee "$LOG/00_data.log"
fi

run_stage 1 7200 01_tok.log \
  python -m open_genie_tpu.cli train tokenizer --config configs/r05b_tokenizer.yaml --resume

run_stage 2 5400 02_genie.log \
  python -m open_genie_tpu.cli train genie --config configs/r05b_genie.yaml --resume

run_stage 3 2400 03_shards.log \
  python -m open_genie_tpu.cli tokenize-data \
    --config configs/r05b_genie.yaml --ckpt checkpoints/r05b_genie \
    --out data/r05b/tokens

run_stage 4 5400 04_dyn.log \
  python -m open_genie_tpu.cli train dynamics --config configs/r05b_dynamics.yaml --resume

if [ "$START" -le 5 ]; then
  stage "5: derive warm-start config"
  python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/r05b_genie.yaml"))
# Full stage-2 warm start (keeps the trained latent-action codebook the
# shard-trained dynamics was conditioned on), dynamics overwritten by the
# stage-4 staged pre-training.
cfg["model"]["genie_ckpt"] = "checkpoints/r05b_genie"
cfg["model"]["dynamics_ckpt"] = "checkpoints/r05b_dyn"
cfg["model"]["optimizer"]["lr"] = 1e-4
cfg["model"]["optimizer"]["warmup_steps"] = 50
cfg["model"]["optimizer"]["decay_steps"] = 1000
cfg["trainer"]["max_steps"] = 1000
cfg["trainer"]["ckpt_dir"] = "checkpoints/r05b_genie_final"
cfg["trainer"]["ckpt_every_n_steps"] = 500
with open("configs/r05b_genie_final.yaml", "w") as f:
    f.write("# DERIVED by tools/r05b_quality_run.sh from r05b_genie.yaml "
            "(stage-5 warm start).\n")
    yaml.safe_dump(cfg, f, sort_keys=False)
PY
fi

run_stage 5 3600 05_final.log \
  python -m open_genie_tpu.cli train genie --config configs/r05b_genie_final.yaml --resume

run_stage 6 2400 eval_tok.log \
  python -m open_genie_tpu.cli eval tokenizer \
    --config configs/r05b_tokenizer.yaml --ckpt checkpoints/r05b_tok \
    --max-batches 32 --ema

run_stage 7 2400 eval_genie.log \
  python -m open_genie_tpu.cli eval genie \
    --config configs/r05b_genie_final.yaml --ckpt checkpoints/r05b_genie_final \
    --max-batches 32 --controllability-frames 8

run_stage 8 1800 08_generate.log \
  python -m open_genie_tpu.cli generate \
    --config configs/r05b_genie_final.yaml --ckpt checkpoints/r05b_genie_final \
    --frames 16 --steps-per-frame 25 --actions-from-data \
    --out samples/r05_rollout.mp4

stage "9: assemble EVAL_r05.json"
python - <<'PY'
import json, os, time

def last_json(path):
    out = None
    if not os.path.exists(path):
        return None
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    return out

# Attempt 1 (fast-motion corpus, pre-fix pipeline) preserved for the
# corpus-dependence comparison.
prev = None
if os.path.exists("EVAL_r05.json"):
    try:
        prev = json.load(open("EVAL_r05.json"))
        prev = prev.get("fast_motion_attempt") or {
            "tokenizer_eval": prev.get("tokenizer_eval"),
            "genie_eval": prev.get("genie_eval"),
            "note": "attempt 1: motion_scale=1.0 corpus; stage-5 latent "
            "action randomly re-initialized; controllability sampled "
            "uniform over the 2^8 vocab",
        }
    except json.JSONDecodeError:
        pass

art = {
    "round": 5,
    "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "corpus": "data/r05b/videos -- 1152 synthetic mp4s, 32f 64x64, "
    "motion_scale=0.4 (per-frame displacement matching real 15-30 fps "
    "gameplay; see PARITY.md round-5 rate-distortion note)",
    "pipeline": [
        "train tokenizer 20k steps, d=18 MAGVIT2 + streaming decoder, EMA, "
        "bit-balance objective annealed 1->0.05 from 10k "
        "(configs/r05b_tokenizer.yaml)",
        "train genie joint 4k steps, 2^18 vocab dynamics, frozen tokenizer",
        "tokenize-data -> data/r05b/tokens",
        "train dynamics 8k steps over shards",
        "genie warm start 1k steps (genie_ckpt + dynamics_ckpt: keeps the "
        "stage-2 action codebook the staged dynamics was trained against)",
        "eval tokenizer/genie (32 batches, EMA, controllability over the "
        "emitted-action pool)",
        "rollout replaying real emitted actions (--actions-from-data)",
    ],
    "tokenizer_eval": last_json("logs/r05b_quality/eval_tok.log"),
    "genie_eval": last_json("logs/r05b_quality/eval_genie.log"),
    "sample_rollout": {
        "path": "samples/r05_rollout.mp4",
        "bytes": os.path.getsize("samples/r05_rollout.mp4")
        if os.path.exists("samples/r05_rollout.mp4") else None,
        "frames": 16, "steps_per_frame": 25, "actions": "emitted (replay)",
    },
    "checkpoints": {
        "tokenizer": "checkpoints/r05b_tok",
        "genie_joint": "checkpoints/r05b_genie",
        "dynamics_staged": "checkpoints/r05b_dyn",
        "genie_final": "checkpoints/r05b_genie_final",
    },
    "fast_motion_attempt": prev,
}
with open("EVAL_r05.json", "w") as f:
    json.dump(art, f, indent=2)
print(json.dumps(art, indent=2)[:2000])
PY
stage "done"
touch "$LOG/DONE"
