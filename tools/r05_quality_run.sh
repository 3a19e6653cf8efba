#!/usr/bin/env bash
# Round-5 FLAGSHIP quality run (VERDICT r4 item 1): execute the full staged
# pipeline at production scale with the bit-balance anti-collapse objective
# (never yet run on-chip) -- d=18 MAGVIT2 tokenizer (streaming decoder),
# 2^18-token dynamics, 256-action latent-action VQ-VAE -- on the 1152-video
# corpus, ending in EVAL_r05.json (>=32-batch evals, EMA scoring,
# action-controllability metric) and a sample rollout mp4.
#
#   make-data -> train tokenizer 20k -> train genie joint 4k
#   -> tokenize-data -> train dynamics 8k -> genie warm start 1k
#   -> eval tokenizer/genie (32 batches + controllability) -> rollout
#
# Run on the TPU box with NO other TPU process:
#   bash tools/r05_quality_run.sh [start_stage]
# Stages are idempotent-ish: pass a start stage (1-8) to resume after a
# failure without retraining earlier stages.
set -uo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_tpu_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

LOG=logs/r05_quality
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
    stage "stage $num FAILED (rc=$rc) -- resume with: bash tools/r05_quality_run.sh $num"
    exit "$rc"
  fi
}

if [ ! -d data/r04/videos/Coinrun/train ]; then
  stage "0: generate mp4 dataset (CPU)"
  PYTHONPATH= JAX_PLATFORMS=cpu python -m open_genie_tpu.cli make-data \
    --root data/r04/videos --num-videos 1152 --timeout 32 --size 64 \
    2>&1 | tee "$LOG/00_data.log"
fi

# --resume on every train stage: restore_checkpoint() returns (state, 0)
# when the ckpt_dir is empty, so a first run still starts fresh -- but a
# rerun after a timeout CONTINUES from the last checkpoint instead of
# triggering the trainer's stale-checkpoint purge and retraining from 0.
run_stage 1 7200 01_tok.log \
  python -m open_genie_tpu.cli train tokenizer --config configs/r05_tokenizer.yaml --resume

run_stage 2 5400 02_genie.log \
  python -m open_genie_tpu.cli train genie --config configs/r05_genie.yaml --resume

run_stage 3 2400 03_shards.log \
  python -m open_genie_tpu.cli tokenize-data \
    --config configs/r05_genie.yaml --ckpt checkpoints/r05_genie \
    --out data/r05/tokens

run_stage 4 5400 04_dyn.log \
  python -m open_genie_tpu.cli train dynamics --config configs/r05_dynamics.yaml --resume

if [ "$START" -le 5 ]; then
  stage "5: derive warm-start config"
  python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/r05_genie.yaml"))
# Warm start from the FULL stage-2 joint checkpoint (keeps the trained
# latent-action codebook the shard-trained dynamics was conditioned on),
# then overwrite the dynamics trunk with the stage-4 staged pre-training.
cfg["model"]["genie_ckpt"] = "checkpoints/r05_genie"
cfg["model"]["dynamics_ckpt"] = "checkpoints/r05_dyn"
cfg["model"]["optimizer"]["lr"] = 1e-4
cfg["model"]["optimizer"]["warmup_steps"] = 50
cfg["model"]["optimizer"]["decay_steps"] = 1000
cfg["trainer"]["max_steps"] = 1000
cfg["trainer"]["ckpt_dir"] = "checkpoints/r05_genie_final"
cfg["trainer"]["ckpt_every_n_steps"] = 500
with open("configs/r05_genie_final.yaml", "w") as f:
    f.write("# DERIVED by tools/r05_quality_run.sh from r05_genie.yaml "
            "(stage-5 warm start).\n")
    yaml.safe_dump(cfg, f, sort_keys=False)
PY
fi

run_stage 5 3600 05_final.log \
  python -m open_genie_tpu.cli train genie --config configs/r05_genie_final.yaml --resume

run_stage 6 2400 eval_tok.log \
  python -m open_genie_tpu.cli eval tokenizer \
    --config configs/r05_tokenizer.yaml --ckpt checkpoints/r05_tok \
    --max-batches 32 --ema

run_stage 7 2400 eval_genie.log \
  python -m open_genie_tpu.cli eval genie \
    --config configs/r05_genie_final.yaml --ckpt checkpoints/r05_genie_final \
    --max-batches 32 --controllability-frames 8

run_stage 8 1800 08_generate.log \
  python -m open_genie_tpu.cli generate \
    --config configs/r05_genie_final.yaml --ckpt checkpoints/r05_genie_final \
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

art = {
    "round": 5,
    "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "pipeline": [
        "make-data (1152 synthetic mp4s, 32f 64x64; 1024 train / 128 val)",
        "train tokenizer 20k steps, d=18 MAGVIT2 + streaming decoder, EMA, "
        "bit-balance anti-collapse objective (configs/r05_tokenizer.yaml)",
        "train genie joint 4k steps, 2^18 vocab dynamics, frozen tokenizer "
        "(configs/r05_genie.yaml)",
        "tokenize-data -> data/r05/tokens",
        "train dynamics 8k steps over shards (configs/r05_dynamics.yaml)",
        "genie warm start 1k steps (dynamics_ckpt)",
    ],
    "tokenizer_eval": last_json("logs/r05_quality/eval_tok.log"),
    "genie_eval": last_json("logs/r05_quality/eval_genie.log"),
    "sample_rollout": {
        "path": "samples/r05_rollout.mp4",
        "bytes": os.path.getsize("samples/r05_rollout.mp4")
        if os.path.exists("samples/r05_rollout.mp4") else None,
        "frames": 16, "steps_per_frame": 25,
    },
    "checkpoints": {
        "tokenizer": "checkpoints/r05_tok",
        "genie_joint": "checkpoints/r05_genie",
        "dynamics_staged": "checkpoints/r05_dyn",
        "genie_final": "checkpoints/r05_genie_final",
    },
}
with open("EVAL_r05.json", "w") as f:
    json.dump(art, f, indent=2)
print(json.dumps(art, indent=2))
PY
stage "done"
