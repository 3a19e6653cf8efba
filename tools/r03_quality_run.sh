#!/usr/bin/env bash
# Round-3 quality-results run (VERDICT r2 item 3): the full staged
# pipeline on a generated dataset, ending in checkpoint-backed eval
# metrics (EVAL_r03.json) and a sample rollout mp4 -- the reference's
# unchecked "Show some results" roadmap item
# (/root/reference/README.md:273-274), actually done.
#
#   make-data -> train tokenizer -> train genie (joint, frozen tokenizer)
#   -> tokenize-data -> train dynamics (staged) -> genie warm start
#   -> eval tokenizer + eval genie -> generate sample rollout
#
# Run on the TPU box with NO other TPU process: bash tools/r03_quality_run.sh
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_tpu_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

LOG=logs/r03_quality
mkdir -p "$LOG" samples

stage() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

if [ ! -d data/r03/videos/Coinrun/train ]; then
  stage "0: generate mp4 dataset (CPU)"
  PYTHONPATH= JAX_PLATFORMS=cpu python -m open_genie_tpu.cli make-data \
    --root data/r03/videos --num-videos 64 --timeout 32 --size 64 \
    2>&1 | tee "$LOG/00_data.log"
fi

stage "1: train tokenizer (TPU)"
timeout 3600 python -m open_genie_tpu.cli train tokenizer \
  --config configs/r03_tokenizer.yaml 2>&1 | tee "$LOG/01_tok.log"

stage "2: train genie joint (TPU, frozen stage-1 tokenizer)"
timeout 5400 python -m open_genie_tpu.cli train genie \
  --config configs/r03_genie.yaml 2>&1 | tee "$LOG/02_genie.log"

stage "3: tokenize-data -> shards"
timeout 1800 python -m open_genie_tpu.cli tokenize-data \
  --config configs/r03_genie.yaml --ckpt checkpoints/r03_genie \
  --out data/r03/tokens 2>&1 | tee "$LOG/03_shards.log"

stage "4: train dynamics over shards"
timeout 3600 python -m open_genie_tpu.cli train dynamics \
  --config configs/r03_dynamics.yaml 2>&1 | tee "$LOG/04_dyn.log"

stage "5: genie warm start from the staged dynamics checkpoint"
python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/r03_genie.yaml"))
cfg["model"]["dynamics_ckpt"] = "checkpoints/r03_dyn"
cfg["trainer"]["max_steps"] = 300
cfg["trainer"]["ckpt_dir"] = "checkpoints/r03_genie_final"
cfg["trainer"]["ckpt_every_n_steps"] = 300
with open("configs/r03_genie_final.yaml", "w") as f:
    f.write("# DERIVED by tools/r03_quality_run.sh from r03_genie.yaml "
            "(stage-5 warm start).\n")
    yaml.safe_dump(cfg, f, sort_keys=False)
PY
timeout 3600 python -m open_genie_tpu.cli train genie \
  --config configs/r03_genie_final.yaml 2>&1 | tee "$LOG/05_final.log"

stage "6: eval checkpoints"
timeout 1800 python -m open_genie_tpu.cli eval tokenizer \
  --config configs/r03_tokenizer.yaml --ckpt checkpoints/r03_tok \
  --max-batches 8 2>&1 | tee "$LOG/eval_tok.log"
timeout 1800 python -m open_genie_tpu.cli eval genie \
  --config configs/r03_genie_final.yaml --ckpt checkpoints/r03_genie_final \
  --max-batches 8 2>&1 | tee "$LOG/eval_genie.log"

stage "7: sample rollout"
timeout 1800 python -m open_genie_tpu.cli generate \
  --config configs/r03_genie_final.yaml --ckpt checkpoints/r03_genie_final \
  --frames 16 --steps-per-frame 25 --out samples/r03_rollout.mp4 \
  2>&1 | tee "$LOG/07_generate.log"

stage "8: assemble EVAL_r03.json"
python - <<'PY'
import json, os, time

def last_json(path):
    out = None
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    return out

art = {
    "round": 3,
    "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "pipeline": [
        "make-data (64 synthetic mp4s, 32f 64x64)",
        "train tokenizer 3000 steps (configs/r03_tokenizer.yaml)",
        "train genie joint 1500 steps (configs/r03_genie.yaml, frozen tokenizer)",
        "tokenize-data -> data/r03/tokens",
        "train dynamics 3000 steps over shards (configs/r03_dynamics.yaml)",
        "genie warm start 300 steps (dynamics_ckpt)",
    ],
    "tokenizer_eval": last_json("logs/r03_quality/eval_tok.log"),
    "genie_eval": last_json("logs/r03_quality/eval_genie.log"),
    "sample_rollout": {
        "path": "samples/r03_rollout.mp4",
        "bytes": os.path.getsize("samples/r03_rollout.mp4")
        if os.path.exists("samples/r03_rollout.mp4") else None,
        "frames": 16, "steps_per_frame": 25,
    },
    "checkpoints": {
        "tokenizer": "checkpoints/r03_tok",
        "genie_joint": "checkpoints/r03_genie",
        "dynamics_staged": "checkpoints/r03_dyn",
        "genie_final": "checkpoints/r03_genie_final",
    },
}
with open("EVAL_r03.json", "w") as f:
    json.dump(art, f, indent=2)
print(json.dumps(art, indent=2))
PY
stage "done"
