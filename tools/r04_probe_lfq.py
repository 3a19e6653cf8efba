#!/usr/bin/env python
"""Round-4 LFQ entropy-weight probe (VERDICT r3: "fix the collapse:
entropy/diversity weight sweep").

Short flagship-tokenizer runs (rec + LFQ, b4f8) over a grid of
(entropy_weight, diversity_weight), each followed by a val eval; prints
one JSON line per setting with PSNR + codebook health so the full 20k-step
quality run starts from a measured setting instead of a guess.

Run ALONE on the TPU box (single tunnel process): takes ~10 min/setting,
dominated by the first compile (shared across settings via the persistent
cache -- identical program, weights are compile-time constants... they are
NOT: loss weights are Python floats baked into the jaxpr, so each setting
recompiles the train step. The eval program is shared.)

Usage: python tools/r04_probe_lfq.py [--steps 600]
"""
import argparse
import copy
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRID = [
    # (entropy_weight, diversity_weight)
    (0.1, 1.0),   # MagViT-2 defaults
    (0.3, 1.0),   # stronger overall entropy push
    (0.1, 2.0),   # diversity-dominant (avg-entropy bonus outweighs
                  # per-sample sharpening 2:1)
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-batches", type=int, default=8)
    args = ap.parse_args()

    import yaml

    base = yaml.safe_load(
        open(os.path.join(REPO, "configs", "r04_tokenizer.yaml"))
    )
    os.makedirs("/tmp/r04_probe", exist_ok=True)
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_tpu_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )

    results = []
    for ew, dw in GRID:
        tag = f"ew{ew}_dw{dw}"
        cfg = copy.deepcopy(base)
        cfg["model"]["lfq_entropy_weight"] = ew
        cfg["model"]["lfq_diversity_weight"] = dw
        cfg["model"]["optimizer"]["decay_steps"] = args.steps
        cfg["model"]["optimizer"]["warmup_steps"] = min(
            100, args.steps // 6
        )
        cfg["trainer"]["max_steps"] = args.steps
        cfg["trainer"]["val_check_interval"] = 0
        cfg["trainer"]["log_every_n_steps"] = 100
        cfg["trainer"]["ckpt_dir"] = f"/tmp/r04_probe/ckpt_{tag}"
        cfg["trainer"]["ckpt_every_n_steps"] = args.steps
        path = f"/tmp/r04_probe/{tag}.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)

        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "open_genie_tpu.cli", "train",
             "tokenizer", "--config", path],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
        )
        train_s = time.time() - t0
        if r.returncode != 0:
            print(f"# {tag} TRAIN FAILED\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
            continue
        tail = [l for l in r.stdout.splitlines() if l.startswith("[step")]
        print(f"# {tag} train {train_s:.0f}s last: {tail[-1] if tail else '?'}")

        ev = subprocess.run(
            [sys.executable, "-m", "open_genie_tpu.cli", "eval", "tokenizer",
             "--config", path, "--ckpt", cfg["trainer"]["ckpt_dir"],
             "--max-batches", str(args.eval_batches)],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
        )
        metrics = None
        for line in ev.stdout.splitlines():
            if line.startswith("{"):
                try:
                    metrics = json.loads(line)
                except json.JSONDecodeError:
                    pass
        out = {"tag": tag, "entropy_weight": ew, "diversity_weight": dw,
               "train_s": round(train_s, 1), "eval": metrics}
        results.append(out)
        print(json.dumps(out), flush=True)

    with open("/tmp/r04_probe/summary.json", "w") as f:
        json.dump(results, f, indent=2)
    print("# probe summary -> /tmp/r04_probe/summary.json")


if __name__ == "__main__":
    main()
