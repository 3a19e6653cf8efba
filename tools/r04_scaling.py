#!/usr/bin/env python
"""Round-4 train-step MFU experiments + scale-generality proof.

VERDICT r3 items 3 and 4 in one sweep: each named config builds the
flagship (d=18 MAGVIT2) tokenizer train step at a given
(batch, frames, size, remat, master dtype), measures cold/warm compile
time, step time, training frames/sec, and the roofline numbers (MFU, HBM
fraction) from XLA's own cost model, plus the compiled program's HBM
footprint where the backend exposes it. Results print one JSON line per
config and persist to `tools/r04_scaling.json` for the PARITY.md table.

Run ALONE on the TPU box (single tunnel process). Each config runs in a
SUBPROCESS with a hard timeout: a remote-compile hang on a too-big
program must cost its cap, not the sweep.

Usage:
  python tools/r04_scaling.py                 # full sweep
  python tools/r04_scaling.py --only b4f8     # one config
  python tools/r04_scaling.py --child b4f8    # (internal) measure in-proc
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> dict(batch, frames, size, remat, bf16_params, timeout_s)
CONFIGS = {
    # --- MFU experiments at the canonical shape (item 3) ---
    "b4f8": dict(batch=4, frames=8, size=64),
    "b4f8_noremat": dict(batch=4, frames=8, size=64, remat=False),
    "b4f8_bf16params": dict(batch=4, frames=8, size=64, bf16_params=True),
    "b8f8": dict(batch=8, frames=8, size=64),
    # --- scale generality (item 4): reference trains T=64 clips;
    #     128x128 quadruples the spatial grid ---
    "b2f32": dict(batch=2, frames=32, size=64),
    "b1f64": dict(batch=1, frames=64, size=64),
    "b1f8_128": dict(batch=1, frames=8, size=128),
    "b2f8_128": dict(batch=2, frames=8, size=128),
}
DEFAULT_TIMEOUT = 900.0


def measure(name: str) -> dict:
    cfg = CONFIGS[name]
    batch, frames, size = cfg["batch"], cfg["frames"], cfg["size"]
    remat = cfg.get("remat", True)
    bf16_params = cfg.get("bf16_params", False)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.models.blueprints import (
        MAGVIT2_DEC_DESC,
        MAGVIT2_ENC_DESC,
    )
    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from open_genie_tpu.train.losses import TokenizerTrainModule
    from open_genie_tpu.utils.roofline import (
        cost_analysis,
        device_peaks,
        summarize,
    )

    # rec + LFQ objective (the quality run's program; GAN/VGG are split
    # out of the donated step by design -- PARITY.md round-3 item 9).
    module = TokenizerTrainModule(
        tokenizer=dict(
            enc_desc=MAGVIT2_ENC_DESC,
            dec_desc=MAGVIT2_DEC_DESC,
            d_codebook=18,
            remat=remat,
        ),
        gan_loss_weight=0.0,
        perc_loss_weight=0.0,
    )
    key = jax.random.PRNGKey(0)
    sample = jnp.asarray(
        np.random.default_rng(0).uniform(
            size=(batch, frames, size, size, 3)
        ).astype(np.float32)
    )
    optimizer = make_optimizer()
    state = create_train_state(module, sample, key, optimizer)
    if bf16_params:
        # Experiment: bf16 MASTER params + optimizer moments (halves the
        # per-step param/optstate HBM traffic; NOT the default -- f32
        # masters are the '16-mixed' training contract).
        state = state.replace(
            params=jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p,
                state.params,
            )
        )
        state = state.replace(opt_state=optimizer.init(state.params))

    step = make_train_step(module, optimizer, compute_dtype=jnp.bfloat16)

    t0 = time.perf_counter()
    lowered = step.lower(state, sample)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    cost = cost_analysis(compiled)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "hbm_args_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "hbm_temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "hbm_total_mb": round(
                (
                    ma.argument_size_in_bytes
                    + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes
                )
                / 1e6,
                1,
            ),
        }
    except Exception:
        pass

    # Warmup (donation: keep threading the state through).
    state, metrics = compiled(state, sample)
    float(np.asarray(metrics["grad_norm"]))  # hard host sync (tunnel)

    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        state, metrics = compiled(state, sample)
        float(np.asarray(metrics["grad_norm"]))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    peaks = device_peaks()
    print("# " + summarize(f"train[{name}]", dt, cost, peaks), flush=True)
    return {
        "config": name,
        "batch": batch,
        "frames": frames,
        "size": size,
        "remat": remat,
        "bf16_params": bf16_params,
        "step_ms": round(dt * 1e3, 2),
        "train_fps": round(batch * frames / dt, 1),
        "mfu_pct": round(100 * cost["flops"] / dt / peaks.flops, 2),
        "hbm_pct": round(100 * cost["bytes"] / dt / peaks.bw, 2),
        "gflop": round(cost["flops"] / 1e9, 1),
        "mb_accessed": round(cost["bytes"] / 1e6, 1),
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "loss": round(float(np.asarray(metrics["loss"], np.float32)), 4),
        **mem,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--out", default=os.path.join(REPO, "tools", "r04_scaling.json"))
    args = ap.parse_args()

    if args.child:
        print(json.dumps(measure(args.child)), flush=True)
        return

    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_tpu_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )
    names = args.only or list(CONFIGS)
    results = []
    for name in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name],
                cwd=REPO,
                env=env,
                capture_output=True,
                text=True,
                timeout=CONFIGS[name].get("timeout_s", DEFAULT_TIMEOUT),
            )
        except subprocess.TimeoutExpired:
            print(f"# {name}: TIMEOUT after {time.time() - t0:.0f}s", flush=True)
            results.append({"config": name, "error": "timeout"})
            continue
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("{")), None
        )
        for l in r.stdout.splitlines():
            if l.startswith("# "):
                print(l, flush=True)
        if r.returncode != 0 or line is None:
            print(f"# {name}: FAILED\n{r.stdout[-1500:]}\n{r.stderr[-1500:]}",
                  flush=True)
            results.append({"config": name, "error": "failed"})
            continue
        rec = json.loads(line)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
