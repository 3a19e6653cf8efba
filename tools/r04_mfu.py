"""Train-step MFU experiment (VERDICT r3 item 3): measure the flagship
rec+LFQ train step at b4f8/64px under each remat mode and report the
roofline placement of each, so the shipped default is the measured-best
and PARITY.md's MFU claim is pinned to a reproducible probe.

Modes:
  * full  -- nn.remat on every enc/dec layer, save-nothing policy
             (the r03 default): smallest memory, recomputes every conv.
  * dots  -- checkpoint_policies.dots_with_no_batch_dims_saveable: only
             dot_general (attention/dense) outputs stay resident; convs are
             still recomputed (the policy does not match
             conv_general_dilated). Candidate fix for the 63% HBM-bound
             fraction (r03 roofline) on the attention-heavy fraction only.
  * off   -- no remat: all residuals stored (may OOM / spill at scale).

Run on the TPU box with NO other TPU process:
    python tools/r04_mfu.py [--batch 4 --frames 8 --repeats 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_tpu_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _sync(x) -> float:
    import numpy as np

    return float(np.asarray(x).sum())


def run_mode(remat, batch: int, frames: int, size: int, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.models.blueprints import (
        MAGVIT2_ENC_DESC,
        MAGVIT2_STREAM_DEC_DESC,
    )
    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )
    from open_genie_tpu.train.losses import TokenizerTrainModule
    from open_genie_tpu.utils.roofline import cost_analysis, device_peaks, summarize

    module = TokenizerTrainModule(
        tokenizer=dict(
            enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_STREAM_DEC_DESC,
            d_codebook=18, remat=remat,
        ),
        gan_loss_weight=0.0,
        perc_loss_weight=0.0,
    )
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, frames, size, size, 3), jnp.float32)
    state = create_train_state(module, sample, key, opt := make_optimizer())
    step = make_train_step(module, opt, compute_dtype=jnp.bfloat16)

    # Lower+compile explicitly: the compiled handle carries the XLA cost
    # model; the timed calls below hit the same executable via jit cache.
    t0 = time.perf_counter()
    compiled = step.lower(state, sample).compile()
    compile_s = time.perf_counter() - t0
    state, metrics = step(state, sample)  # warmup/exec (donates state)
    _sync(metrics["grad_norm"])

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = step(state, sample)
        _sync(metrics["grad_norm"])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    cost = cost_analysis(compiled)
    peaks = device_peaks()
    line = summarize(f"train[remat={remat}] b{batch}f{frames}", dt, cost, peaks)
    print("  " + line, flush=True)
    return {
        "remat": str(remat),
        "train_fps": batch * frames / dt,
        "step_ms": dt * 1e3,
        "compile_s": compile_s,
        "mfu_pct": 100.0 * cost["flops"] / dt / peaks.flops if cost["flops"] else None,
        "hbm_pct": 100.0 * cost["bytes"] / dt / peaks.bw if cost["bytes"] else None,
        "flops": cost["flops"],
        "bytes": cost["bytes"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", default="full,dots,off")
    args = ap.parse_args()

    # Merge with the saved record at the same shape: modes already
    # measured cleanly are kept and skipped, so a single-mode rerun (e.g.
    # --modes dots after a dropped remote compile) completes the A/B
    # instead of clobbering it.
    from bench import _load_saved, _save_result

    shape = f"b{args.batch}f{args.frames}"
    saved = (_load_saved().get("mfu_remat") or {}).get("result") or {}
    prior = saved.get("modes", []) if saved.get("shape") == shape else []
    name = {"True": "full", "False": "off"}
    done = {name.get(str(m.get("remat")), str(m.get("remat")))
            for m in prior if "error" not in m}
    results = [m for m in prior if "error" not in m]
    for mode in args.modes.split(","):
        if mode in done:
            print(f"== remat={mode}: already recorded, SKIP", flush=True)
            continue
        remat = {"full": True, "off": False}.get(mode, mode)
        print(f"== remat={mode}", flush=True)
        try:
            results.append(run_mode(remat, args.batch, args.frames,
                                    args.size, args.repeats))
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", flush=True)
            results.append({"remat": mode,
                            "error": f"{type(e).__name__}: {e}"[:300]})
        _save_result("mfu_remat", {"shape": shape, "modes": results})

    _save_result("mfu_remat", {"shape": shape, "modes": results})
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
