"""Scale-generality proof point (round-4): the flagship shapes beyond
64x64/T<=16 that no previous round ever executed.

For each (size, frames) in the sweep the probe measures, on the real chip:
  * compile time (cold vs the persistent cache) of the flagship MAGVIT2
    d=18 tokenize and decode programs,
  * compiled-program HBM footprint (XLA `memory_analysis`: argument +
    output + temp + generated-code bytes -- the allocation the chip must
    hold, independent of tunnel quirks),
  * tokenize / decode throughput (frames/s, hard host sync) and the
    roofline placement (MFU, %HBM peak, bound class) from XLA's own cost
    model (`utils/roofline.py`),
  * one rec+LFQ train step at the same spatial shape (batch scaled down to
    keep the program inside the remote compile helper's size limit).

Reference scope being covered: the reference's intended training config
runs 64-frame clips (`/root/reference/config/tokenize.yaml:69` --
`num_frames: 64`) and nothing in this repo had ever run >16 frames or
>64px before this probe. Results go to `.bench_results.json` under the
`scaling` key (non-canonical: never shadows the driver-bench backstop
sections) and are summarized as a table for PARITY.md.

Run on the TPU box with NO other TPU process:
    python tools/r04_scaling.py [--quick] [--skip-train]
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


def _bf16(params):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )


def _mem_mb(compiled) -> dict:
    """Compiled-program memory footprint in MB from XLA's memory analysis.

    Reported per program (not live-arrays) so the number is a property of
    the shape, reproducible without querying device allocator stats the
    tunneled backend may not expose."""
    try:
        m = compiled.memory_analysis()
        get = lambda name: float(getattr(m, name, 0.0) or 0.0) / 1e6
        return {
            "args_mb": get("argument_size_in_bytes"),
            "out_mb": get("output_size_in_bytes"),
            "temp_mb": get("temp_size_in_bytes"),
            "code_mb": get("generated_code_size_in_bytes"),
        }
    except Exception:
        return {}


def _timed_compile(jitted, *args):
    t0 = time.perf_counter()
    compiled = jitted.lower(*args).compile()
    return compiled, time.perf_counter() - t0


def probe_shape(size: int, frames: int, repeats: int) -> dict:
    """Flagship tokenize/decode at (frames, size, size)."""
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.models.blueprints import (
        MAGVIT2_DEC_DESC,
        MAGVIT2_ENC_DESC,
    )
    from open_genie_tpu.models.tokenizer import VideoTokenizer
    from open_genie_tpu.utils.roofline import cost_analysis, device_peaks, summarize

    peaks = device_peaks()
    tok = VideoTokenizer(
        enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_DEC_DESC, d_codebook=18
    )
    video = jnp.zeros((1, frames, size, size, 3), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = _bf16(jax.jit(lambda k: tok.init(k, video, train=False))(key))

    def tokenize(params, video):
        return tok.apply(params, video, method=tok.tokenize)[1]

    def decode(params, idxs):
        return tok.apply(params, idxs, method=tok.decode_tokens)

    out: dict = {"size": size, "frames": frames}

    tok_c, out["tokenize_compile_s"] = _timed_compile(
        jax.jit(tokenize), params, video)
    idxs = tok_c(params, video)
    _sync(idxs)
    dec_c, out["decode_compile_s"] = _timed_compile(jax.jit(decode), params, idxs)
    _sync(dec_c(params, idxs))

    for name, fn, args, cost_key in (
        ("tokenize", tok_c, (params, video), "tokenize"),
        ("decode", dec_c, (params, idxs), "decode"),
    ):
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(fn(*args))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        cost = cost_analysis(fn)
        out[f"{cost_key}_fps"] = frames / dt
        out[f"{cost_key}_mfu_pct"] = 100.0 * cost["flops"] / dt / peaks.flops
        out[f"{cost_key}_mem"] = _mem_mb(fn)
        print("  " + summarize(f"{name} {size}px T={frames}", dt, cost, peaks),
              flush=True)
    return out


def probe_train(size: int, frames: int, batch: int, repeats: int) -> dict:
    """One rec+LFQ flagship train step at the given spatial shape (the
    r04 quality objective: GAN/VGG off, matching configs/r04_tokenizer)."""
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
    from open_genie_tpu.utils.roofline import device_peaks

    module = TokenizerTrainModule(
        tokenizer=dict(
            enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_STREAM_DEC_DESC,
            d_codebook=18,
        ),
        gan_loss_weight=0.0,
        perc_loss_weight=0.0,
    )
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, frames, size, size, 3), jnp.float32)
    state = create_train_state(module, sample, key, opt := make_optimizer())
    step = make_train_step(module, opt, compute_dtype=jnp.bfloat16)

    t0 = time.perf_counter()
    state, metrics = step(state, sample)
    _sync(metrics["grad_norm"])
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = step(state, sample)
        _sync(metrics["grad_norm"])
        times.append(time.perf_counter() - t0)
    fps = batch * frames / min(times)
    print(f"  train b{batch}f{frames} {size}px: {fps:.1f} f/s "
          f"(step {min(times)*1e3:.0f} ms, compile+1st {compile_s:.0f}s) "
          f"[{device_peaks().label}]", flush=True)
    return {"size": size, "frames": frames, "batch": batch,
            "train_fps": fps, "train_compile_s": compile_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="canonical + one scaled shape only")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-shapes", action="store_true",
                    help="train points only; seed shapes from the saved "
                    "record (resume after a timeout mid-sweep)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    # Persist incrementally under a NON-canonical key (see note below):
    # the round-4 extras run timed out on the last train point and lost
    # the whole (completed) shape sweep because saving only happened at
    # the end.
    from bench import _load_saved, _save_result  # noqa: E402

    saved = (_load_saved().get("scaling") or {}).get("result") or {}
    shapes = [(64, 16), (64, 32), (128, 16)]
    if not args.quick:
        shapes.append((64, 64))  # the reference's intended clip length
    results = {"shapes": [], "train": []}
    if args.skip_shapes:
        results["shapes"] = saved.get("shapes", [])
        shapes = []
    # Previously-recorded clean train points are skipped in the loop below,
    # so they must carry over into the emitted artifact unconditionally.
    done_train = {(t.get("size"), t.get("frames"), t.get("batch"))
                  for t in saved.get("train", []) if "error" not in t}
    results["train"] = [t for t in saved.get("train", []) if "error" not in t]
    for size, frames in shapes:
        print(f"== tokenize/decode @ {size}x{size} T={frames}", flush=True)
        try:
            results["shapes"].append(probe_shape(size, frames, args.repeats))
        except Exception as e:  # record the brittleness, keep sweeping
            print(f"  FAILED: {type(e).__name__}: {e}", flush=True)
            results["shapes"].append(
                {"size": size, "frames": frames,
                 "error": f"{type(e).__name__}: {e}"[:300]})
        _save_result("scaling", results)
    if not args.skip_train:
        # batch chosen to hold tokens-per-step roughly at the r04 training
        # shape (4*8@64px) so the program stays inside the remote compile
        # helper's size limit.
        for size, frames, batch in [(64, 8, 4), (64, 32, 1), (128, 8, 1)]:
            if (size, frames, batch) in done_train:
                print(f"== train step @ {size}x{size} T={frames} B={batch}: "
                      "already recorded, SKIP", flush=True)
                continue
            print(f"== train step @ {size}x{size} T={frames} B={batch}",
                  flush=True)
            try:
                results["train"].append(
                    probe_train(size, frames, batch, args.repeats))
            except Exception as e:
                print(f"  FAILED: {type(e).__name__}: {e}", flush=True)
                results["train"].append(
                    {"size": size, "frames": frames, "batch": batch,
                     "error": f"{type(e).__name__}: {e}"[:300]})
            # NON-canonical key: bench.py's fold only fills final metric
            # names absent from live results, and none of these keys match
            # the headline metric names, so the driver bench cannot be
            # poisoned.
            _save_result("scaling", results)

    _save_result("scaling", results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
