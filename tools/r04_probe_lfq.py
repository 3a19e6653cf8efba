"""LFQ weight probe: short training sweeps over (entropy_weight,
diversity_weight, frac_sample) measuring codebook health, to ground the
round-4 flagship config's quantizer weights in data instead of folklore.

Round-3's quality artifact showed near-collapse (perplexity 13/1024,
usage 7.6% -- VERDICT r3 'What's weak' #1); the knobs that fight collapse
are the LFQ entropy terms (`ops/lfq.py::lfq_loss`: per-sample entropy
pushes confident codes, `diversity_weight * avg_entropy` pushes the batch
to SPREAD over the codebook; reference declares the same objective at
`/root/reference/genie/module/quantization.py:60` but never implements the
subsampling). This probe trains a small-but-real tokenizer (same
VideoResidualBlock/attention trunk family, d=10 codebook) for a few
hundred steps per setting on the synthetic corpus and reports:

  * trained codebook stats on held-out batches (usage / perplexity /
    factorized per-bit perplexity, `eval.codebook_stats`+`token_stats`),
  * the last-k-step means of the train-time LFQ aux metrics,
  * final reconstruction loss (the quality term the entropy terms must
    not crush).

CPU-runnable (tiny model; ~1 min/setting) so it never contends for the
TPU tunnel with a live flagship run:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/r04_probe_lfq.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_tokenizer(entropy_w: float, diversity_w: float, frac: float) -> dict:
    """Small-but-real MAGVIT2-family tokenizer: conv downsample + ST-attn
    trunk + LFQ d=10, the same module stack as the flagship at 1/4 width."""
    return dict(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 64,
                "time_factor": 1, "space_factor": 4,
            }),
            ("space-time_attn", {"n_rep": 2, "n_embd": 64, "n_head": 4,
                                 "d_head": 16}),
            ("causal-conv3d", {"in_channels": 64, "out_channels": 10,
                               "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 10, "out_channels": 64,
                               "kernel_size": 3}),
            ("space-time_attn", {"n_rep": 2, "n_embd": 64, "n_head": 4,
                                 "d_head": 16}),
            ("depth2spacetime_upsample", {
                "in_channels": 64, "kernel_size": 3, "out_channels": 3,
                "time_factor": 1, "space_factor": 4,
            }),
        ),
        d_codebook=10,
        lfq_entropy_weight=entropy_w,
        lfq_diversity_weight=diversity_w,
        lfq_frac_sample=frac,
    )


def run_setting(entropy_w: float, diversity_w: float, frac: float,
                steps: int, batch: int = 4, frames: int = 4,
                size: int = 32) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.data.video import SyntheticVideo
    from open_genie_tpu.eval import codebook_stats
    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )
    from open_genie_tpu.train.losses import TokenizerTrainModule

    tok_cfg = tiny_tokenizer(entropy_w, diversity_w, frac)
    module = TokenizerTrainModule(
        tokenizer=tok_cfg, gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    ds = SyntheticVideo(num_videos=64, num_frames=frames, height=size,
                        width=size)
    batches = np.stack([np.stack([ds[(b * batch + i) % 48]
                                  for i in range(batch)])
                        for b in range(16)])  # 16 distinct train batches
    held = np.stack([np.stack([ds[48 + i + 8 * b] for i in range(batch)])
                     for b in range(2)])  # indices 48..63: held out

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, frames, size, size, 3), jnp.float32)
    state = create_train_state(module, sample, key,
                               opt := make_optimizer(lr=3e-4))
    step = make_train_step(module, opt, compute_dtype=jnp.float32)

    tail: list = []
    for i in range(steps):
        state, metrics = step(state, jnp.asarray(batches[i % len(batches)]))
        if i >= steps - 50:
            tail.append(jax.device_get(metrics))

    @jax.jit
    def tokenize(params, video):
        return module.apply({"params": params}, video,
                            method=module.tokenize)[1]

    idxs = jnp.concatenate(
        [tokenize(state.params, jnp.asarray(h)).reshape(-1) for h in held])
    stats = jax.device_get(codebook_stats(idxs, 1024))
    mean = lambda k: float(np.mean([m[k] for m in tail]))
    return {
        "entropy_weight": entropy_w,
        "diversity_weight": diversity_w,
        "frac_sample": frac,
        "steps": steps,
        "heldout_usage": float(stats["usage"]),
        "heldout_perplexity": float(stats["perplexity"]),
        "rec_loss": mean("rec_loss"),
        "lfq_sample_entropy": mean("lfq_sample_entropy"),
        "lfq_avg_entropy": mean("lfq_avg_entropy"),
    }


SWEEP = [
    # (entropy_weight, diversity_weight, frac_sample)
    (0.0, 1.0, 1.0),   # no entropy objective at all (collapse control)
    (0.02, 1.0, 1.0),  # light
    (0.1, 1.0, 1.0),   # reference default (quantization.py:49)
    (0.1, 2.0, 1.0),   # diversity-heavy
    (0.3, 1.0, 1.0),   # entropy-heavy
    (0.1, 1.0, 0.25),  # subsampled diversity (frac_sample path)
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--quick", action="store_true",
                    help="2 settings x 60 steps (CI smoke)")
    args = ap.parse_args()
    sweep = SWEEP[2:4] if args.quick else SWEEP
    steps = 60 if args.quick else args.steps

    results = []
    for ew, dw, fs in sweep:
        t0 = time.time()
        r = run_setting(ew, dw, fs, steps)
        r["wall_s"] = round(time.time() - t0, 1)
        results.append(r)
        print(json.dumps(r), flush=True)

    results.sort(key=lambda r: -r["heldout_perplexity"])
    out = {"sweep": results, "best": results[0]}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r04_probe_lfq_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}; best setting: "
          f"entropy={out['best']['entropy_weight']} "
          f"diversity={out['best']['diversity_weight']} "
          f"frac={out['best']['frac_sample']} "
          f"(heldout perplexity {out['best']['heldout_perplexity']:.0f}/1024)")


if __name__ == "__main__":
    main()
