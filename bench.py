"""Benchmark harness: headline = MaskGIT rollout fps (action-conditioned,
64x64), plus tokenizer tokenize+decode throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): >= 30 fps action-conditioned 64x64 rollout on one
chip -- `vs_baseline` is rollout_fps / 30. Additional metrics are reported
on separate lines prefixed with '#' so the driver's one-JSON-line contract
holds.

Run on the real TPU chip: `python bench.py` (use `--quick` for a fast
smoke run).
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from open_genie_tpu.models.blueprints import (
    LATENT_ACT_DEC,
    LATENT_ACT_ENC,
    MAGVIT2_DEC_DESC,
    MAGVIT2_ENC_DESC,
)
from open_genie_tpu.models.genie import Genie
from open_genie_tpu.models.tokenizer import VideoTokenizer

# Compact-but-real rollout config: 64x64 frames, 16x16 token grid (f4
# spatial like the Genie paper's 64->16), 10-bit codebook, 6-block
# 512-wide ST-transformer dynamics (the flagship decode path).
GENIE_CFG = dict(
    tokenizer=dict(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 128,
                "time_factor": 1, "space_factor": 4,
            }),
            ("space-time_attn", {"n_rep": 2, "n_embd": 128, "n_head": 8, "d_head": 16}),
            ("causal-conv3d", {"in_channels": 128, "out_channels": 10, "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 10, "out_channels": 128, "kernel_size": 3}),
            ("space-time_attn", {"n_rep": 2, "n_embd": 128, "n_head": 8, "d_head": 16}),
            ("depth2spacetime_upsample", {
                "in_channels": 128, "kernel_size": 3, "out_channels": 3,
                "time_factor": 1, "space_factor": 4,
            }),
        ),
        d_codebook=10,
    ),
    latent_action=dict(
        enc_desc=LATENT_ACT_ENC,
        dec_desc=LATENT_ACT_DEC,
        d_codebook=8,
        n_embd=256,
        inp_shape=(64, 64),
    ),
    dynamics=dict(
        desc=(("space-time_attn", {"n_rep": 6, "n_embd": 512, "n_head": 8, "d_head": 64}),),
        embed_dim=512,
    ),
)


def bench_rollout(num_frames: int, steps_per_frame: int, repeats: int):
    model = Genie(**GENIE_CFG)
    key = jax.random.PRNGKey(0)
    prompt = jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16)

    # init via init_full (touches every param WITHOUT the scan-based rollout
    # -- flax cannot create params inside lax.scan); jitted: one compile.
    video = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)["params"]

    actions = jnp.zeros((1, num_frames + 1), jnp.int32)

    @jax.jit
    def rollout(params, prompt, actions, key):
        return model.apply(
            {"params": params}, prompt, actions, key,
            num_frames=num_frames, steps_per_frame=steps_per_frame,
        )

    out = rollout(params, prompt, actions, key)
    out.block_until_ready()  # compile + warmup

    times = []
    for i in range(repeats):
        k = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        out = rollout(params, prompt, actions, k)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return num_frames / dt


def bench_tokenizer(repeats: int):
    """MAGVIT2 tokenize+decode throughput, frames/sec @ 16x64x64 bf16."""
    tok = VideoTokenizer(
        enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_DEC_DESC, d_codebook=18
    )
    video = jnp.zeros((1, 16, 64, 64, 3), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    # init via the full forward so encoder AND decoder params exist.
    params = jax.jit(lambda k: tok.init(k, video, train=False))(key)

    @jax.jit
    def roundtrip(params, video):
        quant, idxs = tok.apply(params, video, method=tok.tokenize)
        return tok.apply(params, idxs, method=tok.decode_tokens)

    out = roundtrip(params, video)
    out.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = roundtrip(params, video)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return 16 / min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps-per-frame", type=int, default=25)
    args = ap.parse_args()

    repeats = 2 if args.quick else 5
    frames = 2 if args.quick else args.frames
    spf = 4 if args.quick else args.steps_per_frame

    rollout_fps = bench_rollout(frames, spf, repeats)
    tok_fps = bench_tokenizer(repeats)

    print(f"# tokenizer tokenize+decode: {tok_fps:.2f} frames/sec @ 16x64x64 (MAGVIT2, d=18)")
    print(json.dumps({
        "metric": "rollout_fps",
        "value": round(rollout_fps, 3),
        "unit": "frames/sec (64x64, action-conditioned, %d MaskGIT steps/frame)" % spf,
        "vs_baseline": round(rollout_fps / 30.0, 3),
        "extra": {"tokenizer_roundtrip_fps": round(tok_fps, 2)},
    }))


if __name__ == "__main__":
    main()
