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
import numpy as np


def _sync(x) -> float:
    """Hard host sync: on remote-tunneled devices `block_until_ready` can
    return before execution completes; a full host transfer cannot."""
    return float(np.asarray(x).sum())

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

    _sync(rollout(params, prompt, actions, key))  # compile + warmup

    times = []
    for i in range(repeats):
        k = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        _sync(rollout(params, prompt, actions, k))
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

    _sync(roundtrip(params, video))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(roundtrip(params, video))
        times.append(time.perf_counter() - t0)
    return 16 / min(times)


def bench_tokenizer_train(repeats: int, batch: int = 4, frames: int = 8):
    """Full tokenizer train step (rec + GAN + perceptual + LFQ d=18),
    frames/sec of training throughput at 64x64."""
    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )
    from open_genie_tpu.train.losses import TokenizerTrainModule, frozen_param_mask

    module = TokenizerTrainModule(
        tokenizer=dict(
            enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_DEC_DESC, d_codebook=18,
        ),
        disc_kwargs=dict(
            inp_size=(64, 64), model_dim=64, dim_mults=(1, 2, 4),
            down_step=(None, 2, 2), num_groups=8, use_attn=True,
            num_heads=4, dim_head=32,
        ),
        gan_frames_per_batch=4,
    )
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, frames, 64, 64, 3), jnp.float32)
    state = create_train_state(module, sample, key, opt := make_optimizer())
    mask = frozen_param_mask(state.params, ("perc_crit",))
    opt = make_optimizer(frozen_mask=mask)
    state = state.replace(opt_state=opt.init(state.params))

    step = make_train_step(module, opt, compute_dtype=jnp.bfloat16)
    state, metrics = step(state, sample)  # compile + warmup
    _sync(metrics["grad_norm"])

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = step(state, sample)
        _sync(metrics["grad_norm"])
        times.append(time.perf_counter() - t0)
    return batch * frames / min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps-per-frame", type=int, default=25)
    args = ap.parse_args()

    repeats = 2 if args.quick else 5
    frames = 2 if args.quick else args.frames
    spf = 4 if args.quick else args.steps_per_frame

    def safe(name, fn, *a, **kw):
        """One failing section must not cost the driver its JSON line."""
        try:
            return fn(*a, **kw)
        except Exception as e:  # pragma: no cover
            print(f"# {name} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None

    rollout_fps = safe("rollout", bench_rollout, frames, spf, repeats)
    tok_fps = safe("tokenizer", bench_tokenizer, repeats)
    # remat (activation checkpointing) makes batch4/frames8 fit HBM; it
    # runs at 74 frames/s vs 42 at batch2/frames4 (one v5e chip).
    train_fps = safe(
        "tokenizer_train", bench_tokenizer_train,
        repeats, batch=2 if args.quick else 4, frames=4 if args.quick else 8,
    )

    if tok_fps:
        print(f"# tokenizer tokenize+decode: {tok_fps:.2f} frames/sec @ 16x64x64 (MAGVIT2, d=18)")
    if train_fps:
        print(f"# tokenizer train step (full loss stack): {train_fps:.2f} frames/sec @ 64x64")
    print(json.dumps({
        "metric": "rollout_fps",
        "value": round(rollout_fps, 3) if rollout_fps else None,
        "unit": "frames/sec (64x64, action-conditioned, %d MaskGIT steps/frame)" % spf,
        "vs_baseline": round(rollout_fps / 30.0, 3) if rollout_fps else None,
        "extra": {
            "tokenizer_roundtrip_fps": round(tok_fps, 2) if tok_fps else None,
            "tokenizer_train_fps": round(train_fps, 2) if train_fps else None,
        },
    }))


if __name__ == "__main__":
    main()
