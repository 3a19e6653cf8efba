"""Round-4 decoder diagnostic: is reconstruction actually using the codes?

Flagship training plateaued at ~17 dB PSNR while codebook entropy was
high, and stayed there when usage concentrated after the entropy anneal --
i.e. reconstruction quality is insensitive to codebook state. Two
hypotheses:
  (a) the decoder learned a near-constant "mean scene" and ignores the
      codes (training pathology / bug), or
  (b) the decoder uses the codes but the rate (18 bits x 8x8 tokens per
      4-frame latent step) only buys ~17 dB on this high-motion data
      (rate-distortion limit).

Decisive probe, on a trained checkpoint: decode (1) the clip's true codes,
(2) another clip's codes (swap), (3) uniform-random codes. If (2)/(3)
reconstructions stay close to (1) in pixels, the decoder ignores codes ->
(a). If they move far (toward the other clip / garbage), the code path is
live -> (b), and the lever is rate/data/steps, not a bug.

Also writes a side-by-side PNG (orig | rec) for the eye.

CPU-safe: PYTHONPATH= JAX_PLATFORMS=cpu python tools/r04_diagnose_decoder.py \
    [--config configs/r04_tokenizer.yaml] [--ckpt checkpoints/r04_tok/best]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/r04_tokenizer.yaml")
    ap.add_argument("--ckpt", default="checkpoints/r04_tok/best")
    ap.add_argument("--out", default="samples/r04_diagnose.png")
    args = ap.parse_args()

    from open_genie_tpu.models.tokenizer import VideoTokenizer
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, restore_params,
    )
    from open_genie_tpu.train.trainer import (
        _sample_batch_shape, build_dataset, build_loader,
        build_tokenizer_module,
    )
    from open_genie_tpu.parallel.mesh import make_mesh

    cfg = load_config(args.config, kind="tokenizer")
    mcfg = cfg.model
    module = build_tokenizer_module(mcfg)
    dataset = build_dataset(cfg.data, split="val")
    mesh = make_mesh(n_data=1, n_model=1)
    loader = build_loader(cfg, dataset, mesh, cfg.trainer, split="val")

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros(_sample_batch_shape(dataset, cfg), jnp.float32)
    state = create_train_state(module, sample, key, make_optimizer())
    params, step = restore_params(args.ckpt, state.params)
    print(f"# restored step {step} from {args.ckpt}")

    tok = VideoTokenizer(**mcfg.tokenizer_kwargs())
    tok_params = {"params": params["model"]}

    it = iter(loader)
    batch = jnp.asarray(next(it))  # (B,T,H,W,C); B>=2 for the swap probe
    assert batch.shape[0] >= 2, "need B>=2 for the swap probe"

    @jax.jit
    def probe(video, key):
        _, idxs = tok.apply(tok_params, video, method=tok.tokenize)
        rec = jnp.clip(tok.apply(tok_params, idxs, method=tok.decode_tokens), 0, 1)
        swap = jnp.roll(idxs, 1, axis=0)  # clip i gets clip i-1's codes
        rec_swap = jnp.clip(
            tok.apply(tok_params, swap, method=tok.decode_tokens), 0, 1)
        rand = jax.random.randint(
            key, idxs.shape, 0, 2 ** tok.d_codebook, idxs.dtype)
        rec_rand = jnp.clip(
            tok.apply(tok_params, rand, method=tok.decode_tokens), 0, 1)
        mse = lambda a, b: jnp.mean((a - b) ** 2)
        return idxs, rec, {
            "rec_mse": mse(rec, video),
            "swap_vs_rec_mse": mse(rec_swap, rec),
            "swap_vs_video_mse": mse(rec_swap, video),
            "swap_vs_donor_video_mse": mse(rec_swap, jnp.roll(video, 1, 0)),
            "rand_vs_rec_mse": mse(rec_rand, rec),
            "video_var": jnp.var(video),
        }

    idxs, rec, stats = jax.device_get(probe(batch, jax.random.PRNGKey(1)))
    stats = {k: float(v) for k, v in stats.items()}
    stats["psnr_db"] = float(10 * np.log10(1.0 / stats["rec_mse"]))
    flat = np.asarray(idxs).reshape(-1)
    stats["batch_unique_codes"] = int(len(np.unique(flat)))
    stats["batch_tokens"] = int(flat.size)
    verdict = (
        "DECODER-IGNORES-CODES (pathology)"
        if stats["swap_vs_rec_mse"] < 0.25 * stats["rec_mse"]
        else "code path LIVE (limit is rate/data/objective)"
    )
    stats["verdict"] = verdict
    print(json.dumps(stats, indent=2))

    # Visual: first 4 frames of clip 0, orig over rec.
    import cv2
    v0 = np.asarray(batch[0, :4])
    r0 = np.asarray(rec[0, :4])
    grid = np.concatenate(
        [np.concatenate(list(v0), 1), np.concatenate(list(r0), 1)], 0)
    cv2.imwrite(args.out, (grid[..., ::-1] * 255).astype(np.uint8))
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
