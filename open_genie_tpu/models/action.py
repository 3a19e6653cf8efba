"""LatentAction VQ-VAE (Flax): distill discrete actions from raw video.

TPU-native re-implementation of the reference `LatentAction`
(`/root/reference/genie/action.py:31-176`): factorized space/time-attention
encoder over video -> per-frame projection to a tiny `d_codebook`-dim action
space -> LFQ -> decoder that reconstructs the video with the quantized
actions cross-attended into its *temporal* attention only
(`action.py:131-149`, key_dim = d_codebook).

Fixes vs the reference (SURVEY.md 2.11):
  * the LFQ uses `input_dim = d_codebook` (no projection). The reference's
    default wires a `Linear(2^d, d)` that its own `to_act` output shape can
    never satisfy (`action.py:93-101`).
  * encoder/decoder space-time factor cancellation is checked from the
    blueprints at construction (`action.py:77-80`).
"""
from __future__ import annotations

from math import prod
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from open_genie_tpu.modules import blueprint_st_factor, parse_blueprint
from open_genie_tpu.modules.quantization import LookupFreeQuantization
from open_genie_tpu.modules.video import CausalConv3d
from open_genie_tpu.ops.lfq import codebook_entries
from open_genie_tpu.utils import cast_tuple


class LatentAction(nn.Module):
    enc_desc: Any  # Blueprint
    dec_desc: Any  # Blueprint
    d_codebook: int = 8
    inp_channels: int = 3
    inp_shape: Tuple[int, int] = (64, 64)
    ker_size: int = 3
    n_embd: int = 256
    n_codebook: int = 1
    lfq_bias: bool = True
    lfq_frac_sample: float = 1.0
    lfq_commit_weight: float = 0.25
    lfq_entropy_weight: float = 0.1
    lfq_diversity_weight: float = 1.0
    lfq_bit_balance_weight: float = 0.0
    quant_loss_weight: float = 1.0
    # Activation checkpointing: the encoder/decoder attend over the full
    # (H*W) grid per frame; without remat their backward residuals OOM HBM
    # at 64x64 training resolution. No effect outside `grad`.
    remat: Any = True

    def setup(self):
        enc_fact = blueprint_st_factor(self.enc_desc)
        dec_fact = blueprint_st_factor(self.dec_desc)
        assert abs(enc_fact * dec_fact - 1.0) < 1e-6, (
            "The product of the space-time up/down factors must be 1, got "
            f"{enc_fact} * {dec_fact}"
        )
        self._enc_fact = enc_fact

        self.proj_in = CausalConv3d(
            self.inp_channels, self.n_embd, kernel_size=self.ker_size
        )
        self.proj_out = CausalConv3d(
            self.n_embd, self.inp_channels, kernel_size=self.ker_size
        )
        self.enc_layers, self.enc_ext = parse_blueprint(
            self.enc_desc, remat=self.remat
        )
        self.dec_layers, self.dec_ext = parse_blueprint(
            self.dec_desc, remat=self.remat
        )

        h, w = cast_tuple(self.inp_shape, 2)
        # Per-frame flattened (h', w', c) -> d_codebook projection.
        self.to_act = nn.Dense(self.d_codebook, use_bias=False)

        self.quant = LookupFreeQuantization(
            codebook_dim=self.d_codebook,
            num_codebook=self.n_codebook,
            use_bias=self.lfq_bias,
            frac_sample=self.lfq_frac_sample,
            commit_weight=self.lfq_commit_weight,
            entropy_weight=self.lfq_entropy_weight,
            diversity_weight=self.lfq_diversity_weight,
            bit_balance_weight=self.lfq_bit_balance_weight,
        )

    def sample(self, idxs: jnp.ndarray) -> jnp.ndarray:
        """Codebook rows for inference-time user actions (`action.py:107-109`)."""
        return codebook_entries(idxs, self.d_codebook)

    def encode(
        self,
        video: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        training: bool = False,
    ):
        """Video `(B, T, H, W, C)` -> quantized latent actions.

        Returns `((act, idxs, enc_video), q_loss, q_aux)` where `act` is the
        `(B, T, d)` quantized action code, `idxs` the `(B, T)` int action
        ids, and `enc_video` the pre-projection encoder features (consumed by
        `decode`).
        """
        x = self.proj_in(video)
        for enc, has_ext in zip(self.enc_layers, self.enc_ext):
            x = enc(x, None, mask, training)  # positional: remat-compatible

        b, t = x.shape[:2]
        act = self.to_act(x.reshape(b, t, -1))  # (B, T, d_codebook)
        (q_act, idxs), q_loss, q_aux = self.quant(act, training=training)
        return (q_act, idxs, x), q_loss, q_aux

    def decode(
        self,
        enc_video: jnp.ndarray,
        q_act: jnp.ndarray,
        training: bool = False,
    ) -> jnp.ndarray:
        """Reconstruct video from encoder features + quantized actions.

        Actions condition only the temporal attention, as cross-attention
        keys/values (`cond=(None, q_act)`, `action.py:138-145`).
        """
        x = enc_video
        for dec, has_ext in zip(self.dec_layers, self.dec_ext):
            x = dec(
                x, (None, q_act) if has_ext else None, None, training,
            )
        return self.proj_out(x)

    def __call__(
        self,
        video: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        training: bool = False,
    ):
        """Full VQ-VAE pass -> `(idxs, loss, aux)` (`action.py:151-176`)."""
        (q_act, idxs, enc_video), q_loss, q_aux = self.encode(
            video, mask=mask, training=training
        )
        recon = self.decode(enc_video, q_act, training=training)

        rec_loss = jnp.mean((recon - video) ** 2)
        loss = rec_loss
        if q_loss is not None:
            loss = loss + q_loss * self.quant_loss_weight
        return idxs, loss, {
            "rec_loss": rec_loss,
            "q_loss": q_loss if q_loss is not None else 0.0,
            **{f"lfq_{k}": v for k, v in q_aux.items()},
        }
