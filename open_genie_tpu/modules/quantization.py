"""Lookup-Free Quantization module (Flax).

Module wrapper over `open_genie_tpu.ops.lfq` matching the reference
`LookupFreeQuantization` (`/root/reference/genie/module/quantization.py`)
API: optional in/out projections when `input_dim != codebook_dim *
num_codebook`, sign quantization with a straight-through estimator, integer
code indices from the positive-bit mask, and an entropy + commitment training
loss.

The entropy terms never materialize the `(B*N, 2^d)` logit matrix (the
reference's hot spot at d=18); see `ops/lfq.py` for the factorized /
blockwise math. The diversity term is *subtracted* (MagViT-2 semantics); the
reference adds it (`quantization.py:125`), which would penalize codebook
diversity.

Multi-codebook (`num_codebook > 1`): the diversity entropy is computed per
sub-codebook and averaged, matching the reference's per-codebook averaging
(`quantization.py:119-123`).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from open_genie_tpu.ops import lfq as lfq_ops
from open_genie_tpu.utils import default


class LookupFreeQuantization(nn.Module):
    codebook_dim: int
    num_codebook: int = 1
    input_dim: Optional[int] = None
    use_bias: bool = True
    # Fraction of tokens entering the diversity-entropy term (strided
    # subsample, `ops/lfq.py::lfq_loss`) -- implemented here; the reference
    # declares but never uses it (`quantization.py:60`, SURVEY 2.11.7).
    frac_sample: float = 1.0
    commit_weight: float = 0.25
    entropy_weight: float = 0.1
    diversity_weight: float = 1.0
    # Scale-adaptive per-bit balance + decorrelation regularizer
    # (`ops/lfq.py::lfq_bit_balance_loss`) -- the saturation-proof
    # anti-collapse objective; set `entropy_weight: 0` alongside it to skip
    # the (gradient-dead at beta=100) 2^d diversity sweep.
    bit_balance_weight: float = 0.0

    @property
    def codebook_size(self) -> int:
        return (2 ** self.codebook_dim) * self.num_codebook

    def codebook(self) -> jnp.ndarray:
        """`(codebook_size, codebook_dim)` sign-vector codebook."""
        return lfq_ops.codebook_entries(
            jnp.arange(self.codebook_size), self.codebook_dim
        )

    def setup(self):
        d, c = self.codebook_dim, self.num_codebook
        self._input_dim = default(self.input_dim, d * c)
        self._project = self._input_dim != d * c
        if self._project:
            self.proj_inp = nn.Dense(d * c, use_bias=self.use_bias)
            self.proj_out = nn.Dense(self._input_dim, use_bias=self.use_bias)

    def decode_entries(self, idxs: jnp.ndarray) -> jnp.ndarray:
        """Integer indices -> the decoder-facing latent.

        Maps indices to their `{-1,+1}^d` codewords and -- crucially --
        applies `proj_out` when projections exist, so the result has the
        same width/space the decoder was trained on. Decoding raw
        codewords (what `ops.lfq.codebook_entries` alone gives) is only
        correct in the projection-free configuration."""
        d, c = self.codebook_dim, self.num_codebook
        ent = lfq_ops.codebook_entries(idxs, d)
        if c > 1:  # idxs (..., c) -> entries (..., c, d) -> (..., c*d)
            ent = ent.reshape(*ent.shape[:-2], c * d)
        if self._project:
            ent = self.proj_out(ent)
        return ent

    def __call__(
        self,
        x: jnp.ndarray,
        beta: float = 100.0,
        training: bool = False,
        entropy_scale=1.0,
        bit_balance_scale=1.0,
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Optional[jnp.ndarray], dict]:
        """Quantize `(..., D)` features (channels-last).

        Returns `((out, idxs), loss, aux)`; `loss` is None outside training.
        `idxs` has shape `(..., num_codebook)` squeezed to `(...)` when a
        single codebook is used, matching the reference (`quantization.py:110`).

        NOTE: unlike the reference, `input_dim` defaults to `codebook_dim *
        num_codebook` (no projection). The reference defaults it to the full
        `codebook_size`, which breaks its own LatentAction usage
        (`genie/action.py:93-101` feeds `d_codebook`-dim features into a
        `Linear(2^d, d)`).
        """
        d, c = self.codebook_dim, self.num_codebook

        leading = x.shape[:-1]
        if self._project:
            x = self.proj_inp(x)

        # Split per codebook: (..., c, d)
        x = x.reshape(*leading, c, d)
        code, idxs = lfq_ops.lfq_quantize(x, d, training=training)
        # Commit-loss target: where(), not sign() -- sign(0)=0 is outside
        # {-1,+1}^d and becomes a zero-attractor (see ops/lfq.py).
        quant = jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)

        out = code.reshape(*leading, c * d)
        if self._project:
            out = self.proj_out(out)

        if c == 1:
            idxs = idxs.squeeze(-1)

        if not training:
            return (out, idxs), None, {}

        loss, aux = lfq_ops.lfq_loss(
            x,
            quant,
            beta=beta,
            commit_weight=self.commit_weight,
            entropy_weight=self.entropy_weight,
            diversity_weight=self.diversity_weight,
            frac_sample=self.frac_sample,
            num_codebooks=c,
            entropy_scale=entropy_scale,
            bit_balance_weight=self.bit_balance_weight,
            bit_balance_scale=bit_balance_scale,
        )
        return (out, idxs), loss, aux
