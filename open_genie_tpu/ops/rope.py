"""Rotary position embeddings (1d / 2d / const frequency layouts).

Functional equivalent of the reference `RotaryEmbedding`
(`/root/reference/genie/module/attention.py:17-103`). Frequencies are
computed at trace time (static shapes) and the rotation is a fused
elementwise op, so XLA folds it into the surrounding attention computation.

Frequency kinds:
  * '1d'   : classic RoPE inverse-frequency ladder, used for temporal attention
  * '2d'   : `linspace(1, max_freq / 2, dim // 2) * pi`, used by the reference
             for spatial attention over the flattened (h*w) sequence
  * 'const': all-ones frequencies
"""
from __future__ import annotations

from math import pi

import jax.numpy as jnp
import numpy as np


def rope_frequencies(
    dim: int,
    kind: str = "1d",
    theta: float = 10000.0,
    max_freq: float = 10.0,
    num_freq: int = 1,
    theta_rescale_factor: float = 1.0,
) -> jnp.ndarray:
    """Return the `(dim // 2,)` frequency ladder for a given kind."""
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    if kind == "1d":
        freq = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    elif kind == "2d":
        freq = np.linspace(1.0, max_freq / 2, dim // 2) * pi
    elif kind == "const":
        freq = np.ones(num_freq)
    else:
        raise ValueError(f"Unknown RoPE kind: {kind}")
    return jnp.asarray(freq, dtype=jnp.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotation `(x1, x2) -> (-x2, x1)` on interleaved pairs."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    out = jnp.stack((-x2, x1), axis=-1)
    return out.reshape(*out.shape[:-2], -1)


def apply_rope(
    seq: jnp.ndarray,
    freq: jnp.ndarray,
    offset: int = 0,
    interpolate_factor: float = 1.0,
) -> jnp.ndarray:
    """Rotate a `(..., N, D)` sequence by position-dependent phases.

    `freq` has shape `(D // 2,)`; positions run along the second-to-last axis.
    Matches the reference application (`attention.py:47-100`): phases are
    repeated pairwise (`f0 f0 f1 f1 ...`) and the rotation acts on
    interleaved (even, odd) feature pairs.
    """
    n = seq.shape[-2]
    dtype = seq.dtype
    pos = (jnp.arange(n, dtype=jnp.float32) + offset) / interpolate_factor
    phase = pos[:, None] * freq[None, :]  # (N, D//2)
    phase = jnp.repeat(phase, 2, axis=-1)  # (N, D)

    rot_dim = phase.shape[-1]
    left, mid = seq[..., :0], seq[..., :rot_dim]
    right = seq[..., rot_dim:]

    cos = jnp.cos(phase).astype(dtype)
    sin = jnp.sin(phase).astype(dtype)
    mid = mid * cos + _rotate_half(mid) * sin
    return jnp.concatenate((mid, right), axis=-1) if right.size else mid
