"""Normalization modules (Flax), channels-last.

Equivalents of `torch.nn.GroupNorm` (registry name `group_norm`) and the
reference `AdaptiveGroupNorm` (`/root/reference/genie/module/norm.py`).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis of video/image tensors.

    Blueprint-compatible with the reference registry entry
    (`genie/module/__init__.py:56` -> `nn.GroupNorm(num_groups, num_channels)`).
    """

    num_groups: int = 32
    num_channels: Optional[int] = None
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        return nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            name="gn",
        )(x)


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm whose output statistics are modulated by a conditioning
    signal (the quantized latents in the MAGVIT2 decoder).

    Matches `genie/module/norm.py:8-69`: the condition `(B, ..., dim_cond)` is
    spatially mean-pooled to `(B, dim_cond)`, mapped through two Linear heads
    (std head init: weight 0 / bias 1, avg head init: all 0), and applied as a
    per-channel affine on the group-normalized input.
    """

    dim_cond: int
    num_groups: int
    num_channels: int
    cond_bias: bool = True
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        assert cond is not None, "AdaptiveGroupNorm requires a conditioning input"
        norm = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            name="gn",
        )(x)

        # Mean-pool the condition over all non-(batch, channel) axes.
        c = cond.astype(jnp.float32)
        axes = tuple(range(1, c.ndim - 1))
        c = c.mean(axis=axes) if axes else c  # (B, dim_cond)

        std = nn.Dense(
            self.num_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="std",
        )(c)
        if self.cond_bias:
            avg = nn.Dense(
                self.num_channels,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="avg",
            )(c)
        else:
            avg = 0.0

        # Broadcast (B, C) across the spatial/temporal axes.
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_channels,)
        std = std.reshape(shape).astype(norm.dtype)
        avg = avg.reshape(shape).astype(norm.dtype) if self.cond_bias else 0.0
        return norm * std + avg
