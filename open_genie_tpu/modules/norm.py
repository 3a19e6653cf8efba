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

    `per_frame=True` restricts the statistics of 5-D video input to within
    each frame (reduce over H, W, C/g instead of T, H, W, C/g). The stock
    torch semantics pool over time, which makes any decoder containing the
    layer non-causal and thus unstreamable; the per-frame variant is the
    serving-grade switch (same parameters, causal statistics) used by the
    `magvit2_stream` decoder blueprint.
    """

    num_groups: int = 32
    num_channels: Optional[int] = None
    eps: float = 1e-5
    affine: bool = True
    per_frame: bool = False

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        gn = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            name="gn",
        )
        if self.per_frame and x.ndim == 5:
            b, t = x.shape[:2]
            return gn(x.reshape((b * t,) + x.shape[2:])).reshape(x.shape)
        return gn(x)


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm whose output statistics are modulated by a conditioning
    signal (the quantized latents in the MAGVIT2 decoder).

    Matches `genie/module/norm.py:8-69`: the condition `(B, ..., dim_cond)` is
    spatially mean-pooled to `(B, dim_cond)`, mapped through two Linear heads
    (std head init: weight 0 / bias 1, avg head init: all 0), and applied as a
    per-channel affine on the group-normalized input.

    `per_frame=True` (the serving-grade causal variant, `magvit2_stream`):
    GroupNorm statistics are within-frame (see `GroupNorm.per_frame`) and
    the condition pools only over its SPATIAL axes, keeping one affine per
    (batch, frame) -- frame `t` is conditioned on token frame `t` alone, so
    the layer is exactly streamable. When the input runs at a higher frame
    rate than the condition (after a time-expanding upsample), each
    condition frame applies to its `T_x / T_c` pixel sub-frames.
    """

    dim_cond: int
    num_groups: int
    num_channels: int
    cond_bias: bool = True
    affine: bool = True
    eps: float = 1e-5
    per_frame: bool = False

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        assert cond is not None, "AdaptiveGroupNorm requires a conditioning input"
        gn = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            name="gn",
        )
        if self.per_frame and x.ndim == 5:
            b, t = x.shape[:2]
            norm = gn(x.reshape((b * t,) + x.shape[2:])).reshape(x.shape)
        else:
            norm = gn(x)

        c = cond.astype(jnp.float32)
        if self.per_frame:
            # Pool over spatial axes only -> (B, T_c, dim_cond).
            assert c.ndim >= 3, (
                "per_frame AdaptiveGroupNorm needs a (B, T, ..., dim_cond) "
                "condition"
            )
            axes = tuple(range(2, c.ndim - 1))
            c = c.mean(axis=axes) if axes else c
        else:
            # Mean-pool the condition over all non-(batch, channel) axes.
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

        if self.per_frame:
            # (B, T_c, C) -> (B, T_x, 1, 1, C); time-expanding decoders run
            # the pixels at T_x = tf * T_c, each condition frame covering
            # its tf sub-frames (causal: sub-frame of token t sees token t).
            t_x, t_c = x.shape[1], std.shape[1]
            assert t_x % t_c == 0, (
                f"per_frame cond length {t_c} does not divide input length {t_x}"
            )
            if t_x != t_c:
                std = jnp.repeat(std, t_x // t_c, axis=1)
                if self.cond_bias:
                    avg = jnp.repeat(avg, t_x // t_c, axis=1)
            shape = (x.shape[0], t_x) + (1,) * (x.ndim - 3) + (self.num_channels,)
        else:
            # Broadcast (B, C) across the spatial/temporal axes.
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_channels,)
        std = std.reshape(shape).astype(norm.dtype)
        avg = avg.reshape(shape).astype(norm.dtype) if self.cond_bias else 0.0
        return norm * std + avg
