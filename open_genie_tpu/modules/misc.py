"""Misc modules: ForwardBlock (MLP/conv FFN) and activation wrappers.

Equivalents of `/root/reference/genie/module/misc.py:71-104` plus the
activation registry entries (`genie/module/__init__.py:58-67`). The
reference's forward-hook probes (`NamingProbe`/`RecordingProbe`) have no JAX
equivalent by design -- feature taps are returned explicitly by the VGG
module instead (see `open_genie_tpu.modules.vgg`).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn

from open_genie_tpu.utils import cast_tuple, default


class ForwardBlock(nn.Module):
    """GroupNorm -> (block -> act) chain.

    `block` selects the mixing op: 'dense' (Linear), 'conv2d' or 'conv3d'
    (channels-last convs; the reference wraps Conv3d in layout rearranges,
    unnecessary here). `hid_dim` may be an int, tuple, or None (no hidden
    layer).
    """

    in_dim: int
    out_dim: Optional[int] = None
    hid_dim: Optional[Union[int, Tuple[int, ...]]] = 256
    block: str = "dense"
    num_groups: int = 1
    last_act: bool = False
    use_bias: bool = True
    kernel_size: int = 1
    # conv3d only: pad time left-only so the block is causal across frames.
    # The reference pads its ST-attention FFN symmetrically in time
    # (`attention.py:429-445`), silently leaking future frames through an
    # otherwise-causal trunk; SpaceTimeAttention here sets this True
    # (fix-by-design, enables O(1)-frame cached decode).
    causal_time: bool = False

    @nn.compact
    def __call__(
        self, x, cond=None, mask=None, train: bool = False,
        time_valid: bool = False,
    ):
        """`time_valid=True` (conv3d+causal_time decode mode): no temporal
        padding, so a window of exactly the receptive field produces the
        single output frame a cached decode step needs -- k_t x less conv
        work than padding and discarding."""
        out_dim = default(self.out_dim, self.in_dim)
        hid = self.hid_dim
        if isinstance(hid, int):
            hid = (hid,)
        hid = default(hid, ())
        dims = tuple(hid) + (out_dim,)

        def mix(h, features, name):
            if self.block == "dense":
                return nn.Dense(features, use_bias=self.use_bias, name=name)(h)
            nd = 2 if self.block == "conv2d" else 3
            k = cast_tuple(self.kernel_size, nd)
            pad = [((kk - 1) // 2, (kk - 1) // 2) for kk in k]
            if self.block == "conv3d" and self.causal_time:
                pad[0] = (0, 0) if time_valid else (k[0] - 1, 0)
            return nn.Conv(
                features,
                kernel_size=k,
                padding=tuple(pad),
                use_bias=self.use_bias,
                name=name,
            )(h)

        if self.block == "conv3d" and self.causal_time and x.ndim == 5:
            # Per-frame GroupNorm: vanilla GroupNorm on video computes
            # statistics over (T, H, W, C/g), leaking future frames through
            # an otherwise-causal block (the reference's torch GroupNorm
            # does the same). Restrict stats to within-frame.
            b, t = x.shape[:2]
            h = nn.GroupNorm(num_groups=self.num_groups, name="norm")(
                x.reshape(b * t, *x.shape[2:])
            ).reshape(x.shape)
        else:
            h = nn.GroupNorm(num_groups=self.num_groups, name="norm")(x)
        for i, features in enumerate(dims):
            h = mix(h, features, f"block_{i}")
            if i < len(dims) - 1 or self.last_act:
                h = nn.gelu(h)
        return h


class Activation(nn.Module):
    """Parameter-free activation as a blueprint module ('gelu', 'relu', ...)."""

    fn: str = "gelu"

    def __call__(self, x, cond=None, mask=None, train: bool = False):
        return {
            "gelu": nn.gelu,
            "relu": nn.relu,
            "leaky_relu": lambda v: nn.leaky_relu(v, negative_slope=0.01),
            "silu": nn.silu,
        }[self.fn](x)
