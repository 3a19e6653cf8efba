"""Image primitive modules (Flax), channels-last `(B, H, W, C)`.

Equivalents of `/root/reference/genie/module/image.py`. Used by the frame
discriminator.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn

from open_genie_tpu.ops.resample import blur_pool_2d, space_to_depth
from open_genie_tpu.utils import cast_tuple, default

IntOr2 = Union[int, Tuple[int, int]]


class BlurPooling2d(nn.Module):
    """Anti-aliased 2-D downsample (`genie/module/image.py:45-83`)."""

    kernel_size: IntOr2 = 3
    stride: IntOr2 = 2
    num_groups: int = 1

    def __call__(self, x, cond=None, mask=None, train: bool = False):
        return blur_pool_2d(x, kernel_size=self.kernel_size, stride=self.stride)


class SpaceDownsample(nn.Module):
    """Inverse pixel-shuffle + 1x1 conv (`genie/module/image.py:85-102`)."""

    in_dim: int
    factor: int = 2

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        x = space_to_depth(x, self.factor)
        return nn.Conv(self.in_dim, kernel_size=(1, 1), name="proj")(x)


class ImageResidualBlock(nn.Module):
    """GN -> LeakyReLU -> Conv x2 (+ optional downsample) residual block.

    Matches `genie/module/image.py:104-163`.
    """

    inp_channel: int
    out_channel: Optional[int] = None
    kernel_size: IntOr2 = 3
    padding: IntOr2 = 1
    num_groups: int = 1
    downsample: Optional[int] = None

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        out_ch = default(self.out_channel, self.inp_channel)
        k = cast_tuple(self.kernel_size, 2)
        p = cast_tuple(self.padding, 2)
        pad = tuple((pp, pp) for pp in p)

        h = nn.GroupNorm(num_groups=self.num_groups, name="norm1")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Conv(out_ch, kernel_size=k, padding=pad, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.num_groups, name="norm2")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Conv(out_ch, kernel_size=k, padding=pad, name="conv2")(h)
        if self.downsample:
            h = SpaceDownsample(out_ch, self.downsample, name="down")(h)

        # Residual: strided 1x1 conv when projecting, identity otherwise.
        if self.out_channel is not None or self.downsample:
            stride = self.downsample or 1
            r = nn.Conv(
                out_ch,
                kernel_size=(1, 1),
                strides=(stride, stride),
                name="res_proj",
            )(x)
        else:
            r = x
        return h + r
