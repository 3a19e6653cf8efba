"""Frame and video GAN discriminators (Flax, channels-last).

TPU-native equivalents of `/root/reference/genie/module/discriminator.py`:
a conv stem, a pyramid of residual blocks (with optional spatial attention),
and a dense head producing one hinge logit per frame/clip.

Like the reference, `dim_mults` defines the channel pyramid and stages are
formed from consecutive pairs (`pairwise`), consuming the first
`len(dims) - 1` entries of `down_step`.
"""
from __future__ import annotations

from math import prod
from typing import Optional, Tuple, Union

import flax.linen as nn

from open_genie_tpu.modules.attention import SpatialAttention
from open_genie_tpu.modules.image import ImageResidualBlock
from open_genie_tpu.modules.misc import ForwardBlock
from open_genie_tpu.modules.video import VideoResidualBlock
from open_genie_tpu.utils import cast_tuple


class FrameDiscriminator(nn.Module):
    """Per-frame discriminator over `(B, H, W, C)` images.

    Matches `discriminator.py:17-114`.
    """

    inp_size: Union[int, Tuple[int, int]]
    model_dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    down_step: Tuple[Optional[int], ...] = (None, 2, 2)
    inp_channels: int = 3
    kernel_size: Union[int, Tuple[int, int]] = 3
    num_groups: int = 1
    num_heads: int = 4
    dim_head: int = 32
    use_attn: bool = False
    use_blur: bool = True
    act_fn: str = "leaky"

    @nn.compact
    def __call__(self, image, train: bool = False):
        inp_size = cast_tuple(self.inp_size, 2)
        dims = [self.model_dim * m for m in self.dim_mults]
        assert len(dims) == len(self.down_step), (
            "Dimension and downsample steps must match."
        )

        out = nn.Conv(
            self.model_dim, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            name="proj_in",
        )(image)

        pairs = list(zip(dims[:-1], dims[1:]))
        for i, ((inp_dim, out_dim), down) in enumerate(
            zip(pairs, self.down_step)
        ):
            out = ImageResidualBlock(
                inp_dim,
                out_dim,
                downsample=down,
                num_groups=self.num_groups,
                kernel_size=self.kernel_size,
                name=f"res_{i}",
            )(out)
            if self.use_attn:
                out = SpatialAttention(
                    n_head=self.num_heads,
                    d_head=self.dim_head,
                    d_inp=out_dim,
                    d_out=out_dim,
                    name=f"attn_{i}",
                )(out) + out
                out = ForwardBlock(
                    in_dim=out_dim,
                    hid_dim=4 * out_dim,
                    block="conv2d",
                    kernel_size=1,
                    name=f"ff_{i}",
                )(out) + out
            inp_size = tuple(s // (down or 1) for s in inp_size)

        out_dim = dims[-1]
        out = nn.Conv(
            out_dim, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            name="head_conv",
        )(out)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = out.reshape(out.shape[0], -1)
        logit = nn.Dense(1, name="head")(out)
        return logit[:, 0]


class VideoDiscriminator(nn.Module):
    """Whole-clip discriminator over `(B, T, H, W, C)` videos.

    Matches `discriminator.py:116-222`.
    """

    inp_size: Union[Tuple[int, int], Tuple[int, int, int]]
    model_dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    down_step: Tuple[Optional[Union[int, Tuple[int, int]]], ...] = (None, 2, 2)
    inp_channels: int = 3
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    num_groups: int = 1
    num_heads: int = 4
    dim_head: int = 32
    act_fn: str = "leaky"
    use_attn: bool = False
    use_blur: bool = True
    use_causal: bool = False

    @nn.compact
    def __call__(self, video, train: bool = False):
        inp_size = tuple(self.inp_size)
        if len(inp_size) == 2:
            inp_size = (inp_size[0], inp_size[1], inp_size[1])
        dims = [self.model_dim * m for m in self.dim_mults]
        assert len(dims) == len(self.down_step), (
            "Dimension and downsample steps must match."
        )

        if self.use_causal:
            from open_genie_tpu.modules.video import CausalConv3d

            out = CausalConv3d(
                self.inp_channels,
                self.model_dim,
                kernel_size=self.kernel_size,
                name="proj_in",
            )(video)
        else:
            k = cast_tuple(self.kernel_size, 3)
            out = nn.Conv(
                self.model_dim,
                kernel_size=k,
                padding=tuple((1, 1) for _ in k),
                name="proj_in",
            )(video)

        pairs = list(zip(dims[:-1], dims[1:]))
        for i, ((inp_dim, out_dim), down) in enumerate(
            zip(pairs, self.down_step)
        ):
            out = VideoResidualBlock(
                inp_dim,
                out_dim,
                downsample=down,
                num_groups=self.num_groups,
                kernel_size=self.kernel_size,
                act_fn=self.act_fn,
                use_blur=self.use_blur,
                use_causal=self.use_causal,
                name=f"res_{i}",
            )(out)
            if self.use_attn:
                out = SpatialAttention(
                    n_head=self.num_heads,
                    d_head=self.dim_head,
                    d_inp=out_dim,
                    d_out=out_dim,
                    name=f"attn_{i}",
                )(out) + out
                out = ForwardBlock(
                    in_dim=out_dim,
                    hid_dim=4 * out_dim,
                    block="conv3d",
                    kernel_size=1,
                    name=f"ff_{i}",
                )(out) + out
            if down is None:
                d3 = (1, 1, 1)
            elif isinstance(down, int):
                d3 = (down, down, down)
            elif len(down) == 2:
                d3 = (down[0], down[1], down[1])
            else:
                d3 = tuple(down)
            inp_size = tuple(s // d for s, d in zip(inp_size, d3))

        out_dim = dims[-1]
        out = nn.Conv(
            out_dim, kernel_size=(3, 3, 3), padding=((1, 1),) * 3,
            name="head_conv",
        )(out)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = out.reshape(out.shape[0], -1)
        logit = nn.Dense(1, name="head")(out)
        return logit[:, 0]
