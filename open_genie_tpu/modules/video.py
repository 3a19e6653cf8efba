"""Video primitive modules (Flax), channels-last `(B, T, H, W, C)`.

TPU-native equivalents of the reference primitives
(`/root/reference/genie/module/video.py`). Everything operates channels-last
so XLA keeps activations in the TPU-preferred layout; the public model APIs
accept the reference's channels-first convention via a thin shim.

All blueprint-visible modules share the uniform call signature
`__call__(x, cond=None, mask=None, train=False)` so a blueprint stack can be
driven generically; unused arguments are ignored.

Up/down-samplers expose `st_factor`, the space-time volume scaling factor
(`time_factor * space_factor ** 2`, reciprocal for downsamplers), consumed by
`LatentAction`'s encoder/decoder consistency check (the reference's
`Upsample.factor`, `genie/module/video.py:70-72,100-104`).

Fixed-by-design (vs reference defects, see SURVEY.md section 2.11):
  * non-square blur kernels use per-axis binomial rows (`video.py:39,47` bug)
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from open_genie_tpu.ops.conv import causal_time_pad
from open_genie_tpu.ops.resample import (
    blur_pool_3d,
    depth_to_space,
    depth_to_spacetime,
    depth_to_time,
)
from open_genie_tpu.utils import cast_tuple, default

IntOr3 = Union[int, Tuple[int, int, int]]


def _act(name: str):
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "leaky": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "swish": nn.silu,
        "silu": nn.silu,
    }[name]


class CausalConv3d(nn.Module):
    """Causal 3-D conv: time padded left-only, space symmetric.

    Matches `genie/module/video.py:106-200` (`time_pad = (k_t - 1) * dil +
    (1 - stride)`).
    """

    in_channels: int
    out_channels: int
    kernel_size: IntOr3 = 3
    stride: IntOr3 = 1
    dilation: IntOr3 = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None
    pad_mode: str = "constant"
    use_bias: bool = True

    @property
    def inp_dim(self) -> int:
        return self.in_channels

    @property
    def out_dim(self) -> int:
        return self.out_channels

    def stream_state_len(self) -> int:
        """Temporal state width of the streaming path: the causal left-pad
        width, i.e. how many trailing input frames a stream step carries."""
        kt, _, _ = cast_tuple(self.kernel_size, 3)
        st, _, _ = cast_tuple(self.stride, 3)
        dt, _, _ = cast_tuple(self.dilation, 3)
        return causal_time_pad(kt, st, dt)

    @property
    def t_factor(self) -> float:
        """Time-axis length scaling (T -> floor(T / stride_t))."""
        st, _, _ = cast_tuple(self.stride, 3)
        return 1.0 / st

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False,
                 cache=None):
        """Full causal forward, or streaming single-step decode.

        Streaming mode (`cache` = the `(B, time_pad, H, W, C_in)` trailing
        input window, zeros at sequence start -- exactly the full forward's
        causal zero padding): `x` is the next `m >= 1` frames; the conv
        runs VALID in time over `cache ++ x`, which reproduces the full
        forward's outputs for those frames bit-for-bit, in O(m) compute
        regardless of history length. Returns `(out, new_cache)`. Requires
        time stride 1 and constant pad mode (an edge-replicated time pad
        depends on the unknown first frame at state init).
        """
        kt, kh, kw = cast_tuple(self.kernel_size, 3)
        st, sh, sw = cast_tuple(self.stride, 3)
        dt, dh, dw = cast_tuple(self.dilation, 3)
        pad = self.padding
        if pad is None or isinstance(pad, int):
            pad = (pad, pad)
        tp = causal_time_pad(kt, st, dt)
        hp = default(pad[0], (kh - 1) // 2)
        wp = default(pad[1], (kw - 1) // 2)

        if cache is not None:
            assert st == 1, "streaming causal conv requires time stride 1"
            assert self.pad_mode in ("constant", "zeros"), (
                "streaming causal conv requires constant time padding"
            )
            window = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            out = nn.Conv(
                features=self.out_channels,
                kernel_size=(kt, kh, kw),
                strides=(st, sh, sw),
                kernel_dilation=(dt, dh, dw),
                padding=((0, 0), (hp, hp), (wp, wp)),
                use_bias=self.use_bias,
                name="conv3d",
            )(window)
            new_cache = window[:, x.shape[1]:].astype(cache.dtype)
            return out, new_cache

        if self.pad_mode in ("constant", "zeros"):
            padding = ((tp, 0), (hp, hp), (wp, wp))
        else:
            mode = {"replicate": "edge"}.get(self.pad_mode, self.pad_mode)
            x = jnp.pad(x, ((0, 0), (tp, 0), (hp, hp), (wp, wp), (0, 0)), mode=mode)
            padding = "VALID"

        return nn.Conv(
            features=self.out_channels,
            kernel_size=(kt, kh, kw),
            strides=(st, sh, sw),
            kernel_dilation=(dt, dh, dw),
            padding=padding,
            use_bias=self.use_bias,
            name="conv3d",
        )(x)


class CausalConvTranspose3d(nn.Module):
    """Causal transpose 3-D conv, output trimmed to `(t*T, h*H, w*W)`.

    Matches `genie/module/video.py:202-277`.
    """

    in_channels: int
    out_channels: int
    kernel_size: IntOr3 = 3
    stride: IntOr3 = 1
    space_pad: Optional[Union[int, Tuple[int, int]]] = None
    use_bias: bool = True

    @property
    def inp_dim(self) -> int:
        return self.in_channels

    @property
    def out_dim(self) -> int:
        return self.out_channels

    @property
    def t_factor(self) -> float:
        """Time-axis length scaling (T -> T * stride_t)."""
        st, _, _ = cast_tuple(self.stride, 3)
        return float(st)

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        kt, kh, kw = cast_tuple(self.kernel_size, 3)
        st, sh, sw = cast_tuple(self.stride, 3)
        sp = self.space_pad
        if sp is None or isinstance(sp, int):
            sp = (sp, sp)
        hp = default(sp[0], kh // 2)
        wp = default(sp[1], kw // 2)

        b, t, h, w, c = x.shape
        out = nn.ConvTranspose(
            features=self.out_channels,
            kernel_size=(kt, kh, kw),
            strides=(st, sh, sw),
            padding="VALID",
            use_bias=self.use_bias,
            name="conv_transpose3d",
        )(x)
        return out[:, : t * st, hp : hp + h * sh, wp : wp + w * sw, :]


class DepthToSpaceUpsample(nn.Module):
    """Per-frame 1x1 conv + pixel shuffle (`genie/module/video.py:279-327`)."""

    in_channels: int
    out_channels: Optional[int] = None
    factor: int = 2

    @property
    def st_factor(self) -> float:
        return float(self.factor ** 2)

    @property
    def t_factor(self) -> float:
        return 1.0  # space-only

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        out_ch = default(self.out_channels, self.in_channels)
        f = self.factor
        x = nn.Conv(out_ch * f * f, kernel_size=(1, 1, 1), name="proj")(x)
        return depth_to_space(x, f)


class DepthToTimeUpsample(nn.Module):
    """1x1 conv + depth-to-time shuffle (`genie/module/video.py:329-377`)."""

    in_channels: int
    out_channels: Optional[int] = None
    factor: int = 2

    @property
    def st_factor(self) -> float:
        return float(self.factor)

    @property
    def t_factor(self) -> float:
        return float(self.factor)

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        out_ch = default(self.out_channels, self.in_channels)
        f = self.factor
        x = nn.Conv(out_ch * f, kernel_size=(1, 1, 1), name="proj")(x)
        return depth_to_time(x, f)


class DepthToSpaceTimeUpsample(nn.Module):
    """CausalConv3d + joint spacetime shuffle: the MAGVIT2 decoder upsampler.

    Matches `genie/module/video.py:379-430`.
    """

    in_channels: int
    out_channels: Optional[int] = None
    time_factor: int = 2
    space_factor: int = 2
    kernel_size: IntOr3 = 1

    @property
    def st_factor(self) -> float:
        return float(self.time_factor * self.space_factor ** 2)

    @property
    def t_factor(self) -> float:
        return float(self.time_factor)

    def stream_state_len(self) -> int:
        kt, _, _ = cast_tuple(self.kernel_size, 3)
        return kt - 1

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False,
                 cache=None):
        """Full forward, or streaming decode (`cache` = the inner causal
        conv's trailing input window; see `CausalConv3d.__call__`). In
        streaming mode `m` input frames yield `m * time_factor` pixel
        frames and `(out, new_cache)` is returned."""
        out_ch = default(self.out_channels, self.in_channels)
        p, q = self.time_factor, self.space_factor
        conv = CausalConv3d(
            self.in_channels,
            out_ch * p * q * q,
            kernel_size=self.kernel_size,
            name="conv",
        )
        if cache is not None:
            x, new_cache = conv(x, cache=cache)
            return depth_to_spacetime(x, p, q), new_cache
        return depth_to_spacetime(conv(x), p, q)


class SpaceTimeUpsample(nn.Module):
    """Strided transpose-conv upsample (`genie/module/video.py:432-455`).

    Registered under the blueprint name `spacetime_upsample`, which the
    reference's default latent-action decoder references but its registry
    never actually provided (stale blueprint, `genie/__init__.py:41`).
    """

    in_channels: int
    out_channels: Optional[int] = None
    time_factor: int = 2
    space_factor: int = 2
    kernel_size: IntOr3 = 3  # accepted for blueprint compat; upsample uses factors

    @property
    def st_factor(self) -> float:
        return float(self.time_factor * self.space_factor ** 2)

    @property
    def t_factor(self) -> float:
        return float(self.time_factor)

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        out_ch = default(self.out_channels, self.in_channels)
        t, s = self.time_factor, self.space_factor
        return nn.ConvTranspose(
            features=out_ch,
            kernel_size=(t, s, s),
            strides=(t, s, s),
            padding="VALID",
            name="up",
        )(x)


class SpaceTimeDownsample(nn.Module):
    """Strided causal-conv downsample (`genie/module/video.py:457-483`)."""

    in_channels: int
    kernel_size: IntOr3 = 3
    out_channels: Optional[int] = None
    time_factor: int = 2
    space_factor: int = 2

    @property
    def st_factor(self) -> float:
        # Reciprocal so that enc * dec st_factor products cancel to 1.
        return 1.0 / (self.time_factor * self.space_factor ** 2)

    @property
    def t_factor(self) -> float:
        return 1.0 / self.time_factor

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False):
        return CausalConv3d(
            self.in_channels,
            default(self.out_channels, self.in_channels),
            kernel_size=self.kernel_size,
            stride=(self.time_factor, self.space_factor, self.space_factor),
            name="down",
        )(x)


class BlurPooling3d(nn.Module):
    """Anti-aliased downsample with a constant binomial kernel.

    Matches `genie/module/video.py:487-537` except the per-axis kernel fix.
    Parameter-free. `out_channels`/`num_groups` are accepted for blueprint
    compatibility; the blur is always depthwise.
    """

    in_channels: int
    kernel_size: IntOr3 = 3
    out_channels: Optional[int] = None
    time_factor: int = 2
    space_factor: Union[int, Tuple[int, int]] = 2
    num_groups: int = 1

    @property
    def t_factor(self) -> float:
        return 1.0 / self.time_factor

    def __call__(self, x, cond=None, mask=None, train: bool = False):
        return blur_pool_3d(
            x,
            kernel_size=self.kernel_size,
            time_factor=self.time_factor,
            space_factor=self.space_factor,
        )


class VideoResidualBlock(nn.Module):
    """Two-branch residual block (`genie/module/video.py:539-656`).

    main: Norm -> act -> Conv(k) -> [Down?] -> Norm -> act -> Conv(k)
    res : [Down?] -> 1x1 Conv

    `per_frame_norm=True` restricts the GroupNorm statistics of video input
    to within-frame (see `norm.GroupNorm.per_frame`); with `use_causal=True`
    the whole block is then strictly time-causal, which enables the
    streaming decode path (`VideoTokenizer.decode_stream`) for residual
    decoder stacks -- the serving-grade `magvit2_stream` blueprint.
    """

    in_channels: int
    out_channels: Optional[int] = None
    kernel_size: IntOr3 = 3
    num_groups: int = 1
    pad_mode: str = "constant"
    downsample: Optional[Union[int, Tuple[int, int]]] = None
    use_causal: bool = False
    use_norm: bool = True
    use_blur: bool = True
    act_fn: str = "swish"
    per_frame_norm: bool = False

    @property
    def inp_dim(self) -> int:
        return self.in_channels

    @property
    def out_dim(self) -> int:
        return default(self.out_channels, self.in_channels)

    def stream_state_len(self) -> int:
        """Causal left-pad width of each main-branch conv (streaming state
        frames per conv); the 1x1 residual projection is stateless."""
        kt, _, _ = cast_tuple(self.kernel_size, 3)
        return kt - 1

    @nn.compact
    def __call__(self, x, cond=None, mask=None, train: bool = False,
                 cache=None):
        """Full forward, or streaming single-step decode.

        Streaming mode (`cache` = `{'conv1': window, 'conv2': window}` of
        the two main-branch convs' trailing input frames, see
        `CausalConv3d.__call__`): requires `use_causal`, no downsample, and
        frame-local norms (`per_frame_norm` or `use_norm=False`). Returns
        `(out, new_cache)`, bit-exact vs the batch forward.
        """
        out_ch = default(self.out_channels, self.in_channels)
        k = cast_tuple(self.kernel_size, 3)
        act = _act(self.act_fn)
        down = self.downsample
        if isinstance(down, int):
            down = (down, down)

        def norm(h, name):
            if not self.use_norm:
                return h
            gn = nn.GroupNorm(num_groups=self.num_groups, name=name)
            if self.per_frame_norm and h.ndim == 5:
                b, t = h.shape[:2]
                return gn(h.reshape((b * t,) + h.shape[2:])).reshape(h.shape)
            return gn(h)

        def conv(h, features, kernel, name, conv_cache=None):
            if self.use_causal:
                mod = CausalConv3d(
                    h.shape[-1],
                    features,
                    kernel_size=kernel,
                    pad_mode=self.pad_mode,
                    name=name,
                )
                if conv_cache is not None:
                    return mod(h, cache=conv_cache)
                return mod(h)
            assert conv_cache is None, (
                "streaming VideoResidualBlock requires use_causal=True"
            )
            pad = tuple((kk - 1) // 2 for kk in cast_tuple(kernel, 3))
            return nn.Conv(
                features,
                kernel_size=cast_tuple(kernel, 3),
                padding=tuple((p, p) for p in pad),
                name=name,
            )(h)

        def downsample_op(h, name):
            if down is None:
                return h
            tf, sf = down
            if self.use_blur:
                return blur_pool_3d(
                    h, kernel_size=k, time_factor=tf, space_factor=sf
                )
            return SpaceTimeDownsample(
                h.shape[-1],
                kernel_size=k,
                time_factor=tf,
                space_factor=sf,
                name=name,
            )(h)

        if cache is not None:
            assert self.use_causal and down is None, (
                "streaming VideoResidualBlock: use_causal=True, no downsample"
            )
            assert self.per_frame_norm or not self.use_norm, (
                "streaming VideoResidualBlock requires per_frame_norm "
                "(time-pooled GroupNorm is not causal)"
            )
            h = act(norm(x, "norm1"))
            h, c1 = conv(h, out_ch, k, "conv1", conv_cache=cache["conv1"])
            h = act(norm(h, "norm2"))
            h, c2 = conv(h, out_ch, k, "conv2", conv_cache=cache["conv2"])
            r = conv(x, out_ch, 1, "res_proj")  # 1x1: no temporal state
            return h + r, {"conv1": c1, "conv2": c2}

        # Main branch
        h = norm(x, "norm1")
        h = act(h)
        h = conv(h, out_ch, k, "conv1")
        h = downsample_op(h, "down_main")
        h = norm(h, "norm2")
        h = act(h)
        h = conv(h, out_ch, k, "conv2")

        # Residual branch
        r = downsample_op(x, "down_res")
        r = conv(r, out_ch, 1, "res_proj")

        return h + r
