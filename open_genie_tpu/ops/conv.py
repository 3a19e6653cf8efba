"""Functional 3-D convolution primitives, channels-last, TPU-first.

These re-provide the causal-convolution semantics of the reference
(`/root/reference/genie/module/video.py:106-277`) on top of
`lax.conv_general_dilated`, using the TPU-friendly `NDHWC` layout so XLA can
tile the contraction onto the MXU without layout transposes.

Causal semantics (matching the reference exactly):
  * time axis is padded LEFT-only by `(k_t - 1) * dilation_t + (1 - stride_t)`
  * spatial axes are padded symmetrically by `(k - 1) // 2` (or an explicit
    override), so `stride=1` convs are shape-preserving.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from open_genie_tpu.utils import cast_tuple, default

# (batch, time, height, width, channel) activations;
# (time, height, width, in, out) kernels.
DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


def causal_time_pad(kernel_t: int, stride_t: int = 1, dilation_t: int = 1) -> int:
    """Left-only temporal padding preserving causality.

    Mirrors `time_pad = (time_ker - 1) * t_dilation + (1 - t_stride)` from the
    reference (`genie/module/video.py:155`).
    """
    return (kernel_t - 1) * dilation_t + (1 - stride_t)


def causal_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int | Tuple[int, int, int] = 1,
    dilation: int | Tuple[int, int, int] = 1,
    space_padding: Optional[Tuple[int, int]] = None,
    pad_mode: str = "constant",
    precision=None,
) -> jnp.ndarray:
    """Causal 3-D convolution over a `(B, T, H, W, C)` video.

    Args:
      x: input video, channels-last.
      kernel: `(kt, kh, kw, Cin, Cout)` filter.
      bias: optional `(Cout,)` bias.
      stride / dilation: int or per-axis `(t, h, w)` tuples.
      space_padding: optional `(pad_h, pad_w)` symmetric spatial padding
        override; defaults to `(k - 1) // 2` per axis.
      pad_mode: numpy-style mode for the causal pad ('constant', 'edge', ...).
    """
    st, sh, sw = cast_tuple(stride, 3)
    dt, dh, dw = cast_tuple(dilation, 3)
    kt, kh, kw = kernel.shape[:3]

    tp = causal_time_pad(kt, st, dt)
    hp, wp = default(space_padding, ((kh - 1) // 2, (kw - 1) // 2))

    if pad_mode in ("constant", "zeros"):
        padding = ((tp, 0), (hp, hp), (wp, wp))
        out = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(st, sh, sw),
            padding=padding,
            rhs_dilation=(dt, dh, dw),
            dimension_numbers=DIMENSION_NUMBERS,
            precision=precision,
        )
    else:
        # Non-constant pad modes need an explicit jnp.pad before the conv.
        mode = {"replicate": "edge", "reflect": "reflect"}.get(pad_mode, pad_mode)
        x = jnp.pad(
            x, ((0, 0), (tp, 0), (hp, hp), (wp, wp), (0, 0)), mode=mode
        )
        out = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(st, sh, sw),
            padding="VALID",
            rhs_dilation=(dt, dh, dw),
            dimension_numbers=DIMENSION_NUMBERS,
            precision=precision,
        )

    if bias is not None:
        out = out + bias
    return out


def conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int | Tuple[int, int, int] = 1,
    dilation: int | Tuple[int, int, int] = 1,
    padding: int | Tuple[int, int, int] | str = 0,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Plain (non-causal) 3-D convolution over `(B, T, H, W, C)`.

    Equivalent of `torch.nn.Conv3d` with symmetric integer padding.
    """
    st, sh, sw = cast_tuple(stride, 3)
    dt, dh, dw = cast_tuple(dilation, 3)
    if isinstance(padding, str):
        pad = padding
    else:
        pt, ph, pw = cast_tuple(padding, 3)
        pad = ((pt, pt), (ph, ph), (pw, pw))
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(st, sh, sw),
        padding=pad,
        rhs_dilation=(dt, dh, dw),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """2-D convolution over `(B, H, W, C)` (channels-last, `HWIO` kernel)."""
    sh, sw = cast_tuple(stride, 2)
    ph, pw = cast_tuple(padding, 2)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def causal_conv_transpose3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int | Tuple[int, int, int] = 1,
    space_padding: Optional[Tuple[int, int]] = None,
    precision=None,
) -> jnp.ndarray:
    """Causal transpose 3-D convolution.

    Matches the reference `CausalConvTranspose3d`
    (`genie/module/video.py:202-277`): a standard transpose conv with spatial
    padding `k // 2` whose output is trimmed to exactly
    `(t * stride_t, h * stride_h, w * stride_w)` (keeping the leading frames,
    which preserves causality).

    kernel layout: `(kt, kh, kw, Cout, Cin)` (note: transpose convention).
    """
    st, sh, sw = cast_tuple(stride, 3)
    kt, kh, kw = kernel.shape[:3]
    hp, wp = default(space_padding, (kh // 2, kw // 2))

    b, t, h, w, c = x.shape
    # Full ("VALID") transpose conv: output length (n - 1) * s + k per axis.
    out = lax.conv_transpose(
        x,
        kernel,
        strides=(st, sh, sw),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWOI", "NDHWC"),
        transpose_kernel=True,
        precision=precision,
    )
    # Spatial `padding=p` crops p from each side; the reference then trims the
    # result to exactly (t*T, h*H, w*W), keeping the leading (causal) frames.
    out = out[:, : t * st, hp : hp + h * sh, wp : wp + w * sw, :]
    if bias is not None:
        out = out + bias
    return out
