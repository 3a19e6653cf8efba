"""Up/down-sampling primitives for channels-last video, TPU-first.

Functional equivalents of the reference samplers
(`/root/reference/genie/module/video.py:279-537`,
`/root/reference/genie/module/image.py:17-102`): binomial (Pascal) blur
kernels, pixel-shuffle style depth-to-space/time expansions, and anti-aliased
blur-pooling. The non-square blur-kernel bug of the reference
(`video.py:39,47` uses `kernel_size[0]` for every axis) is fixed here: each
axis uses its own binomial row.
"""
from __future__ import annotations

from math import comb
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from open_genie_tpu.ops.conv import conv2d, conv3d
from open_genie_tpu.utils import cast_tuple


def binomial_kernel_1d(k: int) -> np.ndarray:
    return np.asarray([comb(k - 1, i) for i in range(k)], dtype=np.float32)


def blur_kernel_2d(kernel_size: int | Tuple[int, int], norm: bool = True) -> jnp.ndarray:
    """2-D separable binomial blur kernel `(kh, kw)`."""
    kh, kw = cast_tuple(kernel_size, 2)
    ker = np.outer(binomial_kernel_1d(kh), binomial_kernel_1d(kw))
    if norm:
        ker = ker / ker.sum()
    return jnp.asarray(ker)


def blur_kernel_3d(
    kernel_size: int | Tuple[int, int, int], norm: bool = True
) -> jnp.ndarray:
    """3-D separable binomial blur kernel `(kt, kh, kw)`."""
    kt, kh, kw = cast_tuple(kernel_size, 3)
    ker = np.einsum(
        "t,h,w->thw",
        binomial_kernel_1d(kt),
        binomial_kernel_1d(kh),
        binomial_kernel_1d(kw),
    )
    if norm:
        ker = ker / ker.sum()
    return jnp.asarray(ker)


def blur_pool_3d(
    x: jnp.ndarray,
    kernel_size: int | Tuple[int, int, int] = 3,
    time_factor: int = 2,
    space_factor: int | Tuple[int, int] = 2,
) -> jnp.ndarray:
    """Anti-aliased strided downsample of `(B, T, H, W, C)` video.

    Depthwise (grouped) conv with a constant binomial kernel, stride =
    `(time_factor, space_factor, space_factor)`; equivalent of the reference
    `BlurPooling3d` (`genie/module/video.py:487-537`) with `num_groups=C`
    semantics expressed as an XLA depthwise conv (feature_group_count = C).
    """
    c = x.shape[-1]
    sf = cast_tuple(space_factor, 2)
    kt, kh, kw = cast_tuple(kernel_size, 3)
    ker = blur_kernel_3d((kt, kh, kw))
    # Depthwise kernel: (kt, kh, kw, 1, C) with feature_group_count=C.
    ker = jnp.tile(ker[:, :, :, None, None], (1, 1, 1, 1, c)).astype(x.dtype)
    pad = ((kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2)
    return conv3d(
        x, ker, stride=(time_factor, sf[0], sf[1]), padding=pad, groups=c
    )


def blur_pool_2d(
    x: jnp.ndarray,
    kernel_size: int | Tuple[int, int] = 3,
    stride: int | Tuple[int, int] = 2,
) -> jnp.ndarray:
    """Anti-aliased strided downsample of `(B, H, W, C)` images.

    Equivalent of `BlurPooling2d` (`genie/module/image.py:45-83`).
    """
    c = x.shape[-1]
    kh, kw = cast_tuple(kernel_size, 2)
    sh, sw = cast_tuple(stride, 2)
    ker = blur_kernel_2d((kh, kw))
    ker = jnp.tile(ker[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    pad = ((kh - 1) // sh, (kw - 1) // sw)
    return conv2d(x, ker, stride=(sh, sw), padding=pad, groups=c)


def depth_to_space(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """`(B, T, H, W, C * f^2)` -> `(B, T, H, f*H? ...)` pixel shuffle.

    Channel order matches the reference einops pattern
    `(c p q) h w -> c (h p) (w q)` (`genie/module/video.py:313`), i.e. the
    *leading* channel blocks carry the output channels.
    """
    b, t, h, w, cpq = x.shape
    c = cpq // (factor * factor)
    x = x.reshape(b, t, h, w, c, factor, factor)
    # (b t h w c p q) -> (b t h p w q c)
    x = jnp.transpose(x, (0, 1, 2, 5, 3, 6, 4))
    return x.reshape(b, t, h * factor, w * factor, c)


def depth_to_time(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """`(B, T, H, W, C * f)` -> `(B, f*T, H, W, C)` along the time axis.

    Matches `(c f) t -> c (t f)` from the reference
    (`genie/module/video.py:363`).
    """
    b, t, h, w, cf = x.shape
    c = cf // factor
    x = x.reshape(b, t, h, w, c, factor)
    # (b t h w c f) -> (b t f h w c)
    x = jnp.transpose(x, (0, 1, 5, 2, 3, 4))
    return x.reshape(b, t * factor, h, w, c)


def depth_to_spacetime(
    x: jnp.ndarray, time_factor: int, space_factor: int
) -> jnp.ndarray:
    """`(B, T, H, W, C * p * q * r)` -> `(B, p*T, q*H, r*W, C)` joint shuffle.

    Matches the reference decoder upsampler pattern
    `(c p q r) t h w -> c (t p) (h q) (w r)` (`genie/module/video.py:404`).
    """
    p, q, r = time_factor, space_factor, space_factor
    b, t, h, w, cpqr = x.shape
    c = cpqr // (p * q * r)
    x = x.reshape(b, t, h, w, c, p, q, r)
    # (b t h w c p q r) -> (b t p h q w r c)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))
    return x.reshape(b, t * p, h * q, w * r, c)


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Inverse pixel shuffle on `(B, H, W, C)` images.

    Matches `b c (h p) (w q) -> b (c p q) h w` (`genie/module/image.py:93`).
    """
    b, h, w, c = x.shape
    p = q = factor
    x = x.reshape(b, h // p, p, w // q, q, c)
    # -> (b h w c p q)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(b, h // p, w // q, c * p * q)
