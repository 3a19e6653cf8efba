"""Small shared utilities.

TPU-native re-implementation of the helpers in the reference
(`/root/reference/genie/utils.py`). All stochastic helpers take explicit
JAX PRNG keys instead of relying on a global RNG state so that every
model function stays pure and jit-friendly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp

T = TypeVar("T")
D = TypeVar("D")

# A blueprint is a sequence of module names or (name, kwargs) pairs.
# Mirrors the declarative DSL of the reference (`genie/utils.py:13`).
Blueprint = Sequence[Union[str, Tuple[str, Dict[str, Any]]]]


def is_tpu_backend() -> bool:
    """True when the default backend executes on TPU hardware.

    Covers the plain `tpu` platform AND tunneled PJRT plugins that
    register under another name but run on a real chip (this machine's
    remote-TPU plugin registers as `axon`). Every Pallas compile/dispatch
    decision must go through here: testing `== "tpu"` silently sent the
    flash/fused kernels down the XLA (or worse, interpret) path on
    tunneled chips.
    """
    plat = jax.default_backend().lower()
    return plat == "tpu" or "axon" in plat


def exists(var: Optional[T]) -> bool:
    return var is not None


def default(var: Optional[T], val: D) -> Union[T, D]:
    return var if var is not None else val


def cast_tuple(val, length: int) -> tuple:
    """Broadcast a scalar to a tuple of `length`, pass tuples through."""
    if isinstance(val, (tuple, list)):
        out = tuple(val)
        assert len(out) == length, f"expected length-{length} tuple, got {out}"
        return out
    return (val,) * length


def enlarge_as(src: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
    """Append singleton dims to `src` (to the right) to match `other.ndim`.

    Equivalent of the reference helper (`genie/utils.py:21-28`).
    """
    while src.ndim < other.ndim:
        src = src[..., None]
    return src


def pick_frames(
    video: jnp.ndarray,
    frame_idxs: jnp.ndarray,
) -> jnp.ndarray:
    """Gather per-batch frame subsets from a channels-last video.

    Args:
      video: `(B, T, H, W, C)` array.
      frame_idxs: `(B, K)` int array of frame indices per batch element.

    Returns:
      `(B * K, H, W, C)` array of the selected frames (batch-major order),
      matching the semantics of the reference helper (`genie/utils.py:30-56`)
      modulo the channels-last layout.
    """
    b, t, h, w, c = video.shape
    k = frame_idxs.shape[-1]
    batch_idxs = jnp.repeat(jnp.arange(b), k)
    flat_frames = frame_idxs.reshape(-1)
    return video[batch_idxs, flat_frames]


def random_frame_idxs(key: jax.Array, batch: int, t: int, k: int) -> jnp.ndarray:
    """Sample `k` distinct frame indices per batch element -> `(batch, k)`."""
    keys = jax.random.split(key, batch)
    idxs = jax.vmap(lambda kk: jax.random.permutation(kk, t)[:k])(keys)
    return idxs


def enc2dec_name(name: str) -> str:
    return name.replace("downsample", "upsample")


def to_channels_last(video: jnp.ndarray) -> jnp.ndarray:
    """`(B, C, T, H, W)` -> `(B, T, H, W, C)`."""
    return jnp.transpose(video, (0, 2, 3, 4, 1))


def to_channels_first(video: jnp.ndarray) -> jnp.ndarray:
    """`(B, T, H, W, C)` -> `(B, C, T, H, W)`."""
    return jnp.transpose(video, (0, 4, 1, 2, 3))
