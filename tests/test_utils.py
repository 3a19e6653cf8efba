"""Utility-helper contract tests (reference `genie/utils.py` equivalents)."""
import jax
import jax.numpy as jnp
import numpy as np

from open_genie_tpu.utils import (
    cast_tuple,
    default,
    enc2dec_name,
    enlarge_as,
    exists,
    pick_frames,
    to_channels_first,
    to_channels_last,
)


def test_exists_default():
    assert exists(0) and exists("") and not exists(None)
    assert default(None, 5) == 5
    assert default(3, 5) == 3


def test_cast_tuple():
    assert cast_tuple(2, 3) == (2, 2, 2)
    assert cast_tuple((1, 2), 2) == (1, 2)


def test_enlarge_as():
    src = jnp.ones((2, 3))
    other = jnp.ones((2, 3, 4, 5))
    out = enlarge_as(src, other)
    assert out.shape == (2, 3, 1, 1)
    # broadcasting against `other` works, the reference helper's purpose
    assert (out * other).shape == other.shape


def test_pick_frames_gathers_per_batch():
    video = jnp.arange(2 * 4 * 1 * 1 * 1, dtype=jnp.float32).reshape(2, 4, 1, 1, 1)
    idxs = jnp.asarray([[0, 2], [3, 1]])
    out = pick_frames(video, idxs)
    assert out.shape == (4, 1, 1, 1)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1), [0, 2, 7, 5]
    )


def test_enc2dec_name():
    assert enc2dec_name("spacetime_downsample") == "spacetime_upsample"
    assert enc2dec_name("causal-conv3d") == "causal-conv3d"


def test_layout_shims_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 4, 5, 6))
    cf = to_channels_first(x)
    assert cf.shape == (2, 6, 3, 4, 5)
    np.testing.assert_array_equal(np.asarray(to_channels_last(cf)), np.asarray(x))
