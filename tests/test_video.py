"""Shape-contract and semantics tests for video primitives.

Mirrors the reference suite (`/root/reference/test/test_video.py`) plus
causality checks the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.modules.video import (
    BlurPooling3d,
    CausalConv3d,
    CausalConvTranspose3d,
    DepthToSpaceTimeUpsample,
    DepthToSpaceUpsample,
    DepthToTimeUpsample,
    SpaceTimeDownsample,
    SpaceTimeUpsample,
    VideoResidualBlock,
)

KEY = jax.random.PRNGKey(0)
B, T, H, W, C = 2, 8, 16, 16, 4


def init_apply(mod, x, **kw):
    params = mod.init(KEY, x, **kw)
    return mod.apply(params, x, **kw)


def test_causal_conv3d_shape():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = init_apply(CausalConv3d(C, 8, kernel_size=3), x)
    assert out.shape == (B, T, H, W, 8)


def test_causal_conv3d_strided_shape():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = init_apply(CausalConv3d(C, 8, kernel_size=3, stride=(2, 2, 2)), x)
    assert out.shape == (B, T // 2, H // 2, W // 2, 8)


def test_causal_conv3d_is_causal():
    """Output at frame t must not depend on frames > t."""
    mod = CausalConv3d(C, 8, kernel_size=3)
    x = jax.random.normal(KEY, (1, T, H, W, C))
    params = mod.init(KEY, x)
    y0 = mod.apply(params, x)
    # Perturb the last frame only; earlier outputs must be identical.
    x2 = x.at[:, -1].set(jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C)))
    y1 = mod.apply(params, x2)
    np.testing.assert_allclose(y0[:, :-1], y1[:, :-1], rtol=1e-6)
    assert not np.allclose(y0[:, -1], y1[:, -1])


def test_causal_conv_transpose3d_shape():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = init_apply(
        CausalConvTranspose3d(C, 8, kernel_size=3, stride=(2, 2, 2)), x
    )
    assert out.shape == (B, T * 2, H * 2, W * 2, 8)


@pytest.mark.parametrize(
    "cls,kw,t_up,s_up",
    [
        (DepthToSpaceUpsample, dict(factor=2), 1, 2),
        (DepthToTimeUpsample, dict(factor=2), 2, 1),
        (DepthToSpaceTimeUpsample, dict(time_factor=2, space_factor=2), 2, 2),
        (SpaceTimeUpsample, dict(time_factor=2, space_factor=2), 2, 2),
    ],
)
def test_upsamplers(cls, kw, t_up, s_up):
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = init_apply(cls(in_channels=C, out_channels=8, **kw), x)
    assert out.shape == (B, T * t_up, H * s_up, W * s_up, 8)


def test_spacetime_downsample():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    mod = SpaceTimeDownsample(C, kernel_size=3, time_factor=2, space_factor=2)
    out = init_apply(mod, x)
    assert out.shape == (B, T // 2, H // 2, W // 2, C)
    assert mod.st_factor == pytest.approx(1 / 8)


def test_factor_cancellation():
    down = SpaceTimeDownsample(C, kernel_size=3, time_factor=2, space_factor=2)
    up = DepthToSpaceTimeUpsample(C, time_factor=2, space_factor=2)
    assert down.st_factor * up.st_factor == pytest.approx(1.0)


def test_blur_pooling3d():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = BlurPooling3d(C, kernel_size=3)(x)
    assert out.shape == (B, T // 2, H // 2, W // 2, C)
    # Constant input stays constant under a normalized blur (interior).
    const = jnp.ones((1, T, H, W, C))
    out_c = BlurPooling3d(C, kernel_size=3)(const)
    np.testing.assert_allclose(out_c[:, 1:-1, 1:-1, 1:-1], 1.0, rtol=1e-5)


def test_video_residual_block():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = init_apply(VideoResidualBlock(C, 8), x)
    assert out.shape == (B, T, H, W, 8)


def test_video_residual_block_downsample():
    x = jax.random.normal(KEY, (B, T, H, W, C))
    out = init_apply(VideoResidualBlock(C, 8, downsample=2), x)
    assert out.shape == (B, T // 2, H // 2, W // 2, 8)
