"""LatentAction VQ-VAE tests (mirrors `/root/reference/test/test_action.py`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.action import LatentAction

KEY = jax.random.PRNGKey(0)

ENC = (
    ("space-time_attn", {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),
    ("spacetime_downsample", {
        "in_channels": 16, "kernel_size": 3, "time_factor": 1, "space_factor": 2,
    }),
)
DEC = (
    ("space-time_attn", {
        "n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8,
        "has_ext": True, "time_attn_kw": {"key_dim": 4},
    }),
    ("spacetime_upsample", {
        "in_channels": 16, "kernel_size": 3, "time_factor": 1, "space_factor": 2,
    }),
)

D_CODE = 4
B, T, H, W = 1, 3, 8, 8


@pytest.fixture(scope="module")
def model_and_params():
    m = LatentAction(
        enc_desc=ENC, dec_desc=DEC, d_codebook=D_CODE,
        inp_shape=(H, W), n_embd=16,
    )
    video = jnp.zeros((B, T, H, W, 3))
    params = m.init(KEY, video, training=False)
    return m, params


def test_forward_shapes_and_loss(model_and_params):
    m, params = model_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    idxs, loss, aux = m.apply(params, video, training=True)
    assert idxs.shape == (B, T)
    assert int(idxs.max()) < 2 ** D_CODE
    assert np.isfinite(float(loss))
    assert float(aux["rec_loss"]) >= 0


def test_encode_returns_action_triplet(model_and_params):
    m, params = model_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    (act, idxs, enc_video), q_loss, _ = m.apply(
        params, video, training=False, method=m.encode
    )
    assert act.shape == (B, T, D_CODE)
    assert idxs.shape == (B, T)
    assert enc_video.shape == (B, T, H // 2, W // 2, 16)
    assert q_loss is None


def test_sample_codebook_rows(model_and_params):
    m, params = model_and_params
    idxs = jnp.array([[0, 3, 2 ** D_CODE - 1]])
    codes = m.apply(params, idxs, method=m.sample)
    assert codes.shape == (1, 3, D_CODE)
    np.testing.assert_array_equal(np.asarray(codes[0, 0]), -np.ones(D_CODE))
    np.testing.assert_array_equal(np.asarray(codes[0, 2]), np.ones(D_CODE))


def test_factor_mismatch_raises():
    bad_dec = (
        ("space-time_attn", {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),
    )  # missing the upsample -> factors do not cancel
    m = LatentAction(enc_desc=ENC, dec_desc=bad_dec, d_codebook=D_CODE, n_embd=16)
    with pytest.raises(AssertionError):
        m.init(KEY, jnp.zeros((1, 2, 8, 8, 3)), training=False)
