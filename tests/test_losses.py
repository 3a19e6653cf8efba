"""Loss stack tests: discriminators, hinge GAN, perceptual, full tokenizer
objective. Mirrors `/root/reference/test/test_loss.py` and
`test_discriminator.py`."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.modules.discriminator import (
    FrameDiscriminator,
    VideoDiscriminator,
)
from open_genie_tpu.modules.loss import GANLoss, PerceptualLoss

KEY = jax.random.PRNGKey(0)
B, T, H, W = 2, 4, 16, 16


def test_frame_discriminator_logit_shape():
    m = FrameDiscriminator(
        inp_size=(H, W), model_dim=8, dim_mults=(1, 2, 4), down_step=(None, 2, 2),
    )
    x = jax.random.normal(KEY, (3, H, W, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (3,)


def test_frame_discriminator_with_attention():
    m = FrameDiscriminator(
        inp_size=(H, W), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
        use_attn=True, num_heads=2, dim_head=4,
    )
    x = jax.random.normal(KEY, (2, H, W, 3))
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2,)


def test_video_discriminator_logit_shape():
    m = VideoDiscriminator(
        inp_size=(T, H, W), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
    )
    x = jax.random.normal(KEY, (2, T, H, W, 3))
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2,)


@pytest.fixture(scope="module")
def gan_and_params():
    gan = GANLoss(
        discriminate="frames",
        num_frames=2,
        disc_kwargs=dict(
            inp_size=(H, W), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
        ),
    )
    rec = jax.random.uniform(KEY, (B, T, H, W, 3))
    real = jax.random.uniform(jax.random.PRNGKey(1), (B, T, H, W, 3))
    params = gan.init(KEY, rec, real, jax.random.PRNGKey(2), train_gen=False)
    return gan, params, rec, real


def test_gan_dis_loss_nonnegative(gan_and_params):
    gan, params, rec, real = gan_and_params
    dis = gan.apply(params, rec, real, jax.random.PRNGKey(3), train_gen=False)
    assert float(dis) >= 0.0


def test_gan_gen_loss_finite(gan_and_params):
    gan, params, rec, real = gan_and_params
    gen = gan.apply(params, rec, real, jax.random.PRNGKey(3), train_gen=True)
    assert np.isfinite(float(gen))


def test_gan_dis_branch_blocks_generator_grads(gan_and_params):
    """d(dis_loss)/d(rec) must be zero: fake path is stop-gradient'd."""
    gan, params, rec, real = gan_and_params

    def dis_loss(rec):
        return gan.apply(params, rec, real, jax.random.PRNGKey(3), train_gen=False)

    g = jax.grad(dis_loss)(rec)
    np.testing.assert_allclose(np.asarray(g), 0.0)

    def gen_loss(rec):
        return gan.apply(params, rec, real, jax.random.PRNGKey(3), train_gen=True)

    g2 = jax.grad(gen_loss)(rec)
    assert float(jnp.abs(g2).sum()) > 0


def test_perceptual_loss_zero_on_identical():
    perc = PerceptualLoss(num_frames=2)
    video = jax.random.uniform(KEY, (1, T, H, W, 3))
    params = perc.init(KEY, video, video, jax.random.PRNGKey(1))
    loss = perc.apply(params, video, video, jax.random.PRNGKey(2))
    assert float(loss) == pytest.approx(0.0, abs=1e-10)


def test_perceptual_loss_positive_on_different():
    perc = PerceptualLoss(num_frames=2)
    a = jax.random.uniform(KEY, (1, T, H, W, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (1, T, H, W, 3))
    params = perc.init(KEY, a, b, jax.random.PRNGKey(1))
    loss = perc.apply(params, a, b, jax.random.PRNGKey(2))
    assert float(loss) > 0


def test_video_discriminator_causal_mode():
    m = VideoDiscriminator(
        inp_size=(T, H, W), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
        use_causal=True,
    )
    x = jax.random.normal(KEY, (2, T, H, W, 3))
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2,)


def test_gan_video_mode():
    """discriminate='video' judges whole clips (no frame sampling)."""
    gan = GANLoss(
        discriminate="video",
        disc_kwargs=dict(
            inp_size=(T, H, W), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
        ),
    )
    rec = jax.random.uniform(KEY, (2, T, H, W, 3))
    real = jax.random.uniform(jax.random.PRNGKey(1), (2, T, H, W, 3))
    params = gan.init(KEY, rec, real, jax.random.PRNGKey(2), train_gen=False)
    g, d = gan.apply(params, rec, real, jax.random.PRNGKey(3), method=gan.both)
    assert np.isfinite(float(g)) and float(d) >= 0.0
