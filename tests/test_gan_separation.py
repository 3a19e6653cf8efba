"""GAN gradient-separation tests: the single-optimizer objective must send
zero generator-loss gradient into the discriminator and vice versa."""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.modules.loss import GANLoss

KEY = jax.random.PRNGKey(0)
B, T, H, W = 1, 4, 16, 16


@pytest.fixture(scope="module")
def gan_and_inputs():
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
    return gan, params["params"], rec, real


def test_gen_loss_gradient_skips_disc_params(gan_and_inputs):
    gan, params, rec, real = gan_and_inputs

    def gen_only(params, rec):
        g, d = gan.apply({"params": params}, rec, real, jax.random.PRNGKey(3),
                         method=gan.both)
        return g

    gparams = jax.grad(gen_only)(params, rec)
    flat = flax.traverse_util.flatten_dict(gparams)
    total = sum(float(jnp.abs(v).sum()) for v in flat.values())
    assert total == pytest.approx(0.0, abs=1e-6), (
        "generator loss must not move discriminator params"
    )
    # ...but it must move the reconstruction.
    grec = jax.grad(lambda rec: gen_only(params, rec))(rec)
    assert float(jnp.abs(grec).sum()) > 0


def test_dis_loss_gradient_skips_generator_path(gan_and_inputs):
    gan, params, rec, real = gan_and_inputs

    def dis_only(rec):
        g, d = gan.apply({"params": params}, rec, real, jax.random.PRNGKey(3),
                         method=gan.both)
        return d

    grec = jax.grad(dis_only)(rec)
    np.testing.assert_allclose(np.asarray(grec), 0.0)


def test_alternating_gen_branch_skips_disc_params(gan_and_inputs):
    """`gan_alternate` mode calls `__call__(train_gen=True)` under an
    all-params optimizer: its gradient w.r.t. D's params must be exactly
    zero (same cancellation as `both()`), else every generator step pushes
    D to inflate fake scores."""
    gan, params, rec, real = gan_and_inputs

    def gen_branch(params, rec):
        return gan.apply({"params": params}, rec, real, jax.random.PRNGKey(3),
                         train_gen=True)

    gparams = jax.grad(gen_branch)(params, rec)
    flat = flax.traverse_util.flatten_dict(gparams)
    total = sum(float(jnp.abs(v).sum()) for v in flat.values())
    assert total == pytest.approx(0.0, abs=1e-6)
    grec = jax.grad(lambda rec: gen_branch(params, rec))(rec)
    assert float(jnp.abs(grec).sum()) > 0


def test_alternating_dis_branch_skips_generator_path(gan_and_inputs):
    gan, params, rec, real = gan_and_inputs

    def dis_branch(rec):
        return gan.apply({"params": params}, rec, real, jax.random.PRNGKey(3),
                         train_gen=False)

    grec = jax.grad(dis_branch)(rec)
    np.testing.assert_allclose(np.asarray(grec), 0.0)


def test_both_values_match_separate_branches(gan_and_inputs):
    gan, params, rec, real = gan_and_inputs
    k = jax.random.PRNGKey(3)
    g2, d2 = gan.apply({"params": params}, rec, real, k, method=gan.both)
    g1 = gan.apply({"params": params}, rec, real, k, train_gen=True)
    d1 = gan.apply({"params": params}, rec, real, k, train_gen=False)
    np.testing.assert_allclose(float(g2), float(g1), rtol=1e-5)
    np.testing.assert_allclose(float(d2), float(d1), rtol=1e-5)
