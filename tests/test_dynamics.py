"""DynamicsModel tests: forward, masked loss, compiled MaskGIT generate.

Mirrors `/root/reference/test/test_dynamics.py` plus checks on the fixed
semantics (targets = original tokens; committed tokens fed back)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.dynamics import DynamicsModel, get_schedule

KEY = jax.random.PRNGKey(0)

DESC = (("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 8}),)
VOCAB, ACT_VOCAB, EMBED = 64, 8, 32
B, T, H, W = 1, 3, 4, 4


@pytest.fixture(scope="module")
def model_and_params():
    m = DynamicsModel(desc=DESC, tok_vocab=VOCAB, act_vocab=ACT_VOCAB, embed_dim=EMBED)
    toks = jnp.zeros((B, T, H, W), jnp.int32)
    acts = jnp.zeros((B, T), jnp.int32)
    params = m.init(KEY, toks, acts)
    return m, params


def test_forward_logits_shape(model_and_params):
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(KEY, (B, T), 0, ACT_VOCAB)
    logits = m.apply(params, toks, acts)
    assert logits.shape == (B, T, H, W, VOCAB)


def test_compute_loss_scalar_finite(model_and_params):
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(KEY, (B, T), 0, ACT_VOCAB)
    loss, aux = m.apply(
        params, toks, acts, jax.random.PRNGKey(1), method=m.compute_loss
    )
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    assert 0.4 <= float(aux["masked_frac"]) <= 1.0


def test_compute_loss_targets_are_original_tokens(model_and_params):
    """With a full mask and fill=0, the loss must still depend on the true
    token values (reference bug regression check, SURVEY 2.11.2)."""
    m, params = model_and_params
    acts = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T, H, W), bool)
    toks_a = jnp.full((B, T, H, W), 1, jnp.int32)
    toks_b = jnp.full((B, T, H, W), 2, jnp.int32)
    loss_a, _ = m.apply(
        params, toks_a, acts, jax.random.PRNGKey(1), mask=mask,
        method=m.compute_loss,
    )
    loss_b, _ = m.apply(
        params, toks_b, acts, jax.random.PRNGKey(1), mask=mask,
        method=m.compute_loss,
    )
    # Masked inputs are identical (all fill); only the targets differ.
    assert float(loss_a) != float(loss_b)


def test_generate_appends_one_frame(model_and_params):
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(KEY, (B, T), 0, ACT_VOCAB)
    out = m.apply(
        params, toks, acts, jax.random.PRNGKey(2), steps=4, method=m.generate
    )
    assert out.shape == (B, T + 1, H, W)
    # History frames untouched.
    np.testing.assert_array_equal(np.asarray(out[:, :T]), np.asarray(toks))
    assert int(out.max()) < VOCAB and int(out.min()) >= 0


def test_generate_is_jittable(model_and_params):
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(KEY, (B, T), 0, ACT_VOCAB)

    fn = jax.jit(
        lambda p, t, a, k: m.apply(p, t, a, k, steps=4, method=m.generate)
    )
    out = fn(params, toks, acts, jax.random.PRNGKey(2))
    assert out.shape == (B, T + 1, H, W)


@pytest.mark.parametrize("which", ["linear", "cosine", "arccos"])
def test_schedule_sums_to_grid(which):
    for steps, shape in [(4, (4, 4)), (25, (8, 8)), (10, (3, 5))]:
        s = get_schedule(steps, shape, which)
        assert s.sum() == shape[0] * shape[1]
        assert (s >= 1).all() or s[-1] >= 1  # min 1 per step (pre-remainder)
        assert len(s) == steps
