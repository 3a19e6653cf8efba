"""Pallas LFQ entropy kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.ops.lfq import lfq_avg_probs_direct
from open_genie_tpu.ops.pallas.lfq_entropy import lfq_avg_entropy_pallas

KEY = jax.random.PRNGKey(0)


def _ref_entropy(x, beta, eps=1e-6):
    q = lfq_avg_probs_direct(x, beta)
    return -jnp.sum(q * jnp.log(jnp.maximum(q, eps)))


@pytest.mark.parametrize("n,d", [(64, 8), (100, 10)])
def test_forward_matches_direct(n, d):
    x = jax.random.normal(KEY, (n, d)) * 0.1
    beta = 10.0
    ent = lfq_avg_entropy_pallas(
        x, beta, 1e-6, 32, 256, True  # interpret mode
    )
    ref = _ref_entropy(x, beta)
    np.testing.assert_allclose(float(ent), float(ref), rtol=5e-3)


def test_gradient_matches_autodiff():
    n, d, beta = 64, 8, 5.0
    x = jax.random.normal(KEY, (n, d)) * 0.2

    g_pallas = jax.grad(
        lambda x: lfq_avg_entropy_pallas(x, beta, 1e-6, 32, 256, True)
    )(x)
    g_ref = jax.grad(lambda x: _ref_entropy(x, beta))(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_ref), rtol=2e-2, atol=2e-4
    )


def test_token_padding():
    """n not a multiple of the token block: padded rows contribute zero."""
    d, beta = 8, 5.0
    x = jax.random.normal(KEY, (33, d)) * 0.1
    ent = lfq_avg_entropy_pallas(x, beta, 1e-6, 32, 256, True)
    ref = _ref_entropy(x, beta)
    np.testing.assert_allclose(float(ent), float(ref), rtol=5e-3)


def test_fused_head_matches_reference():
    """Fused 1x1-conv + LFQ head == matmul + sign + bit-pack."""
    from open_genie_tpu.ops.lfq import bit_mask
    from open_genie_tpu.ops.pallas.lfq_head import lfq_head

    c, d = 32, 10
    x = jax.random.normal(KEY, (2, 3, 4, 4, c))
    w = jax.random.normal(jax.random.PRNGKey(1), (c, d)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (d,)) * 0.1

    codes, idxs = lfq_head(x, w, b, block=16, interpret=True)

    z = x @ w + b
    ref_codes = jnp.where(z > 0, 1.0, -1.0)
    ref_idxs = jnp.sum((z > 0).astype(jnp.int32) * bit_mask(d), axis=-1)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idxs))
