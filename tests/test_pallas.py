"""Pallas kernel tests (interpret mode on CPU) vs XLA references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.ops.attention import _xla_attention
from open_genie_tpu.ops.pallas.flash_attention import flash_attention

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_xla(causal):
    b, h, n, d = 1, 2, 256, 32
    q = jax.random.normal(KEY, (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d), jnp.float32)

    out_flash = flash_attention(q, k, v, causal=causal, interpret=True)
    out_ref = _xla_attention(q, k, v, scale=d ** -0.5, causal=causal)
    np.testing.assert_allclose(out_flash, out_ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_grad_matches_xla():
    b, h, n, d = 1, 1, 256, 16
    q = jax.random.normal(KEY, (b, h, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))

    def f_flash(q, k, v):
        return flash_attention(q, k, v, interpret=True).sum()

    def f_ref(q, k, v):
        return _xla_attention(q, k, v, scale=d ** -0.5).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-4)
