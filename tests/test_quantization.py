"""LFQ tests: shape contracts, STE gradients, entropy-math parity.

Mirrors `/root/reference/test/test_quantization.py` plus numeric checks the
reference lacks (factorized-vs-naive entropy, gradient flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.modules.quantization import LookupFreeQuantization
from open_genie_tpu.ops.lfq import (
    _lfq_avg_entropy_chunked,
    codebook_entries,
    lfq_avg_probs_direct,
    lfq_quantize,
    lfq_sample_entropy,
)

KEY = jax.random.PRNGKey(0)


def test_quantize_roundtrip_indices():
    d = 6
    x = jax.random.normal(KEY, (4, 7, d))
    code, idxs = lfq_quantize(x, d, training=False)
    # Codebook lookup of the indices reproduces the sign codes.
    looked_up = codebook_entries(idxs, d)
    np.testing.assert_allclose(looked_up, np.sign(np.asarray(x)), atol=0)
    assert idxs.min() >= 0 and idxs.max() < 2 ** d


def test_ste_gradient_is_identity():
    d = 4
    x = jax.random.normal(KEY, (3, d))

    def f(x):
        code, _ = lfq_quantize(x, d, training=True)
        return jnp.sum(code * jnp.arange(1.0, d + 1))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(
        g, np.broadcast_to(np.arange(1.0, d + 1), x.shape), rtol=1e-6
    )


def test_sample_entropy_matches_naive():
    """Closed-form factorized entropy == explicit softmax entropy."""
    d, beta = 6, 3.0
    x = jax.random.normal(KEY, (32, d)) * 0.3
    closed = lfq_sample_entropy(x, beta)

    codes = codebook_entries(jnp.arange(2 ** d), d)
    logits = 2.0 * beta * (x @ codes.T)
    p = jax.nn.softmax(logits, axis=-1)
    naive = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-30)), axis=-1).mean()
    np.testing.assert_allclose(float(closed), float(naive), rtol=1e-3)


def test_avg_entropy_chunked_matches_direct():
    d, beta = 13, 10.0
    x = jax.random.normal(KEY, (64, d)) * 0.1
    q = lfq_avg_probs_direct(x, beta)
    direct = -jnp.sum(q * jnp.log(jnp.maximum(q, 1e-6)))
    chunked = _lfq_avg_entropy_chunked(x, beta, 1e-6)
    np.testing.assert_allclose(float(chunked), float(direct), rtol=5e-3)


def test_module_train_loss():
    lfq = LookupFreeQuantization(codebook_dim=8)
    x = jax.random.normal(KEY, (2, 5, 8))
    params = lfq.init(KEY, x, training=True)
    (out, idxs), loss, aux = lfq.apply(params, x, training=True)
    assert out.shape == x.shape
    assert idxs.shape == (2, 5)
    assert np.isfinite(float(loss))
    assert float(aux["commit_loss"]) >= 0


def test_module_eval_no_loss():
    lfq = LookupFreeQuantization(codebook_dim=8)
    x = jax.random.normal(KEY, (2, 5, 8))
    params = lfq.init(KEY, x, training=False)
    (out, idxs), loss, _ = lfq.apply(params, x, training=False)
    np.testing.assert_allclose(np.abs(np.asarray(out)), 1.0)
    assert loss is None


def test_module_projection_path():
    """input_dim != d*c engages in/out projections."""
    lfq = LookupFreeQuantization(codebook_dim=4, input_dim=16)
    x = jax.random.normal(KEY, (2, 5, 16))
    params = lfq.init(KEY, x, training=False)
    (out, idxs), _, _ = lfq.apply(params, x, training=False)
    assert out.shape == (2, 5, 16)
    assert idxs.shape == (2, 5)


def test_multi_codebook():
    lfq = LookupFreeQuantization(codebook_dim=4, num_codebook=2)
    x = jax.random.normal(KEY, (2, 5, 8))
    params = lfq.init(KEY, x, training=False)
    (out, idxs), _, _ = lfq.apply(params, x, training=False)
    assert out.shape == (2, 5, 8)
    assert idxs.shape == (2, 5, 2)


# ---------------------------------------------------------------------------
# Bit-balance anti-collapse regularizer (round 4; ops/lfq.py)
# ---------------------------------------------------------------------------

def test_bit_balance_scale_invariant():
    """tanh(x / rms(x)) makes the loss independent of the feature scale --
    the property the beta=100 entropy objective lacks (it saturates)."""
    from open_genie_tpu.ops.lfq import lfq_bit_balance_loss

    x = jax.random.normal(KEY, (64, 18))
    base = float(lfq_bit_balance_loss(x))
    for s in (1e-2, 1.0, 1e3):
        np.testing.assert_allclose(
            float(lfq_bit_balance_loss(x * s)), base, rtol=1e-4
        )


def test_bit_balance_restoring_gradient_at_collapse():
    """At a fully collapsed state (every sample the same sign pattern) the
    gradient must be large and restoring -- collapse is NOT absorbing."""
    from open_genie_tpu.ops.lfq import lfq_bit_balance_loss

    pattern = jnp.where(jnp.arange(18) % 3 == 0, 1.0, -1.0)
    x = jnp.tile(pattern, (128, 1)) * 2.0  # |x|~2, trained scale
    x = x + 1e-3 * jax.random.normal(KEY, x.shape)  # break exact ties
    loss, grad = jax.value_and_grad(lfq_bit_balance_loss)(x)
    assert float(loss) > 0.3  # tanh(+-~1)^2 ~ 0.58 balance term
    gnorm = float(jnp.linalg.norm(grad))
    assert gnorm > 1e-3, f"dead gradient at collapse: {gnorm}"
    # A small step along -grad reduces the loss (restoring direction; the
    # linear regime is tiny here because the decorrelation term acts on the
    # 1e-3 noise floor, so probe close in).
    step = 1e-4 * float(jnp.linalg.norm(x)) * grad / gnorm
    after = float(lfq_bit_balance_loss(x - step))
    assert after < float(loss)


def test_bit_balance_near_zero_when_balanced_decorrelated():
    """Random sign patterns (balanced, independent bits) ~ zero loss."""
    from open_genie_tpu.ops.lfq import lfq_bit_balance_loss

    x = jnp.sign(jax.random.normal(KEY, (8192, 18))) * 1.7
    assert float(lfq_bit_balance_loss(x)) < 5e-3


def test_bit_entropy_monitor():
    """Factorized usage bound: ~d*ln2 for random signs, ~0 when collapsed."""
    from open_genie_tpu.ops.lfq import lfq_bit_entropy

    x = jax.random.normal(KEY, (4096, 18))
    healthy = float(lfq_bit_entropy(x))
    assert healthy > 0.95 * 18 * np.log(2)
    collapsed = float(lfq_bit_entropy(jnp.tile(x[:1], (4096, 1))))
    assert collapsed < 1e-3


def test_lfq_loss_entropy_off_bit_balance_on():
    """entropy_weight=0 skips the 2^d sweep (no avg_entropy key) and
    bit_balance_weight>0 contributes; grad is finite and nonzero."""
    from open_genie_tpu.ops.lfq import lfq_loss, lfq_quantize

    x = jax.random.normal(KEY, (32, 18)) * 2.0

    def f(x):
        code, _ = lfq_quantize(x, 18)
        quant = jnp.where(x > 0, 1.0, -1.0)
        loss, aux = lfq_loss(
            x, quant, entropy_weight=0.0, bit_balance_weight=1.0
        )
        return loss, aux

    (loss, aux), grad = jax.value_and_grad(f, has_aux=True)(x)
    assert np.isfinite(float(loss))
    assert "avg_entropy" not in aux
    assert "bit_balance" in aux and "bit_entropy" in aux
    assert float(jnp.abs(grad).max()) > 0


def test_module_bit_balance_plumbed():
    lfq = LookupFreeQuantization(
        codebook_dim=8, entropy_weight=0.0, bit_balance_weight=1.0
    )
    x = jax.random.normal(KEY, (4, 16, 8))
    params = lfq.init(KEY, x, training=True)
    (_, _), loss, aux = lfq.apply(params, x, training=True)
    assert "bit_balance" in aux and "avg_entropy" not in aux
    assert np.isfinite(float(loss))


def test_bit_balance_scale_anneal_lever():
    """`bit_balance_scale` multiplies the balance objective only: loss
    shrinks with the scale, the aux metric stays unscaled (collapse must
    remain visible after the anneal), and scale=1.0 is the exact default."""
    from open_genie_tpu.ops.lfq import lfq_loss

    x = jax.random.normal(KEY, (64, 18)) * 2.0
    quant = jnp.where(x > 0, 1.0, -1.0)

    def run(scale):
        return lfq_loss(
            x, quant, entropy_weight=0.0, bit_balance_weight=1.0,
            bit_balance_scale=scale,
        )

    loss1, aux1 = run(1.0)
    loss_lo, aux_lo = run(jnp.asarray(0.05))
    loss_def, _ = lfq_loss(x, quant, entropy_weight=0.0, bit_balance_weight=1.0)
    assert float(loss1) == float(loss_def)
    np.testing.assert_allclose(float(aux1["bit_balance"]),
                               float(aux_lo["bit_balance"]), rtol=1e-6)
    expected = float(loss1) - 0.95 * float(aux1["bit_balance"])
    np.testing.assert_allclose(float(loss_lo), expected, rtol=1e-5)


def test_bit_balance_anneal_schedule():
    """Trainer anneal kwargs: entropy ramps 1->0, bit balance ramps
    1->floor; both evaluated on a traced step."""
    from open_genie_tpu.train.config import TokenizerModelConfig
    from open_genie_tpu.train.trainer import _entropy_anneal_kwargs

    mcfg = TokenizerModelConfig(
        lfq_bit_balance_anneal_start=100,
        lfq_bit_balance_anneal_steps=100,
        lfq_bit_balance_anneal_floor=0.05,
    )
    kw = _entropy_anneal_kwargs(mcfg)
    assert set(kw) == {"bit_balance_scale"}
    sched = kw["bit_balance_scale"]
    np.testing.assert_allclose(float(sched(0)), 1.0)
    np.testing.assert_allclose(float(sched(100)), 1.0)
    np.testing.assert_allclose(float(sched(150)), 0.5)
    np.testing.assert_allclose(float(sched(200)), 0.05)
    np.testing.assert_allclose(float(sched(10_000)), 0.05)

    mcfg2 = TokenizerModelConfig(lfq_entropy_anneal_start=10,
                                 lfq_entropy_anneal_steps=10)
    kw2 = _entropy_anneal_kwargs(mcfg2)
    assert set(kw2) == {"entropy_scale"}
    np.testing.assert_allclose(float(kw2["entropy_scale"](20)), 0.0)
