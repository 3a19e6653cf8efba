"""Evaluation metrics: PSNR / SSIM / codebook stats / tokenizer harness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.eval import codebook_stats, evaluate_tokenizer, psnr, ssim


def test_psnr_exact_value():
    a = jnp.zeros((2, 4, 8, 8, 3))
    b = jnp.full((2, 4, 8, 8, 3), 0.1)
    out = psnr(a, b)
    assert out.shape == (2,)
    np.testing.assert_allclose(out, 10 * np.log10(1.0 / 0.01), rtol=1e-5)


def test_psnr_identity_is_capped_high():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 8, 8, 3))
    assert float(psnr(x, x)[0]) >= 90.0


def test_ssim_identity_and_ordering():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 3, 24, 24, 3))
    assert np.allclose(ssim(x, x), 1.0, atol=1e-5)

    small = jnp.clip(x + 0.02 * jax.random.normal(key, x.shape), 0, 1)
    large = jnp.clip(x + 0.3 * jax.random.normal(key, x.shape), 0, 1)
    s_small, s_large = float(ssim(x, small).mean()), float(ssim(x, large).mean())
    assert 0.0 < s_large < s_small < 1.0


def test_ssim_image_batch_shape():
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 16, 1))
    assert ssim(x, x).shape == (3,)


def test_codebook_stats_uniform_and_collapsed():
    vocab = 16
    uniform = jnp.tile(jnp.arange(vocab), 8)
    s = jax.device_get(codebook_stats(uniform, vocab))
    assert s["usage"] == pytest.approx(1.0)
    assert s["perplexity"] == pytest.approx(vocab, rel=1e-4)
    assert s["entropy_bits"] == pytest.approx(4.0, rel=1e-4)

    collapsed = jnp.zeros(128, jnp.int32)
    s = jax.device_get(codebook_stats(collapsed, vocab))
    assert s["usage"] == pytest.approx(1 / vocab)
    assert s["perplexity"] == pytest.approx(1.0, rel=1e-4)


def test_evaluate_tokenizer_smoke():
    from open_genie_tpu.models.tokenizer import VideoTokenizer

    tok = VideoTokenizer(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 16,
                "time_factor": 1, "space_factor": 2,
            }),
            ("causal-conv3d", {"in_channels": 16, "out_channels": 6,
                               "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 6, "out_channels": 16,
                               "kernel_size": 3}),
            ("depth2spacetime_upsample", {
                "in_channels": 16, "out_channels": 3, "kernel_size": 3,
                "time_factor": 1, "space_factor": 2,
            }),
        ),
        d_codebook=6,
    )
    video = jnp.zeros((1, 2, 16, 16, 3))
    params = jax.jit(lambda k: tok.init(k, video, train=False))(
        jax.random.PRNGKey(0)
    )

    batches = [np.random.default_rng(i).uniform(size=(1, 2, 16, 16, 3))
               .astype(np.float32) for i in range(3)]
    report = evaluate_tokenizer(tok, params, batches, max_batches=2)
    assert report["num_batches"] == 2
    for k in ("psnr", "ssim", "rec_mse", "usage", "perplexity",
              "distinct_codes", "factorized_perplexity", "num_tokens"):
        assert np.isfinite(report[k]), k
    assert -1.0 <= report["ssim"] <= 1.0
    # Codebook stats are pooled over the whole eval set, not averaged
    # per-batch: tokens counted must equal both batches' token totals
    # (2 frames x 8x8 grid x 2 batches), and perplexity must never
    # exceed the pooled distinct-code count.
    assert report["num_tokens"] == 2 * 2 * 8 * 8
    assert report["perplexity"] <= report["distinct_codes"] + 1e-6
    assert report["factorized_perplexity"] <= 2 ** 6 + 1e-6
    # usage is normalized by the vocab; usage_of_sampled_ceiling by what
    # this sample size could at most have hit (min(num_tokens, vocab)).
    assert report["usage_of_sampled_ceiling"] == pytest.approx(
        report["distinct_codes"] / min(report["num_tokens"], 2 ** 6))
    assert report["usage"] <= report["usage_of_sampled_ceiling"] + 1e-9


def test_evaluate_genie_smoke():
    from open_genie_tpu.eval import evaluate_genie
    from tests.test_genie import CFG
    from open_genie_tpu.models.genie import Genie

    model = Genie(**CFG)
    video = jnp.zeros((1, 4, 16, 16, 3))
    key = jax.random.PRNGKey(0)
    params = model.init(key, video, key, method=model.init_full)["params"]

    batches = [np.random.default_rng(i).uniform(size=(1, 4, 16, 16, 3))
               .astype(np.float32) for i in range(2)]
    report = evaluate_genie(model, params, batches, key)
    assert report["num_batches"] == 2
    for k in ("loss", "act_loss", "dyn_loss", "dyn_masked_acc",
              "act_code_usage", "act_code_perplexity"):
        assert np.isfinite(report[k]), k
    assert 0.0 < report["act_code_usage"] <= 1.0


def test_evaluate_tokenizer_empty_loader_raises():
    from open_genie_tpu.models.tokenizer import VideoTokenizer

    tok = VideoTokenizer(
        enc_desc=(("causal-conv3d", {"in_channels": 3, "out_channels": 4,
                                     "kernel_size": 1}),),
        dec_desc=(("causal-conv3d", {"in_channels": 4, "out_channels": 3,
                                     "kernel_size": 1}),),
        d_codebook=4,
    )
    with pytest.raises(ValueError):
        evaluate_tokenizer(tok, {}, [])


def test_evaluate_dynamics_smoke():
    from open_genie_tpu.eval import evaluate_dynamics
    from open_genie_tpu.models.dynamics import DynamicsModel

    dyn = DynamicsModel(
        desc=(("space-time_attn",
               {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),),
        tok_vocab=16, act_vocab=4, embed_dim=16,
    )
    key = jax.random.PRNGKey(0)
    toks = jnp.zeros((1, 3, 4, 4), jnp.int32)
    acts = jnp.zeros((1, 3), jnp.int32)
    params = dyn.init(key, toks, acts)["params"]

    rng = np.random.default_rng(0)
    batches = [{
        "tokens": rng.integers(0, 16, (2, 3, 4, 4)).astype(np.int32),
        "actions": rng.integers(0, 4, (2, 3)).astype(np.int32),
    } for _ in range(3)]
    report = evaluate_dynamics(dyn, params, batches, key, max_batches=2)
    assert report["num_batches"] == 2
    for k in ("loss", "masked_acc", "masked_frac"):
        assert np.isfinite(report[k]), k


def test_action_controllability_metric():
    """Divergence metric contract: deterministic given the key, branch set
    A (distinct actions, shared sampling key) and branch set B (shared
    actions, distinct keys) both yield finite non-negative divergences,
    and identical-everything branches would diverge zero (implicitly: the
    same-action same-key pair distance is excluded by construction)."""
    from open_genie_tpu.eval import action_controllability
    from tests.test_genie import CFG
    from open_genie_tpu.models.genie import Genie

    model = Genie(**CFG)
    video = jnp.zeros((1, 4, 16, 16, 3))
    key = jax.random.PRNGKey(0)
    params = model.init(key, video, key, method=model.init_full)["params"]

    prompt = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 16, 16, 3)),
        jnp.float32,
    )
    report = action_controllability(
        model, {"params": params}, prompt, jax.random.PRNGKey(3),
        num_frames=2, steps_per_frame=2, n_branches=2,
    )
    for k in ("action_divergence", "seed_divergence",
              "action_to_noise_ratio"):
        assert np.isfinite(report[k]) and report[k] >= 0.0, k
    # deterministic given the key
    again = action_controllability(
        model, {"params": params}, prompt, jax.random.PRNGKey(3),
        num_frames=2, steps_per_frame=2, n_branches=2,
    )
    assert report["action_divergence"] == again["action_divergence"]
    assert report["seed_divergence"] == again["seed_divergence"]


def test_action_controllability_pool_restriction():
    """With `action_pool`, every sampled test action comes from the pool
    (ids outside the trained set index embeddings the dynamics never saw;
    uniform-over-vocab sampling reads ~1.0 even for a controllable
    model). A single-id pool makes branch set A identical -> zero action
    divergence, the tightest possible check that the pool is honored."""
    from open_genie_tpu.eval import action_controllability
    from open_genie_tpu.models.genie import Genie
    from tests.test_genie import CFG

    model = Genie(**CFG)
    video = jnp.zeros((1, 4, 16, 16, 3))
    key = jax.random.PRNGKey(0)
    params = model.init(key, video, key, method=model.init_full)["params"]
    prompt = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 16, 16, 3)),
        jnp.float32,
    )
    report = action_controllability(
        model, {"params": params}, prompt, jax.random.PRNGKey(3),
        num_frames=2, steps_per_frame=2, n_branches=2,
        action_pool=np.asarray([5]),
    )
    assert report["controllability_pool"] == 1.0
    assert report["action_divergence"] == 0.0
    assert report["seed_divergence"] >= 0.0
