"""KV-cached decode parity: cached per-frame logits == full forward.

The cached rollout path (`DynamicsModel.decode_frame`,
`Genie.rollout_tokens`) must be numerically equivalent to the full
re-forward; this pins the temporal KV cache, RoPE offsets, and the causal
FFN window against the reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.dynamics import DynamicsModel

KEY = jax.random.PRNGKey(0)

DESC = (
    ("space-time_attn", {"n_rep": 2, "n_embd": 32, "n_head": 2, "d_head": 8}),
)
VOCAB, ACT_VOCAB, EMBED = 32, 4, 32
B, T, H, W = 2, 5, 4, 4


@pytest.fixture(scope="module")
def model_and_params():
    m = DynamicsModel(desc=DESC, tok_vocab=VOCAB, act_vocab=ACT_VOCAB, embed_dim=EMBED)
    toks = jnp.zeros((B, T, H, W), jnp.int32)
    acts = jnp.zeros((B, T), jnp.int32)
    params = m.init(KEY, toks, acts)
    return m, params


def test_decode_frame_matches_full_forward(model_and_params):
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, ACT_VOCAB)

    full_logits = m.apply(params, toks, acts)  # (B, T, H, W, V)

    cache = m.init_cache(B, H, W, T)
    for t in range(T):
        logits, cache = m.apply(
            params, toks[:, t], acts[:, t], cache, t, method=m.decode_frame
        )
        np.testing.assert_allclose(
            np.asarray(logits),
            np.asarray(full_logits[:, t]),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"frame {t}",
        )


def test_decode_refine_does_not_pollute_cache(model_and_params):
    """Peeking (refine steps) must not change committed history results."""
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, ACT_VOCAB)

    cache = m.init_cache(B, H, W, T)
    for t in range(3):
        _, cache = m.apply(
            params, toks[:, t], acts[:, t], cache, t, method=m.decode_frame
        )

    # Peek at frame 3 with garbage, discarding the returned cache.
    garbage = jnp.full((B, H, W), 7, jnp.int32)
    _, _ = m.apply(params, garbage, acts[:, 3], cache, 3, method=m.decode_frame)

    logits_a, _ = m.apply(
        params, toks[:, 3], acts[:, 3], cache, 3, method=m.decode_frame
    )
    full = m.apply(params, toks, acts)
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(full[:, 3]), rtol=2e-4, atol=2e-4
    )


def test_cached_rollout_matches_full_rollout():
    """End-to-end: the cached Genie rollout equals the full-buffer rollout
    token-for-token under the same PRNG keys (tiny model, f32)."""
    from open_genie_tpu.models.genie import Genie
    from tests.test_genie import CFG

    model = Genie(**CFG)
    video = jnp.zeros((1, 4, 16, 16, 3))
    params = model.init(KEY, video, KEY, method=model.init_full)

    tokens = jax.random.randint(KEY, (1, 2, 4, 4), 0, 2 ** 6)
    actions = jnp.zeros((1, 5), jnp.int32)
    k = jax.random.PRNGKey(3)

    fast = model.apply(params, tokens, actions, k, num_frames=3,
                       steps_per_frame=3, method=model.rollout_tokens)
    slow = model.apply(params, tokens, actions, k, num_frames=3,
                       steps_per_frame=3, method=model.rollout_tokens_full)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_generate_cached_matches_full(model_and_params):
    """DynamicsModel.generate: cached path == full re-forward path."""
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, ACT_VOCAB)
    k = jax.random.PRNGKey(9)

    fast = m.apply(params, toks, acts, k, steps=4, method=m.generate)
    slow = m.apply(
        params, toks, acts, k, steps=4, use_cache=False, method=m.generate
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_decode_frame_readonly_matches_commit(model_and_params):
    """`commit=False` (read-only refinement) must produce the same logits
    as the buffer-writing path and must return the cache UNCHANGED --
    the no-copy fast path for MaskGIT refine loops."""
    m, params = model_and_params
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, ACT_VOCAB)

    cache = m.init_cache(B, H, W, T)
    for t in range(T - 1):
        _, cache = m.apply(
            params, toks[:, t], acts[:, t], cache, t, method=m.decode_frame
        )

    t = T - 1
    logits_w, _ = m.apply(
        params, toks[:, t], acts[:, t], cache, t, method=m.decode_frame
    )
    logits_r, cache_r = m.apply(
        params, toks[:, t], acts[:, t], cache, t, commit=False,
        method=m.decode_frame,
    )
    np.testing.assert_allclose(
        np.asarray(logits_r), np.asarray(logits_w), rtol=2e-4, atol=2e-4
    )
    for got, want in zip(cache_r, cache):
        for k in ("k", "v", "ffn", "fh"):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def _randomized(params, scale=0.3):
    """Perturb every param with noise: init-value params (GN scale=1,
    bias=0) mask handling bugs in the decode path's manual GN/conv."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, leaves)


def test_decode_matches_full_with_trained_like_params(model_and_params):
    """Decode-vs-full parity must hold for NON-init params too: the FFN
    window caches post-GN features precisely so that sequence-start zero
    padding stays exact when GroupNorm bias != 0 (with pre-GN caching,
    GN(0) = bias leaked into the first k_t - 1 positions)."""
    m, params = model_and_params
    params = _randomized(params)
    toks = jax.random.randint(KEY, (B, T, H, W), 0, VOCAB)
    acts = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, ACT_VOCAB)

    full_logits = m.apply(params, toks, acts)

    cache = m.init_cache(B, H, W, T)
    for t in range(T):
        # read-only probe first: must equal the committed-step logits
        logits_r, _ = m.apply(
            params, toks[:, t], acts[:, t], cache, t, commit=False,
            method=m.decode_frame,
        )
        logits, cache = m.apply(
            params, toks[:, t], acts[:, t], cache, t, method=m.decode_frame
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, t]),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(logits_r), np.asarray(logits), rtol=2e-3, atol=2e-3
        )
