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


def test_maskgit_commit_semantics():
    """Commits exactly `num_tokens` highest-confidence masked positions,
    never touches unmasked ones, and sampled ids come from the logits'
    categorical draw."""
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.models.dynamics import maskgit_commit

    b, hw, v = 2, 12, 7
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (b, hw, v)) * 4.0
    mask = jnp.ones((b, hw), bool).at[:, :3].set(False)  # 3 already committed
    code = jnp.full((b, hw), 5, jnp.int32)

    num = 4
    new_mask, new_code = jax.jit(
        lambda k, l, m, c: maskgit_commit(k, l, m, c, num)
    )(key, logits, mask, code)

    committed = mask & ~new_mask
    assert int(committed.sum(axis=-1)[0]) == num
    assert int(committed.sum(axis=-1)[1]) == num
    # unmasked positions unchanged (still mask=False, code untouched)
    assert not bool(new_mask[:, :3].any())
    assert (new_code[:, :3] == 5).all()
    # newly committed codes are valid vocab ids
    assert int(new_code[committed].min()) >= 0
    assert int(new_code[committed].max()) < v

    # committing hw tokens finishes the frame
    m2, c2 = maskgit_commit(key, logits, mask, code, hw)
    assert not bool(m2.any())


def test_maskgit_commit_sampling_matches_softmax():
    """The categorical draw is distributed as softmax(logits): empirical
    frequencies over many positions match the analytic probabilities
    (sampler-agnostic -- held for both Gumbel-argmax and the rejected
    inverse-CDF variant)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.models.dynamics import maskgit_commit

    v, n = 5, 4096
    logits_row = jnp.asarray([2.0, 0.0, 1.0, -1.0, 0.5])
    logits = jnp.tile(logits_row, (1, n, 1))
    mask = jnp.ones((1, n), bool)
    code = jnp.zeros((1, n), jnp.int32)
    # commit everything in one step: code becomes the raw categorical draw
    _, draws = jax.jit(
        lambda k: maskgit_commit(k, logits, mask, code, n)
    )(jax.random.PRNGKey(0))

    freq = np.bincount(np.asarray(draws[0]), minlength=v) / n
    want = np.asarray(jax.nn.softmax(logits_row))
    np.testing.assert_allclose(freq, want, atol=0.03)


def test_maskgit_commit_top_k():
    """top_k=1 is greedy decoding; top_k=2 only ever draws the two
    highest-logit tokens (the reference's declared-but-dead `topk`,
    SURVEY 2.11.2, implemented with intended semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.models.dynamics import maskgit_commit

    n = 256
    logits = jnp.tile(jnp.asarray([1.0, 3.0, 0.0, 2.0]), (1, n, 1))
    mask = jnp.ones((1, n), bool)
    code = jnp.zeros((1, n), jnp.int32)

    _, greedy = maskgit_commit(
        jax.random.PRNGKey(0), logits, mask, code, n, top_k=1
    )
    assert (np.asarray(greedy) == 1).all()

    _, top2 = maskgit_commit(
        jax.random.PRNGKey(1), logits, mask, code, n, top_k=2
    )
    assert set(np.unique(np.asarray(top2))) <= {1, 3}
    assert len(np.unique(np.asarray(top2))) == 2  # both survive sampling


def test_maskgit_commit_temperature_sharpens():
    """Low temperature concentrates draws on the argmax token."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.models.dynamics import maskgit_commit

    n = 1024
    logits = jnp.tile(jnp.asarray([1.0, 0.0, 0.5]), (1, n, 1))
    mask = jnp.ones((1, n), bool)
    code = jnp.zeros((1, n), jnp.int32)
    _, draws = maskgit_commit(
        jax.random.PRNGKey(1), logits, mask, code, n, temp=0.05
    )
    frac_argmax = float((draws[0] == 0).mean())
    assert frac_argmax > 0.99


def test_maskgit_commit_prefers_confident_positions():
    """With one overwhelmingly confident masked position, a 1-token commit
    picks it."""
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.models.dynamics import maskgit_commit

    b, hw, v = 1, 8, 4
    logits = jnp.zeros((b, hw, v))
    logits = logits.at[0, 5, 2].set(50.0)  # position 5 is near-certain
    mask = jnp.ones((b, hw), bool)
    code = jnp.zeros((b, hw), jnp.int32)
    new_mask, new_code = maskgit_commit(
        jax.random.PRNGKey(0), logits, mask, code, 1
    )
    assert not bool(new_mask[0, 5])
    assert int(new_code[0, 5]) == 2
    assert int((~new_mask).sum()) == 1


def test_supports_cached_decode_capability():
    """Cache capability is a STATIC trunk property (no exception-based
    control flow): all-ST trunks support it, anything else falls back."""
    st = DynamicsModel(desc=DESC, tok_vocab=VOCAB, act_vocab=ACT_VOCAB,
                       embed_dim=EMBED)
    assert st.supports_cached_decode()
    mixed = DynamicsModel(
        desc=DESC + (("space_attn", {"n_head": 2, "d_head": 16}),),
        tok_vocab=VOCAB, act_vocab=ACT_VOCAB, embed_dim=EMBED,
    )
    assert not mixed.supports_cached_decode()


def test_generate_full_fallback_on_non_st_trunk():
    """A non-ST trunk generates via full re-forwards (explicit fallback),
    appending exactly one frame."""
    m = DynamicsModel(
        desc=(("space_attn", {"n_head": 2, "d_head": 16}),),
        tok_vocab=VOCAB, act_vocab=ACT_VOCAB, embed_dim=EMBED,
    )
    toks = jnp.zeros((B, T, H, W), jnp.int32)
    acts = jnp.zeros((B, T), jnp.int32)
    params = m.init(KEY, toks, acts)
    out = m.apply(params, toks, acts, KEY, steps=2, method=m.generate)
    assert out.shape == (B, T + 1, H, W)
    assert not m.supports_cached_decode()
