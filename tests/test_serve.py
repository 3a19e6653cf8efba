"""Interactive serving session: token-exact vs the batch rollout.

The session path (`serve.InteractiveSession` -> `Genie.session_prefill` /
`session_step`) shares `_refine_frame` with `Genie.rollout_tokens`; given
the same per-frame keys and actions, an interactive session must replay
the batch rollout bit-for-bit in token space, while never recompiling
across steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.genie import Genie
from open_genie_tpu.serve import InteractiveSession

H = W = 16
GENIE_CFG = dict(
    tokenizer=dict(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 8,
                "time_factor": 1, "space_factor": 4,
            }),
            ("causal-conv3d", {"in_channels": 8, "out_channels": 4, "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 4, "out_channels": 8, "kernel_size": 3}),
            ("depth2spacetime_upsample", {
                "in_channels": 8, "out_channels": 3, "kernel_size": 3,
                "time_factor": 1, "space_factor": 4,
            }),
        ),
        d_codebook=4,
    ),
    latent_action=dict(
        enc_desc=(
            ("space-time_attn", {"n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8}),
        ),
        dec_desc=(
            ("space-time_attn", {
                "n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8,
                "has_ext": True, "time_attn_kw": {"key_dim": 2},
            }),
        ),
        d_codebook=2, n_embd=8, inp_shape=(H, W),
    ),
    dynamics=dict(
        desc=(("space-time_attn", {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),),
        embed_dim=16,
    ),
)
N_FRAMES = 3
SPF = 3


@pytest.fixture(scope="module")
def genie_and_params():
    model = Genie(**GENIE_CFG)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, H, W, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)
    return model, params


def test_session_replays_batch_rollout(genie_and_params):
    model, params = genie_and_params
    prompt = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, H, W, 3))
    actions = jax.random.randint(
        jax.random.PRNGKey(2), (1, 1 + N_FRAMES), 0, 4
    )
    seed = 7

    # Batch rollout reference (token space).
    tokens0 = model.apply(params, prompt, method=model.tokenize_prompt)
    want = model.apply(
        params, tokens0, actions, jax.random.PRNGKey(seed),
        num_frames=N_FRAMES, steps_per_frame=SPF,
        method=model.rollout_tokens,
    )

    # Interactive session with the same per-frame keys/actions.
    sess = InteractiveSession(
        model, params, max_frames=N_FRAMES, steps_per_frame=SPF,
        pixel_window=2,
    )
    first = sess.reset(
        np.asarray(prompt), seed=seed,
        prompt_actions=np.asarray(actions[:, :1]),
    )
    assert first.shape == (1, 1, H, W, 3)
    frames = [sess.step(int(actions[0, 1 + i])) for i in range(N_FRAMES)]
    for f in frames:
        assert f.shape == (1, H, W, 3)
        assert np.isfinite(f).all()

    np.testing.assert_array_equal(sess.tokens, np.asarray(want))


def test_session_step_returns_generated_frame_pixels(genie_and_params):
    """When t < pixel_window the clamped decode window extends PAST the
    newest frame into all-zero future slots; step() must return the
    generated frame (window index min(t, w) - 1), not the window's last
    slot (regression: early steps returned decodes of not-yet-generated
    zero-token frames)."""
    model, params = genie_and_params
    sess = InteractiveSession(
        model, params, max_frames=3, steps_per_frame=2, pixel_window=4
    )
    prompt = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(4), (1, 1, H, W, 3))
    )
    sess.reset(prompt, seed=0)
    f = sess.step(1)

    t = sess._t  # == 2 < pixel_window: the regression regime
    w = min(4, sess._buf.shape[1])
    start = max(t - w, 0)
    window = sess._buf[:, start:start + w]
    want = model.apply(params, window, method=model.decode_window)
    np.testing.assert_allclose(
        f, np.asarray(want[:, min(t, w) - 1]), atol=1e-5
    )


def test_session_unbounded_rebase(genie_and_params):
    """Sessions keep playing past the preallocated horizon: the cache
    rebases onto the trailing token window, preserving the kept frames
    verbatim, and frames keep coming with the same shape/finiteness."""
    model, params = genie_and_params
    sess = InteractiveSession(
        model, params, max_frames=2, steps_per_frame=2, pixel_window=2
    )
    prompt = np.zeros((1, 1, H, W, 3), np.float32)
    sess.reset(prompt, seed=3)

    for i in range(6):  # 3x the horizon
        pre = np.asarray(sess.tokens)
        full = pre.shape[1] - sess._t0 >= sess.max_frames
        f = sess.step(i % 2)
        assert f.shape == (1, H, W, 3)
        assert np.isfinite(f).all()
        if full:
            # The rebase kept the trailing window verbatim.
            post = np.asarray(sess.tokens)
            keep = post.shape[1] - 1  # everything but the new frame
            np.testing.assert_array_equal(post[:, :keep], pre[:, -keep:])
    assert sess._rebases >= 2


def test_session_rebase_with_video_prompt_and_actions(genie_and_params):
    """Multi-frame prompt with explicit prompt_actions: the action history
    bookkeeping survives rebases (kept window = prompt + generated
    frames, actions re-committed in order)."""
    model, params = genie_and_params
    sess = InteractiveSession(
        model, params, max_frames=2, steps_per_frame=2, pixel_window=2
    )
    prompt = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(9), (1, 2, H, W, 3))
    )
    first = sess.reset(prompt, seed=1, prompt_actions=np.array([[1, 2]]))
    assert first.shape[1] == 2  # time-preserving tokenizer: 2 token frames
    assert len(sess._acts) == 2
    for i in range(5):  # forces 2+ rebases at a 2-frame horizon
        f = sess.step(i % 3)
        assert np.isfinite(f).all()
    assert sess._rebases >= 2
    # history length stays bounded by keep + horizon
    assert len(sess._acts) <= sess._keep + sess.max_frames


def test_session_top_k_greedy_is_key_independent(genie_and_params):
    """top_k=1 sessions are greedy: two sessions with different seeds but
    the same actions produce identical token streams."""
    model, params = genie_and_params
    prompt = np.zeros((1, 1, H, W, 3), np.float32)
    streams = []
    for seed in (0, 123):
        sess = InteractiveSession(
            model, params, max_frames=3, steps_per_frame=2,
            pixel_window=2, top_k=1,
        )
        sess.reset(prompt, seed=seed)
        for a in (0, 1, 0):
            sess.step(a)
        streams.append(np.asarray(sess.tokens))
    np.testing.assert_array_equal(streams[0], streams[1])


def test_session_pixel_index_with_time_compressing_tokenizer():
    """Time-expanding decoders emit `tf` pixel frames per token frame; the
    step must return the newest token frame's LAST pixel sub-frame, not a
    token-indexed (stale) early frame."""
    tf = 2
    cfg = dict(
        tokenizer=dict(
            enc_desc=(
                ("spacetime_downsample", {
                    "in_channels": 3, "kernel_size": 3, "out_channels": 8,
                    "time_factor": tf, "space_factor": 4,
                }),
                ("causal-conv3d", {"in_channels": 8, "out_channels": 4,
                                   "kernel_size": 1}),
            ),
            dec_desc=(
                ("causal-conv3d", {"in_channels": 4, "out_channels": 8,
                                   "kernel_size": 3}),
                ("depth2spacetime_upsample", {
                    "in_channels": 8, "out_channels": 3, "kernel_size": 3,
                    "time_factor": tf, "space_factor": 4,
                }),
            ),
            d_codebook=4,
        ),
        latent_action=GENIE_CFG["latent_action"],
        dynamics=GENIE_CFG["dynamics"],
    )
    model = Genie(**cfg)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, H, W, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)

    sess = InteractiveSession(
        model, params, max_frames=3, steps_per_frame=2, pixel_window=2
    )
    prompt = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (1, tf, H, W, 3))
    )
    first = sess.reset(prompt, seed=0)
    assert first.shape[1] == tf  # 1 token frame -> tf pixel frames
    f = sess.step(1)
    assert f.shape == (1, H, W, 3)

    t = sess._t  # 2 token frames exist
    w = min(2, sess._buf.shape[1])
    start = max(t - w, 0)
    window = sess._buf[:, start:start + w]
    want = model.apply(params, window, method=model.decode_window)
    assert want.shape[1] == w * tf
    np.testing.assert_allclose(
        f, np.asarray(want[:, min(t, w) * tf - 1]), atol=1e-5
    )


def test_step_nosync_matches_step(genie_and_params):
    """`step_nosync` is `step` minus the host transfer: two sessions with
    the same seed/actions must produce identical frames whether pulled
    eagerly (step) or chained on-device and synced at the end (the bench's
    device-time disaggregation path, bench.py section_serve)."""
    model, params = genie_and_params
    prompt = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (1, 1, H, W, 3))
    )
    acts = [1, 3, 0]

    a = InteractiveSession(model, params, max_frames=4, steps_per_frame=SPF)
    a.reset(prompt, seed=11)
    eager = [a.step(x) for x in acts]

    b = InteractiveSession(model, params, max_frames=4, steps_per_frame=SPF)
    b.reset(prompt, seed=11)
    chained = [b.step_nosync(x) for x in acts]  # no host sync between steps

    for e, c in zip(eager, chained):
        np.testing.assert_array_equal(e, np.asarray(c))
    assert b._t == a._t
