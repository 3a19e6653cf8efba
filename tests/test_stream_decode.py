"""Streaming pixel decode: exactness vs the batch decoder.

`VideoTokenizer.decode_stream` decodes one token frame per call against
cached decoder state (causal-conv input windows + temporal KV/FFN caches).
Because every streamable layer is strictly time-causal, the stream must
reproduce the batch `decode_tokens` output EXACTLY (fp tolerance) -- that
equality is the whole contract of the serving fast path (serve.py), pinned
here per-layer-type and end-to-end through `InteractiveSession`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.genie import Genie
from open_genie_tpu.models.tokenizer import VideoTokenizer

TOK_KW = dict(
    enc_desc=(
        ("spacetime_downsample", {
            "in_channels": 3, "kernel_size": 3, "out_channels": 16,
            "time_factor": 1, "space_factor": 4,
        }),
        ("causal-conv3d", {"in_channels": 16, "out_channels": 5,
                           "kernel_size": 1}),
    ),
    dec_desc=(
        ("causal-conv3d", {"in_channels": 5, "out_channels": 16,
                           "kernel_size": 3}),
        ("space-time_attn", {"n_rep": 2, "n_embd": 16, "n_head": 2,
                             "d_head": 8}),
        ("depth2spacetime_upsample", {
            "in_channels": 16, "kernel_size": 3, "out_channels": 3,
            "time_factor": 1, "space_factor": 4,
        }),
    ),
    d_codebook=5,
)

# Time-expanding decoder: one token frame -> 2 pixel frames, with a conv
# AFTER the time upsample (streams m=2 frames per step).
TOK_TF2_KW = dict(
    enc_desc=(
        ("spacetime_downsample", {
            "in_channels": 3, "kernel_size": 3, "out_channels": 16,
            "time_factor": 2, "space_factor": 2,
        }),
        ("causal-conv3d", {"in_channels": 16, "out_channels": 5,
                           "kernel_size": 1}),
    ),
    dec_desc=(
        ("space-time_attn", {"d_inp": 5, "d_out": 16, "n_head": 2,
                             "d_head": 8}),
        ("depth2spacetime_upsample", {
            "in_channels": 16, "kernel_size": 3, "out_channels": 8,
            "time_factor": 2, "space_factor": 2,
        }),
        ("causal-conv3d", {"in_channels": 8, "out_channels": 3,
                           "kernel_size": 3}),
    ),
    d_codebook=5,
)


# Serving-grade residual decoder (magvit2_stream style, scaled down):
# causal residual blocks with per-frame GroupNorm, per-frame adaptive
# GroupNorm conditioned on the quant latents (incl. one AFTER the time
# upsample, exercising the tf-repeat of the conditioning affine), head GN.
TOK_RES_KW = dict(
    enc_desc=(
        ("spacetime_downsample", {
            "in_channels": 3, "kernel_size": 3, "out_channels": 16,
            "time_factor": 2, "space_factor": 2,
        }),
        ("causal-conv3d", {"in_channels": 16, "out_channels": 5,
                           "kernel_size": 1}),
    ),
    dec_desc=(
        ("causal-conv3d", {"in_channels": 5, "out_channels": 16,
                           "kernel_size": 3}),
        ("video-residual", {
            "n_rep": 2, "in_channels": 16, "use_causal": True,
            "per_frame_norm": True, "num_groups": 2,
        }),
        ("adaptive_group_norm", {
            "dim_cond": 5, "num_groups": 2, "num_channels": 16,
            "has_ext": True, "per_frame": True,
        }),
        ("depth2spacetime_upsample", {
            "in_channels": 16, "kernel_size": 3, "out_channels": 8,
            "time_factor": 2, "space_factor": 2,
        }),
        ("adaptive_group_norm", {
            "dim_cond": 5, "num_groups": 2, "num_channels": 8,
            "has_ext": True, "per_frame": True,
        }),
        ("video-residual", {
            "in_channels": 8, "use_causal": True,
            "per_frame_norm": True, "num_groups": 2,
        }),
        ("group_norm", {"num_groups": 2, "num_channels": 8,
                        "per_frame": True}),
        ("silu", {}),
        ("causal-conv3d", {"in_channels": 8, "out_channels": 3,
                           "kernel_size": 3}),
    ),
    d_codebook=5,
)


def _init_tok(kw, key, t=4, hw=16):
    model = VideoTokenizer(**kw)
    video = jnp.zeros((1, t, hw, hw, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, video))(key)
    return model, params


def _stream_decode_all(model, params, idxs):
    """Decode (B, T, h, w) tokens one frame at a time via decode_stream."""
    b, t, h, w = idxs.shape
    cache = model.apply(
        params, b, h, w, t, method=VideoTokenizer.init_stream_cache
    )
    step = jax.jit(
        lambda p, f, c, pos: model.apply(
            p, f, c, pos, method=VideoTokenizer.decode_stream
        )
    )
    outs = []
    for pos in range(t):
        pix, cache = step(params, idxs[:, pos], cache, jnp.asarray(pos))
        outs.append(pix)
    return jnp.concatenate(outs, axis=1)


@pytest.mark.parametrize(
    "kw", [TOK_KW, TOK_TF2_KW, TOK_RES_KW], ids=["tf1", "tf2", "residual"]
)
def test_stream_matches_batch_decode(kw):
    model, params = _init_tok(kw, jax.random.PRNGKey(0))
    idxs = jax.random.randint(
        jax.random.PRNGKey(1), (1, 4, 4, 4), 0, 2 ** 5
    )
    batch = model.apply(params, idxs, method=VideoTokenizer.decode_tokens)
    stream = _stream_decode_all(model, params, idxs)
    assert stream.shape == batch.shape
    np.testing.assert_allclose(
        np.asarray(stream), np.asarray(batch), atol=2e-5, rtol=1e-5
    )


def test_stream_decodable_static_checks():
    assert VideoTokenizer(**TOK_KW).stream_decodable()
    assert VideoTokenizer(**TOK_TF2_KW).stream_decodable()
    assert VideoTokenizer(**TOK_RES_KW).stream_decodable()
    # Time-pooled GroupNorm stacks (stock MAGVIT2) are not streamable;
    # the serving-grade flagship variant (same topology, per-frame causal
    # statistics) is.
    from open_genie_tpu.models.blueprints import (
        MAGVIT2_DEC_DESC,
        MAGVIT2_STREAM_DEC_DESC,
    )

    not_ok = dict(TOK_KW, dec_desc=MAGVIT2_DEC_DESC)
    assert not VideoTokenizer(**not_ok).stream_decodable()
    ok = dict(TOK_KW, dec_desc=MAGVIT2_STREAM_DEC_DESC, d_codebook=18)
    assert VideoTokenizer(**ok).stream_decodable()
    # Attention after a time-expanding upsample is not streamable
    # (single-position KV decode).
    attn_after_tf = dict(
        TOK_TF2_KW,
        dec_desc=TOK_TF2_KW["dec_desc"]
        + (("space-time_attn", {"n_embd": 3, "n_head": 1, "d_head": 3}),),
    )
    assert not VideoTokenizer(**attn_after_tf).stream_decodable()


GENIE_KW = dict(
    tokenizer=TOK_KW,
    latent_action=dict(
        enc_desc=(("space-time_attn", {"n_rep": 1, "n_embd": 16,
                                       "n_head": 2, "d_head": 8}),),
        dec_desc=(("space-time_attn", {"n_rep": 1, "n_embd": 16,
                                       "n_head": 2, "d_head": 8}),),
        d_codebook=2,
        n_embd=16,
        inp_shape=(16, 16),
    ),
    dynamics=dict(
        desc=(("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2,
                                   "d_head": 16}),),
        embed_dim=32,
    ),
)


def test_session_streaming_frames_match_batch_decode():
    """An InteractiveSession with streaming decode must return, at every
    step, exactly the frame a full batch decode of its token buffer would
    produce at that position (the window path only approximates this)."""
    from open_genie_tpu.serve import InteractiveSession

    model = Genie(**GENIE_KW)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)

    sess = InteractiveSession(model, params, max_frames=4, steps_per_frame=2)
    assert sess.stream
    prompt = np.linspace(0, 1, 1 * 1 * 16 * 16 * 3, dtype=np.float32).reshape(
        1, 1, 16, 16, 3
    )
    first = sess.reset(prompt, seed=0)
    frames = [sess.step(i % 2) for i in range(3)]

    toks = jnp.asarray(sess.tokens)  # (B, t0 + 3, h, w)
    batch = model.apply(params, toks, method=model.decode_window)
    tf = batch.shape[1] // toks.shape[1]
    # Prompt pixels: the first t0 token frames' full decode.
    np.testing.assert_allclose(
        np.asarray(first), np.asarray(batch[:, : sess._t0 * tf]),
        atol=2e-5, rtol=1e-5,
    )
    for i, f in enumerate(frames):
        want = batch[:, (sess._t0 + i + 1) * tf - 1]
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(want), atol=2e-5, rtol=1e-5
        )


def test_session_streaming_time_expanding_decoder():
    """Streaming serving with a time-expanding decoder (1 token frame ->
    2 pixel frames): reset returns t0*tf prompt pixels, each step returns
    the newest sub-frame, all exactly equal to the batch decode."""
    from open_genie_tpu.serve import InteractiveSession

    kw = dict(GENIE_KW, tokenizer=TOK_TF2_KW)
    kw["latent_action"] = dict(GENIE_KW["latent_action"], inp_shape=(8, 8))
    model = Genie(**kw)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, 8, 8, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)

    sess = InteractiveSession(model, params, max_frames=3, steps_per_frame=2)
    assert sess.stream
    prompt = np.linspace(0, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(
        1, 2, 8, 8, 3
    )
    first = sess.reset(prompt, seed=0)  # 2 pixel frames -> 1 token frame
    frames = [sess.step(i % 2) for i in range(2)]

    toks = jnp.asarray(sess.tokens)
    batch = model.apply(params, toks, method=model.decode_window)
    tf = batch.shape[1] // toks.shape[1]
    assert tf == 2
    assert first.shape[1] == sess._t0 * tf
    np.testing.assert_allclose(
        np.asarray(first), np.asarray(batch[:, : sess._t0 * tf]),
        atol=2e-5, rtol=1e-5,
    )
    for i, f in enumerate(frames):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(batch[:, (sess._t0 + i + 1) * tf - 1]),
            atol=2e-5, rtol=1e-5,
        )


def test_session_streaming_exact_across_rebase():
    """After a horizon rebase the decoder stream is re-prefilled over the
    kept token window; subsequent frames must still equal the batch decode
    of the live buffer (positions restart on both the token and pixel
    sides, so the equality is exact)."""
    from open_genie_tpu.serve import InteractiveSession

    model = Genie(**GENIE_KW)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)

    sess = InteractiveSession(model, params, max_frames=2, steps_per_frame=2)
    sess.reset(np.zeros((1, 1, 16, 16, 3), np.float32), seed=0)
    frames = [sess.step(i % 2) for i in range(4)]  # rebases after 2 steps
    assert sess._rebases >= 1

    toks = jnp.asarray(sess.tokens)  # live (kept) window only
    batch = model.apply(params, toks, method=model.decode_window)
    tf = batch.shape[1] // toks.shape[1]
    # The newest frame (generated after the rebase) must match the batch
    # decode of the live buffer at its position.
    np.testing.assert_allclose(
        np.asarray(frames[-1]),
        np.asarray(batch[:, sess._t * tf - 1]),
        atol=2e-5, rtol=1e-5,
    )


def test_window_fallback_token_exact_vs_stream():
    """`stream=False` forces the sliding-window decode; the token side is
    decode-mode independent (same keys, same session_step program), so both
    modes must produce identical token buffers -- only the pixel decode
    context differs (window approximation vs exact stream)."""
    from open_genie_tpu.serve import InteractiveSession

    model = Genie(**GENIE_KW)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)
    prompt = np.zeros((1, 1, 16, 16, 3), np.float32)

    frames = {}
    toks = {}
    for mode in (True, False):
        sess = InteractiveSession(
            model, params, max_frames=4, steps_per_frame=2, stream=mode
        )
        assert sess.stream is mode
        sess.reset(prompt, seed=0)
        frames[mode] = [sess.step(i % 2) for i in range(2)]
        toks[mode] = np.asarray(sess.tokens)

    np.testing.assert_array_equal(toks[True], toks[False])
    for a, b in zip(frames[True], frames[False]):
        assert a.shape == b.shape
        assert np.isfinite(a).all() and np.isfinite(b).all()
