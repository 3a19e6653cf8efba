"""Genie composition tests: joint loss, fixed-shape rollout, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.genie import Genie

KEY = jax.random.PRNGKey(0)
T, H, W = 4, 16, 16

CFG = dict(
    tokenizer=dict(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 16,
                "time_factor": 1, "space_factor": 4,
            }),
            ("causal-conv3d", {"in_channels": 16, "out_channels": 6, "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 6, "out_channels": 16, "kernel_size": 3}),
            ("depth2spacetime_upsample", {
                "in_channels": 16, "out_channels": 3, "kernel_size": 3,
                "time_factor": 1, "space_factor": 4,
            }),
        ),
        d_codebook=6,
    ),
    latent_action=dict(
        enc_desc=(
            ("space-time_attn", {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),
        ),
        dec_desc=(
            ("space-time_attn", {
                "n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8,
                "has_ext": True, "time_attn_kw": {"key_dim": 4},
            }),
        ),
        d_codebook=4,
        n_embd=16,
        inp_shape=(H, W),
    ),
    dynamics=dict(
        desc=(("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 8}),),
        embed_dim=32,
    ),
)


@pytest.fixture(scope="module")
def genie_and_params():
    model = Genie(**CFG)
    video = jnp.zeros((1, T, H, W, 3))
    params = model.init(KEY, video, KEY, method=model.init_full)
    return model, params


def test_compute_loss(genie_and_params):
    model, params = genie_and_params
    video = jax.random.uniform(KEY, (1, T, H, W, 3))
    loss, aux = model.apply(
        params, video, jax.random.PRNGKey(1), method=model.compute_loss
    )
    assert np.isfinite(float(loss))
    assert "act_loss" in aux and "dyn_loss" in aux


def test_rollout_appends_frames(genie_and_params):
    model, params = genie_and_params
    prompt = jax.random.uniform(KEY, (1, H, W, 3))  # single image prompt
    actions = jnp.zeros((1, 4), jnp.int32)
    video = model.apply(
        params, prompt, actions, jax.random.PRNGKey(2),
        num_frames=3, steps_per_frame=2,
    )
    # tokenizer preserves time (time_factor 1) -> 1 prompt + 3 generated
    assert video.shape == (1, 4, H, W, 3)


def test_rollout_tokens_fixed_shape_jit(genie_and_params):
    model, params = genie_and_params
    tokens = jax.random.randint(KEY, (1, 2, H // 4, W // 4), 0, 2 ** 6)
    actions = jnp.zeros((1, 5), jnp.int32)

    fn = jax.jit(
        lambda p, t, a, k: model.apply(
            p, t, a, k, num_frames=3, steps_per_frame=2,
            method=model.rollout_tokens,
        )
    )
    out = fn(params, tokens, actions, jax.random.PRNGKey(3))
    assert out.shape == (1, 5, H // 4, W // 4)
    np.testing.assert_array_equal(np.asarray(out[:, :2]), np.asarray(tokens))
    assert int(out.max()) < 2 ** 6


def test_image_prompt_into_time_compressing_tokenizer():
    """A 1-frame (image) prompt must work with a time-compressing
    tokenizer: `tokenize_prompt` edge-pads the prompt up to the temporal
    downsampling factor instead of tokenizing to zero token frames (the
    flagship MAGVIT2 compresses time 4x; the round-4 eval hook and the
    `generate`/`play` CLIs all feed 1-frame prompts)."""
    cfg = {**CFG, "tokenizer": dict(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 16,
                "time_factor": 2, "space_factor": 4,
            }),
            ("causal-conv3d", {"in_channels": 16, "out_channels": 6, "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 6, "out_channels": 16, "kernel_size": 3}),
            ("depth2spacetime_upsample", {
                "in_channels": 16, "out_channels": 3, "kernel_size": 3,
                "time_factor": 2, "space_factor": 4,
            }),
        ),
        d_codebook=6,
    )}
    model = Genie(**cfg)
    assert model.tokenizer["enc_desc"][0][1]["time_factor"] == 2
    video = jnp.zeros((1, T, H, W, 3))
    params = model.init(KEY, video, KEY, method=model.init_full)

    # Padding happens inside tokenize_prompt: image -> 1 token frame.
    tokens = model.apply(
        params, jax.random.uniform(KEY, (1, H, W, 3)),
        method=model.tokenize_prompt,
    )
    assert tokens.shape[1] == 1

    # Full generate path: 1 prompt token frame + 2 generated, decoded back
    # through the 2x time upsampler -> 6 pixel frames.
    out = model.apply(
        params, jax.random.uniform(KEY, (1, H, W, 3)),
        jnp.zeros((1, 3), jnp.int32), jax.random.PRNGKey(2),
        num_frames=2, steps_per_frame=2,
    )
    assert out.shape == (1, 6, H, W, 3)

    # An image prompt equals the same image repeated t_down times.
    tokens_rep = model.apply(
        params,
        jnp.repeat(jax.random.uniform(KEY, (1, H, W, 3))[:, None], 2, axis=1),
        method=model.tokenize_prompt,
    )
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens_rep))


def test_rollout_uses_actions(genie_and_params):
    """Different action sequences must lead to different generations."""
    model, params = genie_and_params
    tokens = jax.random.randint(KEY, (1, 2, H // 4, W // 4), 0, 2 ** 6)
    a0 = jnp.zeros((1, 4), jnp.int32)
    a1 = jnp.full((1, 4), 3, jnp.int32)
    k = jax.random.PRNGKey(3)
    out0 = model.apply(params, tokens, a0, k, num_frames=2,
                       steps_per_frame=2, method=model.rollout_tokens)
    out1 = model.apply(params, tokens, a1, k, num_frames=2,
                       steps_per_frame=2, method=model.rollout_tokens)
    assert not np.array_equal(np.asarray(out0), np.asarray(out1))
