"""Transformer-tokenizer variant (the reference's `repr_tok`,
`/root/reference/genie/tokenizer.py:175-205`): attention trunk + LFQ,
scaled to test dims. Exercises the attention-based encode/decode path the
MAGVIT2 tests don't."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.tokenizer import VideoTokenizer

KEY = jax.random.PRNGKey(0)
B, T, H, W = 1, 4, 16, 16
D = 6

# Same topology as REPR_TOK_ENC/DEC (spacetime_downsample -> ST-attn stack;
# ST-attn stack -> depth2spacetime_upsample) at test widths.
ENC = (
    ("spacetime_downsample", {
        "in_channels": 3, "kernel_size": 3, "out_channels": 16,
        "time_factor": 1, "space_factor": 4,
    }),
    ("space-time_attn", {"n_rep": 2, "n_head": 2, "d_head": 8}),
    ("causal-conv3d", {"in_channels": 16, "out_channels": D, "kernel_size": 1}),
)
DEC = (
    ("causal-conv3d", {"in_channels": D, "out_channels": 16, "kernel_size": 3}),
    ("space-time_attn", {"n_rep": 2, "n_head": 2, "d_head": 8}),
    ("depth2spacetime_upsample", {
        "in_channels": 16, "kernel_size": 3, "out_channels": 3,
        "time_factor": 1, "space_factor": 4,
    }),
)


@pytest.fixture(scope="module")
def tok_and_params():
    tok = VideoTokenizer(enc_desc=ENC, dec_desc=DEC, d_codebook=D)
    video = jnp.zeros((B, T, H, W, 3))
    params = tok.init(KEY, video, train=False)
    return tok, params


def test_repr_tok_roundtrip(tok_and_params):
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    quant, idxs = tok.apply(params, video, method=tok.tokenize)
    assert quant.shape == (B, T, H // 4, W // 4, D)
    assert idxs.shape == (B, T, H // 4, W // 4)
    rec = tok.apply(params, idxs, method=tok.decode_tokens)
    assert rec.shape == video.shape


def test_repr_tok_train_forward(tok_and_params):
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    rec, out = tok.apply(params, video, train=True)
    assert np.isfinite(float(out["quant_loss"]))
    assert rec.shape == video.shape


def test_repr_tok_trainable():
    """One gradient step through the attention tokenizer decreases nothing
    catastrophic: loss is finite and grads flow into the attention stack."""
    import flax

    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )
    from open_genie_tpu.train.losses import TokenizerTrainModule

    module = TokenizerTrainModule(
        tokenizer=dict(enc_desc=ENC, dec_desc=DEC, d_codebook=D),
        gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(module, sample, KEY, opt)
    step = make_train_step(module, opt)
    batch = jax.random.uniform(KEY, (B, T, H, W, 3))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
