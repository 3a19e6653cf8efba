"""VideoTokenizer tests: shape contracts on a small MAGVIT2-style stack.

Mirrors `/root/reference/test/test_tokenizer.py` (encode shape
`(B, 18, T/4, H/8, W/8)` channels-first == `(B, T/4, H/8, W/8, 18)` here)
using a width-reduced blueprint for CPU speed; the full MAGVIT2 blueprint is
exercised in the benchmark/e2e paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.tokenizer import VideoTokenizer

KEY = jax.random.PRNGKey(0)

# Width-reduced MAGVIT2: same topology (3 spacetime downsamples at
# (1,2),(2,2),(2,2) => T/4, H/8, W/8; adaptive-GN conditioned decoder).
D = 18
ENC = (
    ("causal-conv3d", {"in_channels": 3, "out_channels": 8, "kernel_size": 3}),
    ("video-residual", {"in_channels": 8}),
    ("spacetime_downsample", {
        "in_channels": 8, "out_channels": 8, "kernel_size": 3,
        "time_factor": 1, "space_factor": 2,
    }),
    ("spacetime_downsample", {
        "in_channels": 8, "out_channels": 8, "kernel_size": 3,
        "time_factor": 2, "space_factor": 2,
    }),
    ("spacetime_downsample", {
        "in_channels": 8, "out_channels": 16, "kernel_size": 3,
        "time_factor": 2, "space_factor": 2,
    }),
    ("group_norm", {"num_groups": 4, "num_channels": 16}),
    ("silu", {}),
    ("causal-conv3d", {"in_channels": 16, "out_channels": D, "kernel_size": 1}),
)
DEC = (
    ("causal-conv3d", {"in_channels": D, "out_channels": 16, "kernel_size": 3}),
    ("adaptive_group_norm", {
        "dim_cond": D, "num_groups": 4, "num_channels": 16, "has_ext": True,
    }),
    ("depth2spacetime_upsample", {
        "in_channels": 16, "out_channels": 8, "kernel_size": 3,
        "time_factor": 2, "space_factor": 2,
    }),
    ("depth2spacetime_upsample", {
        "in_channels": 8, "kernel_size": 3, "time_factor": 2, "space_factor": 2,
    }),
    ("depth2spacetime_upsample", {
        "in_channels": 8, "kernel_size": 3, "time_factor": 1, "space_factor": 2,
    }),
    ("group_norm", {"num_groups": 4, "num_channels": 8}),
    ("silu", {}),
    ("causal-conv3d", {"in_channels": 8, "out_channels": 3, "kernel_size": 3}),
)

B, T, H, W = 1, 8, 16, 16


@pytest.fixture(scope="module")
def tok_and_params():
    tok = VideoTokenizer(enc_desc=ENC, dec_desc=DEC, d_codebook=D)
    video = jnp.zeros((B, T, H, W, 3))
    # init via the full forward so encoder AND decoder params exist.
    params = tok.init(KEY, video, train=False)
    return tok, params


def test_encode_shape(tok_and_params):
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    enc = tok.apply(params, video, method=tok.encode)
    assert enc.shape == (B, T // 4, H // 8, W // 8, D)


def test_tokenize_shapes_and_vocab(tok_and_params):
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    quant, idxs = tok.apply(params, video, method=tok.tokenize)
    assert quant.shape == (B, T // 4, H // 8, W // 8, D)
    assert idxs.shape == (B, T // 4, H // 8, W // 8)
    assert np.abs(np.asarray(quant)).max() == 1.0
    assert int(idxs.max()) < 2 ** D


def test_tokenize_decode_roundtrip_shape(tok_and_params):
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    quant, idxs = tok.apply(params, video, method=tok.tokenize)
    rec = tok.apply(params, idxs, method=tok.decode_tokens)
    assert rec.shape == video.shape


def test_decode_tokens_matches_decode_quant(tok_and_params):
    """decode(codebook[idxs]) == decode(quant) -- index/codeword coherence."""
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    quant, idxs = tok.apply(params, video, method=tok.tokenize)
    rec_q = tok.apply(params, quant, method=tok.decode)
    rec_i = tok.apply(params, idxs, method=tok.decode_tokens)
    np.testing.assert_allclose(rec_q, rec_i, rtol=1e-5, atol=1e-6)


def test_fused_head_tokenize_matches_unfused(tok_and_params):
    """The Pallas fused conv+LFQ head must reproduce the unfused
    encode->quantize path exactly (codes AND indices). Runs the kernel in
    interpret mode on CPU; the TPU path is the same kernel."""
    tok, params = tok_and_params
    assert tok.head_fusable()
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    q0, i0 = tok.apply(params, video, method=tok.tokenize, fused=False)
    q1, i1 = tok.apply(params, video, method=tok.tokenize, fused=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-6)


def test_tokenize_init_never_uses_fused_path():
    """During `init` the head conv's params don't exist yet (the fused
    path READS them instead of calling the layer), so initializing via
    tokenize must trace the unfused path even with fused=True -- on TPU
    the auto-dispatch would otherwise crash Genie.init_full."""
    tok = VideoTokenizer(enc_desc=ENC, dec_desc=DEC, d_codebook=D)
    video = jnp.zeros((1, 4, 16, 16, 3))
    variables = tok.init(KEY, video, method=tok.tokenize, fused=True)
    # the head conv's params were created along the traced path
    assert "conv3d" in variables["params"][f"enc_layers_{len(ENC) - 1}"]


def test_head_fusable_is_conservative():
    """Blueprints whose head is not a pure 1x1 projection must refuse the
    fused path (kernel-3 head; projection mismatch)."""
    tok3 = VideoTokenizer(
        enc_desc=(
            ("causal-conv3d", {"in_channels": 3, "out_channels": D, "kernel_size": 3}),
        ),
        dec_desc=(("causal-conv3d", {"in_channels": D, "out_channels": 3}),),
        d_codebook=D,
    )
    assert not tok3.head_fusable()
    tok_proj = VideoTokenizer(
        enc_desc=(
            ("causal-conv3d", {"in_channels": 3, "out_channels": 24, "kernel_size": 1}),
        ),
        dec_desc=(("causal-conv3d", {"in_channels": 24, "out_channels": 3}),),
        d_codebook=D,  # 24 != 18 -> LFQ projects -> not fusable
    )
    assert not tok_proj.head_fusable()


def test_forward_train_has_quant_loss(tok_and_params):
    tok, params = tok_and_params
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    rec, out = tok.apply(params, video, train=True)
    assert rec.shape == video.shape
    assert out["quant_loss"] is not None
    assert np.isfinite(float(out["quant_loss"]))


def test_enc_dec_dim_mismatch_raises():
    bad_dec = (("causal-conv3d", {"in_channels": 7, "out_channels": 3}),)
    with pytest.raises(AssertionError):
        tok = VideoTokenizer(enc_desc=ENC, dec_desc=bad_dec, d_codebook=D)
        tok.init(KEY, jnp.zeros((1, 4, 8, 8, 3)), method=tok.tokenize)


def test_decode_tokens_projected_config():
    """When the encoder width differs from d_codebook, LFQ projects in/out
    around the sign quantizer -- decode_tokens must apply proj_out before
    the decoder (regression: raw codewords were fed in, which shape-errors
    at restore time and would mis-decode any projected config, e.g. the
    stock tokenize.yaml with enc width 64 vs d_codebook 10)."""
    d = 4
    enc = (
        ("causal-conv3d", {"in_channels": 3, "out_channels": 8, "kernel_size": 3}),
    )
    dec = (
        ("causal-conv3d", {"in_channels": 8, "out_channels": 3, "kernel_size": 3}),
    )
    tok = VideoTokenizer(enc_desc=enc, dec_desc=dec, d_codebook=d)
    video = jax.random.uniform(KEY, (B, T, H, W, 3))
    params = tok.init(KEY, video, train=False)
    assert "proj_out" in params["params"]["quant"]  # projected config
    quant, idxs = tok.apply(params, video, method=tok.tokenize)
    assert quant.shape[-1] == 8  # decoder-facing width, not d_codebook
    rec_q = tok.apply(params, quant, method=tok.decode)
    rec_i = tok.apply(params, idxs, method=tok.decode_tokens)
    np.testing.assert_allclose(
        np.asarray(rec_q), np.asarray(rec_i), rtol=1e-5, atol=1e-6
    )
