"""Reference-checkpoint import: FULL-MODEL numeric parity.

Builds the reference VideoTokenizer in-process (torch CPU, lightning/
torchvision stubbed), exports its randomly initialized ``state_dict``,
imports it with `open_genie_tpu.utils.torch_import`, and checks that the
two frameworks compute the same encode / quantize / decode on the same
input.  This is a stronger contract than the per-module golden fixtures:
it pins the whole composed dataflow plus the weight-layout conversion.

Reference surfaces exercised: `genie/tokenizer.py:264-330` (model
assembly, encode/decode), `genie/module/video.py` (conv family),
`genie/module/norm.py:8-69` (adaptive GN with mean-pooled cond),
`genie/module/quantization.py:55-98` (LFQ projections).
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "genie")),
    reason="reference checkout not available",
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_genie_tpu.utils.torch_import import (  # noqa: E402
    ImportError_,
    convert_reference_state_dict,
)

# ---------------------------------------------------------------------------
# Reference import plumbing (same stub technique as tools/gen_golden_fixtures)
# ---------------------------------------------------------------------------


def _install_reference():
    if "genie" in sys.modules:
        return
    sys.path.insert(0, REF)

    def _stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    class _LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.models = _stub(
            "torchvision.models", get_model=lambda *a, **k: None
        )
    if "lightning" not in sys.modules:
        _stub(
            "lightning",
            LightningModule=_LightningModule,
            pytorch=_stub("lightning.pytorch"),
        )
        sys.modules["lightning.pytorch"].callbacks = _stub(
            "lightning.pytorch.callbacks", Callback=object
        )


def _ref_tokenizer(enc, dec, **kw):
    _install_reference()
    import copy

    from genie.tokenizer import VideoTokenizer as RefTok

    torch.manual_seed(7)
    # The reference parser pops `has_ext`/`n_rep` out of the caller's kwarg
    # dicts (`genie/module/__init__.py:82-86` mutates); deep-copy so the
    # same blueprint objects can build our model afterwards.
    tok = RefTok(
        enc_desc=copy.deepcopy(enc), dec_desc=copy.deepcopy(dec),
        perc_loss_weight=0.0, gan_loss_weight=0.0, **kw,
    )
    tok.eval()
    return tok


# ---------------------------------------------------------------------------
# Blueprints: one of every conv-family pattern the importer maps
# ---------------------------------------------------------------------------

C = 12  # trunk width; != d_codebook*n so the LFQ projections exist

# NOTE two residual variants are deliberately absent from the NUMERIC
# blueprint:
#   * use_blur=False (conv downsample): the reference forwards `num_groups`
#     into SpaceTimeDownsample -> CausalConv3d -> nn.Conv3d and crashes
#     (`video.py:594-599`) -- no real reference checkpoint can contain one.
#   * use_blur=True + downsample: maps fine (blur is parameter-free; see
#     the structural test below) but is numerically non-comparable -- the
#     reference's BlurPooling kernel `repeat(blur,'i j k -> o g i j k')`
#     with default num_groups=1 SUMS across input channels
#     (`video.py:524-530`); this framework's anti-aliasing is depthwise by
#     design (PARITY.md "Blueprint defects fixed by design").
SMALL_ENC = (
    ("causal-conv3d", {"in_channels": 3, "out_channels": C, "kernel_size": 3}),
    # causal residual (CausalConv3d path)
    ("video-residual", {
        "in_channels": C, "kernel_size": 3,
        "use_causal": True, "act_fn": "silu", "num_groups": 4,
    }),
    # non-causal residual (plain Conv3d path)
    ("video-residual", {
        "in_channels": C, "kernel_size": 3,
        "use_causal": False, "act_fn": "leaky", "num_groups": 4,
    }),
    ("spacetime_downsample", {
        "in_channels": C, "kernel_size": 3, "time_factor": 2,
        "space_factor": 2,
    }),
    ("spacetime_downsample", {
        "in_channels": C, "kernel_size": 3, "time_factor": 2,
        "space_factor": 2,
    }),
    ("group_norm", {"num_groups": 4, "num_channels": C}),
    ("silu", {}),
    ("causal-conv3d", {"in_channels": C, "out_channels": C, "kernel_size": 1}),
)

SMALL_DEC = (
    ("causal-conv3d", {"in_channels": C, "out_channels": C, "kernel_size": 3}),
    ("adaptive_group_norm", {
        "num_groups": 4, "num_channels": C, "dim_cond": C, "has_ext": True,
    }),
    ("silu", {}),
    # time-strided transpose conv (spatially strided outputs differ by
    # design: the reference skips its own intended h*H trim, `video.py:266-269`)
    ("causal-conv3d-transpose", {
        "in_channels": C, "out_channels": C, "kernel_size": 3,
        "stride": (2, 1, 1),
    }),
    ("depth2space_upsample", {"in_channels": C, "factor": 2}),
    ("depth2time_upsample", {"in_channels": C, "factor": 2}),
    ("depth2spacetime_upsample", {
        "in_channels": C, "kernel_size": 3, "time_factor": 1,
        "space_factor": 2,
    }),
    ("group_norm", {"num_groups": 4, "num_channels": C}),
    ("causal-conv3d", {"in_channels": C, "out_channels": 3, "kernel_size": 3}),
)


def _our_tokenizer(enc, dec, **kw):
    from open_genie_tpu.models.tokenizer import VideoTokenizer

    return VideoTokenizer(enc_desc=enc, dec_desc=dec, **kw)


def _import_params(ref_tok, our_tok, shape):
    """Init our tree as a template, then fill it from the reference."""
    x = jnp.zeros(shape, jnp.float32)
    template = jax.jit(lambda k: our_tok.init(k, x))(
        jax.random.PRNGKey(0)
    )["params"]
    params, skipped = convert_reference_state_dict(
        ref_tok.state_dict(), template
    )
    return jax.tree.map(jnp.asarray, params), skipped


def _assert_close(ours, theirs, tol, what):
    ours = np.asarray(ours)
    theirs = theirs.detach().numpy()
    if theirs.ndim == 5:  # (B, C, T, H, W) -> (B, T, H, W, C)
        theirs = np.transpose(theirs, (0, 2, 3, 4, 1))
    assert ours.shape == theirs.shape, (what, ours.shape, theirs.shape)
    diff = float(np.max(np.abs(ours - theirs)))
    assert diff < tol, f"{what}: max diff {diff} >= {tol}"


@pytest.fixture(scope="module")
def small_pair():
    ref = _ref_tokenizer(SMALL_ENC, SMALL_DEC, d_codebook=4, n_codebook=1)
    ours = _our_tokenizer(SMALL_ENC, SMALL_DEC, d_codebook=4, n_codebook=1)
    params, skipped = _import_params(ref, ours, (1, 8, 16, 16, 3))
    return ref, ours, params, skipped


def test_small_import_consumes_everything(small_pair):
    ref, _, params, skipped = small_pair
    # Only non-parameter buffers may be skipped for a loss-free tokenizer.
    assert all(
        k.split(".")[-1] in ("blur", "bit_mask") for k in skipped
    ), skipped
    n_ref_params = sum(1 for _ in ref.parameters())
    assert len(jax.tree.leaves(params)) == n_ref_params


def test_small_encode_quantize_decode_parity(small_pair):
    ref, ours, params, _ = small_pair
    rng = np.random.default_rng(3)
    video = rng.standard_normal((1, 8, 16, 16, 3)).astype(np.float32)
    tvideo = torch.from_numpy(np.transpose(video, (0, 4, 1, 2, 3)))

    with torch.no_grad():
        ref_enc = ref.encode(tvideo)
        (ref_quant, ref_idx), _ = ref.quant(ref_enc, transpose=True)
        ref_rec = ref.decode(ref_quant)

    v = {"params": params}
    our_enc = ours.apply(v, jnp.asarray(video), method=ours.encode)
    (our_quant, our_idx), _, _ = ours.apply(v, our_enc, method=ours.quantize)
    our_rec = ours.apply(v, our_quant, method=ours.decode)

    _assert_close(our_enc, ref_enc, 2e-4, "encode")
    assert np.array_equal(
        np.asarray(our_idx).reshape(-1),
        ref_idx.detach().numpy().reshape(-1),
    ), "LFQ indices diverge"
    _assert_close(our_quant, ref_quant, 2e-4, "quantized latents")
    # Decoder stacks convs + adaptive GN (cond mean-pool) on top; a bit
    # looser than the encoder.
    _assert_close(our_rec, ref_rec, 1e-3, "decode")


def test_full_magvit2_encode_parity():
    """Stock MAGVIT2 blueprints import end-to-end and encode identically."""
    _install_reference()
    from genie.tokenizer import (
        MAGVIT2_DEC_DESC as REF_DEC,
        MAGVIT2_ENC_DESC as REF_ENC,
    )

    from open_genie_tpu.models.blueprints import (
        MAGVIT2_DEC_DESC,
        MAGVIT2_ENC_DESC,
    )

    ref = _ref_tokenizer(REF_ENC, REF_DEC, d_codebook=18, n_codebook=1)
    ours = _our_tokenizer(
        MAGVIT2_ENC_DESC, MAGVIT2_DEC_DESC, d_codebook=18, n_codebook=1
    )
    params, _ = _import_params(ref, ours, (1, 8, 24, 24, 3))

    rng = np.random.default_rng(11)
    video = rng.standard_normal((1, 8, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref_enc = ref.encode(
            torch.from_numpy(np.transpose(video, (0, 4, 1, 2, 3)))
        )
    our_enc = ours.apply(
        {"params": params}, jnp.asarray(video), method=ours.encode
    )
    # 20+ conv layers at width 512 accumulate fp error; keep a scaled tol.
    _assert_close(our_enc, ref_enc, 2e-3, "magvit2 encode")


def test_blur_downsample_residual_imports_structurally():
    """A blur-downsampling residual maps cleanly (blur is a parameter-free
    buffer, skipped); its `main` indices shift around the blur slot and the
    norm/conv pairing must still land correctly."""
    enc = SMALL_ENC[:1] + (
        ("video-residual", {
            "in_channels": C, "kernel_size": 3, "downsample": (1, 2),
            "use_causal": True, "use_blur": True, "act_fn": "silu",
            "num_groups": 4,
        }),
    ) + SMALL_ENC[3:]
    ref = _ref_tokenizer(enc, SMALL_DEC, d_codebook=4, n_codebook=1)
    ours = _our_tokenizer(enc, SMALL_DEC, d_codebook=4, n_codebook=1)
    params, skipped = _import_params(ref, ours, (1, 8, 16, 16, 3))
    assert any(k.endswith(".blur") for k in skipped)
    # conv1 precedes the blur slot, conv2 follows it; the pairing is by
    # index order, so the two convs must have ended up in distinct slots.
    blk = params["enc_layers_1"]
    got = ref.state_dict()["enc_layers.1.main.2.conv3d.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(blk["conv1"]["conv3d"]["kernel"]),
        np.transpose(got, (2, 3, 4, 1, 0)),
    )


def test_alphabetical_key_order_imports_identically(small_pair):
    """.npz inputs carry no registration-order guarantee; classification
    must not depend on 'weight' being seen before 'bias'."""
    ref, ours, params, _ = small_pair
    sd = {k: v.numpy() for k, v in sorted(ref.state_dict().items())}
    x = jnp.zeros((1, 8, 16, 16, 3), jnp.float32)
    template = jax.jit(lambda k: ours.init(k, x))(
        jax.random.PRNGKey(0)
    )["params"]
    reordered, _ = convert_reference_state_dict(sd, template)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree.leaves(reordered),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_mismatched_blueprint_rejected(small_pair):
    ref, _, _, _ = small_pair
    bad_enc = SMALL_ENC[:1] + SMALL_ENC[2:]  # drop a layer
    ours = _our_tokenizer(bad_enc, SMALL_DEC, d_codebook=4, n_codebook=1)
    with pytest.raises(ImportError_):
        _import_params(ref, ours, (1, 8, 16, 16, 3))
