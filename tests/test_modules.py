"""Blueprint registry, norm, image and misc module tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.modules import (
    BlueprintStack,
    blueprint_st_factor,
    get_module,
    parse_blueprint,
)
from open_genie_tpu.modules.image import (
    BlurPooling2d,
    ImageResidualBlock,
    SpaceDownsample,
)
from open_genie_tpu.modules.misc import ForwardBlock
from open_genie_tpu.modules.norm import AdaptiveGroupNorm, GroupNorm

KEY = jax.random.PRNGKey(0)


def test_registry_names_match_reference():
    """Every module name the reference registry exposes must resolve."""
    names = [
        "space_attn", "time_attn", "space-time_attn",
        "blur_pool", "space_downsample", "image-residual",
        "video-residual", "causal-conv3d", "causal-conv3d-transpose",
        "depth2space_upsample", "depth2time_upsample",
        "depth2spacetime_upsample", "spacetime_downsample",
        "group_norm", "adaptive_group_norm",
        "gelu", "relu", "leaky_relu", "silu",
        # intended-but-missing in the reference registry:
        "spacetime_upsample",
    ]
    for n in names:
        assert get_module(n) is not None


def test_unknown_module_raises():
    with pytest.raises(ValueError):
        get_module("nope")


def test_parse_blueprint_n_rep_and_has_ext():
    bp = (
        ("causal-conv3d", {"in_channels": 3, "out_channels": 8}),
        ("adaptive_group_norm", {
            "dim_cond": 8, "num_groups": 2, "num_channels": 8, "has_ext": True,
        }),
        ("video-residual", {"n_rep": 3, "in_channels": 8}),
        "silu",
    )
    layers, ext = parse_blueprint(bp)
    assert len(layers) == 6
    assert ext == [False, True, False, False, False, False]


def test_blueprint_stack_forward_with_cond():
    bp = (
        ("causal-conv3d", {"in_channels": 3, "out_channels": 8}),
        ("adaptive_group_norm", {
            "dim_cond": 4, "num_groups": 2, "num_channels": 8, "has_ext": True,
        }),
        ("silu", {}),
    )
    m = BlueprintStack(blueprint=bp)
    x = jax.random.normal(KEY, (2, 4, 8, 8, 3))
    cond = jax.random.normal(KEY, (2, 4, 8, 8, 4))
    params = m.init(KEY, x, cond=cond)
    assert m.apply(params, x, cond=cond).shape == (2, 4, 8, 8, 8)


def test_blueprint_st_factor():
    bp = (
        ("spacetime_downsample", {
            "in_channels": 4, "kernel_size": 3, "time_factor": 2, "space_factor": 2,
        }),
        ("depth2spacetime_upsample", {
            "in_channels": 4, "time_factor": 2, "space_factor": 2,
        }),
    )
    assert blueprint_st_factor(bp) == pytest.approx(1.0)


def test_group_norm():
    m = GroupNorm(num_groups=4, num_channels=16)
    x = jax.random.normal(KEY, (2, 4, 8, 8, 16))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == x.shape
    # Normalized output: ~zero mean per group
    assert abs(float(out.mean())) < 0.1


def test_adaptive_group_norm_init_is_identityish():
    """std head inits to (w=0, b=1), avg to 0 -> output == plain GN at init."""
    m = AdaptiveGroupNorm(dim_cond=6, num_groups=4, num_channels=16)
    x = jax.random.normal(KEY, (2, 4, 8, 8, 16))
    cond = jax.random.normal(KEY, (2, 4, 8, 8, 6))
    params = m.init(KEY, x, cond=cond)
    out = m.apply(params, x, cond=cond)
    gn = GroupNorm(num_groups=4, num_channels=16)
    gparams = gn.init(KEY, x)
    np.testing.assert_allclose(out, gn.apply(gparams, x), rtol=1e-5, atol=1e-6)


def test_image_residual_block():
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    m = ImageResidualBlock(4, 8, downsample=2)
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2, 8, 8, 8)


def test_blur_pooling_2d():
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    assert BlurPooling2d(kernel_size=3)(x).shape == (2, 8, 8, 4)


def test_space_downsample():
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    m = SpaceDownsample(4, factor=2)
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2, 8, 8, 4)


def test_forward_block_dense_and_conv3d():
    x = jax.random.normal(KEY, (2, 5, 8))
    m = ForwardBlock(8, out_dim=12, hid_dim=16)
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2, 5, 12)

    v = jax.random.normal(KEY, (2, 4, 8, 8, 8))
    m3 = ForwardBlock(8, out_dim=12, hid_dim=None, block="conv3d", kernel_size=3)
    params = m3.init(KEY, v)
    assert m3.apply(params, v).shape == (2, 4, 8, 8, 12)


def test_parse_blueprint_remat_modes_agree():
    """remat True/'full'/'dots'/False are pure scheduling choices: the
    loss AND gradients must be bit-comparable across modes (policy remat
    keeps matmul outputs resident; it must never change the math)."""
    import flax.linen as nn

    from open_genie_tpu.modules import parse_blueprint

    bp = (
        ("causal-conv3d", {"in_channels": 4, "out_channels": 4, "kernel_size": 3}),
        ("space-time_attn", {"n_rep": 1, "n_embd": 4, "n_head": 1, "d_head": 4}),
    )
    x = jax.random.normal(KEY, (1, 2, 4, 4, 4))

    class Stack(nn.Module):
        remat: object = False

        def setup(self):
            # setup-assigned list: attribute-based param names, same tree
            # with or without remat (the product models' pattern).
            self.layers, _ = parse_blueprint(bp, remat=self.remat)

        def __call__(self, v):
            for layer in self.layers:
                v = layer(v, None, None, False)
            return jnp.mean(v ** 2)

    outs, grads = [], []
    params0 = None
    for mode in (False, True, "full", "dots"):
        m = Stack(remat=mode)
        params = m.init(KEY, x) if params0 is None else params0
        params0 = params
        val, grad = jax.value_and_grad(
            lambda p: m.apply(p, x)
        )(params)
        outs.append(float(val))
        grads.append(jax.tree.leaves(grad)[0])
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-6)
    for g in grads[1:]:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(grads[0]), rtol=1e-5, atol=1e-7
        )


def test_parse_blueprint_remat_unknown_policy_raises():
    from open_genie_tpu.modules import parse_blueprint

    with pytest.raises(ValueError, match="remat policy"):
        parse_blueprint((("causal-conv3d", {
            "in_channels": 4, "out_channels": 4, "kernel_size": 1,
        }),), remat="not_a_policy")
