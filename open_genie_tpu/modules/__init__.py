"""Blueprint DSL & module registry.

TPU-native equivalent of the reference's declarative assembly layer
(`/root/reference/genie/module/__init__.py:23-93`): a string-keyed registry
of Flax module constructors plus `parse_blueprint`, which expands a sequence
of `(name, kwargs)` descriptors (with `n_rep` repetition and `has_ext`
external-conditioning flags) into a list of module instances. Registry names
match the reference exactly so reference YAML blueprints load verbatim; YAML
list-of-lists forms are accepted alongside tuples.

Extra names vs the reference registry:
  * `spacetime_upsample` -- referenced by the stock latent-action decoder
    blueprint (`genie/__init__.py:41`) but missing from the reference's own
    registry (stale DSL).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple, Type

import flax.linen as nn

from open_genie_tpu.modules.attention import (
    Attention,
    SpaceTimeAttention,
    SpatialAttention,
    TemporalAttention,
)
from open_genie_tpu.modules.image import (
    BlurPooling2d,
    ImageResidualBlock,
    SpaceDownsample,
)
from open_genie_tpu.modules.misc import Activation, ForwardBlock
from open_genie_tpu.modules.norm import AdaptiveGroupNorm, GroupNorm
from open_genie_tpu.modules.quantization import LookupFreeQuantization
from open_genie_tpu.modules.video import (
    BlurPooling3d,
    CausalConv3d,
    CausalConvTranspose3d,
    DepthToSpaceTimeUpsample,
    DepthToSpaceUpsample,
    DepthToTimeUpsample,
    SpaceTimeDownsample,
    SpaceTimeUpsample,
    VideoResidualBlock,
)
from open_genie_tpu.utils import Blueprint

_ACTIVATIONS = ("gelu", "relu", "leaky_relu", "silu")

_REGISTRY: Dict[str, Type[nn.Module]] = {
    # * Attention modules
    "space_attn": SpatialAttention,
    "time_attn": TemporalAttention,
    "space-time_attn": SpaceTimeAttention,
    # * Image modules
    "blur_pool": BlurPooling2d,
    "space_downsample": SpaceDownsample,
    "image-residual": ImageResidualBlock,
    # * Video modules
    "video-residual": VideoResidualBlock,
    "causal-conv3d": CausalConv3d,
    "causal-conv3d-transpose": CausalConvTranspose3d,
    "depth2space_upsample": DepthToSpaceUpsample,
    "depth2time_upsample": DepthToTimeUpsample,
    "depth2spacetime_upsample": DepthToSpaceTimeUpsample,
    "spacetime_downsample": SpaceTimeDownsample,
    "spacetime_upsample": SpaceTimeUpsample,
    # * Norm modules
    "group_norm": GroupNorm,
    "adaptive_group_norm": AdaptiveGroupNorm,
}


def get_module(name: str) -> Type[nn.Module]:
    """Resolve a registry name to a Flax module class."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if name in _ACTIVATIONS:
        return Activation
    raise ValueError(f"Unknown module name: {name}")


def _sanitize_kwargs(name: str, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize YAML-sourced kwargs (lists -> tuples, activation fn)."""
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, list):
            v = tuple(v)
        if isinstance(v, dict):
            v = {kk: tuple(vv) if isinstance(vv, list) else vv for kk, vv in v.items()}
        out[k] = v
    if name in _ACTIVATIONS:
        out["fn"] = name
    return out


#: remat policy names -> jax.checkpoint policies. 'dots' keeps dot_general
#: (attention/dense) outputs resident and recomputes everything else --
#: including convs: `dots_with_no_batch_dims_saveable` matches only
#: dot_general, so conv_general_dilated outputs are still recomputed. For
#: the conv-heavy MAGVIT2 stack that makes 'dots' close to 'full'; the A/B
#: in tools/r04_mfu.py measures the actual difference.
_REMAT_POLICIES = {
    "full": None,  # save nothing, recompute everything (jax default)
    "dots": "dots_with_no_batch_dims_saveable",
}


def _remat_policy(remat):
    """Resolve a `remat` config value to `nn.remat` kwargs (or None)."""
    if not remat:
        return None
    if remat is True:
        return {}
    import jax

    name = _REMAT_POLICIES.get(str(remat), str(remat))
    if name is None:
        return {}
    policy = getattr(jax.checkpoint_policies, name, None)
    if policy is None:
        raise ValueError(
            f"Unknown remat policy {remat!r}: use True/'full', 'dots', or a "
            "jax.checkpoint_policies attribute name"
        )
    return {"policy": policy}


def parse_blueprint(
    blueprint: Blueprint, named: bool = False, remat=False
) -> Tuple[List[nn.Module], List[bool]]:
    """Expand a blueprint into `(module_instances, has_ext_flags)`.

    Matches the reference parser (`genie/module/__init__.py:71-93`): string
    entries mean `(name, {})`; `n_rep` repeats a module N times; `has_ext`
    marks a layer as taking external conditioning and is returned as a
    parallel bool list.

    `named=True` gives layers stable descriptive Flax names (only valid in an
    `@nn.compact` context); `named=False` (for `setup`-assigned lists, where
    Flax forbids explicit names) lets Flax autoname them by list position.

    `remat=True` (or `'full'`) wraps each layer in `nn.remat` (activation
    checkpointing): backward recomputes the layer instead of storing its
    intermediates -- the memory lever for attention-heavy stacks at full
    video resolution. `remat='dots'` (or any `jax.checkpoint_policies`
    attribute name) keeps matmul/conv outputs resident and recomputes only
    the cheap elementwise work -- the throughput trade for HBM-bound train
    steps. Rematted layers must be called positionally as
    `layer(x, cond, mask, train)` (mask/train static).
    """
    layers: List[nn.Module] = []
    ext_kw: List[bool] = []
    remat_kw = _remat_policy(remat)

    for li, desc in enumerate(blueprint):
        if isinstance(desc, str):
            desc = (desc, {})
        name, kwargs = desc
        kwargs = dict(kwargs)
        has_ext = bool(kwargs.pop("has_ext", False))
        n_rep = int(kwargs.pop("n_rep", 1))
        kwargs = _sanitize_kwargs(name, kwargs)
        cls = get_module(name)
        if remat_kw is not None:
            cls = nn.remat(cls, static_argnums=(3, 4), **remat_kw)
        for r in range(n_rep):
            if named:
                kwargs_n = dict(
                    kwargs, name=f"layer_{li}_{r}_{name}".replace("-", "_")
                )
            else:
                kwargs_n = kwargs
            layers.append(cls(**kwargs_n))
            ext_kw.append(has_ext)

    return layers, ext_kw


class BlueprintStack(nn.Module):
    """A sequential stack assembled from a blueprint.

    Layers flagged `has_ext` additionally receive `cond`; all layers share
    the uniform `(x, cond, mask, train)` call signature. Each layer runs
    under a `jax.named_scope` so profiler traces (`jax.profiler`) attribute
    time to blueprint entries.
    """

    blueprint: Any  # Blueprint; kept as Any for dataclass hashing leniency

    def setup(self):
        self.layers, self.ext_flags = parse_blueprint(self.blueprint)

    def __call__(self, x, cond=None, mask=None, train: bool = False):
        import jax

        for i, (layer, has_ext) in enumerate(zip(self.layers, self.ext_flags)):
            with jax.named_scope(f"{type(layer).__name__}_{i}"):
                x = layer(x, cond if has_ext else None, mask, train)
        return x

    @property
    def st_factor(self) -> float:
        """Product of space-time resampling factors across the stack."""
        layers, _ = parse_blueprint(self.blueprint)
        fact = 1.0
        for layer in layers:
            if hasattr(layer, "st_factor"):
                fact *= layer.st_factor
        return fact


def blueprint_st_factor(blueprint: Blueprint) -> float:
    """Space-time factor of a blueprint without instantiating parameters."""
    return _blueprint_factor(blueprint, "st_factor")


def blueprint_time_factor(blueprint: Blueprint) -> float:
    """Time-axis length factor of a blueprint (e.g. 0.25 for a 4x
    time-compressing encoder) without instantiating parameters. Consumed
    by `VideoTokenizer.temporal_downsampling`, which sets the minimum
    prompt length a time-compressing tokenizer can tokenize."""
    return _blueprint_factor(blueprint, "t_factor")


def _blueprint_factor(blueprint: Blueprint, attr: str) -> float:
    fact = 1.0
    for desc in blueprint:
        if isinstance(desc, str):
            desc = (desc, {})
        name, kwargs = desc
        kwargs = {k: v for k, v in dict(kwargs).items() if k not in ("has_ext",)}
        n_rep = int(kwargs.pop("n_rep", 1))
        cls = get_module(name)
        if not hasattr(cls, attr):
            continue
        # parent=None keeps the throwaway instance out of any enclosing
        # flax module context (this helper is called from module methods,
        # e.g. Genie.tokenize_prompt, where bare instantiation would raise
        # AssignSubModuleError).
        mod = cls(parent=None, **_sanitize_kwargs(name, kwargs))
        fact *= getattr(mod, attr) ** n_rep
    return fact
