"""Import reference (PyTorch) checkpoints into open-genie-tpu param trees.

The reference implementation's models are Lightning modules whose
``state_dict`` keys mirror the blueprint structure (``enc_layers.{i}.…`` /
``dec_layers.{i}.…`` / ``quant.…``, `/root/reference/genie/tokenizer.py:264-285`).
Both frameworks build their encoder/decoder stacks from the *same*
blueprint lists, so the mapping is structural: layer ``i`` on the torch
side corresponds to ``{enc,dec}_layers_{i}`` in the flax tree, and inside
a layer each reference parameter slot has exactly one flax counterpart.

Weight-layout conversions (torch -> flax):

  ====================  =======================  =====================
  module                torch                    flax
  ====================  =======================  =====================
  Conv3d                (O, I, kt, kh, kw)       (kt, kh, kw, I, O)
  Conv2d                (O, I, kh, kw)           (kh, kw, I, O)
  ConvTranspose3d       (I, O, kt, kh, kw)       (kt, kh, kw, I, O)
  Linear                (O, I)                   (I, O)
  GroupNorm weight      (C,)                     scale (C,)
  ====================  =======================  =====================

Non-parameter buffers (binomial ``blur`` kernels, the LFQ ``bit_mask``)
are constants recomputed by this framework and are skipped.  Keys that
belong to training-time loss modules the flax *model* tree does not own
(``gan_crit.…``, ``perc_crit.…``) are reported as skipped groups -- the
discriminator/VGG state lives in the train-module tree here and migrating
users restart adversarial training fresh (see PARITY.md on the perceptual
loss position).

Everything here is pure numpy; torch is only needed by the CLI wrapper
(`tools/import_reference_ckpt.py`) to deserialize the ``.ckpt``/``.pt``
file.
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

__all__ = [
    "convert_reference_state_dict",
    "group_reference_keys",
    "SKIPPED_PREFIXES",
]

# Loss-module subtrees a reference Lightning checkpoint may carry that have
# no slot in the flax *model* params (they live beside it in the train
# module, and are deliberately not migrated).
SKIPPED_PREFIXES = (
    "gan_crit.",   # GANLoss + discriminator (`tokenizer.py:295-299`)
    "perc_crit.",  # PerceptualLoss VGG (`tokenizer.py:288-292`)
)

# Non-parameter buffers recomputed from config on the flax side.
_BUFFER_LEAVES = ("blur", "bit_mask", "codebook")


class ImportError_(ValueError):
    """Raised when a reference state_dict cannot be mapped onto the tree."""


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, *k) -> flax (*k, I, O)."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _tconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d weight (I, O, *k) -> flax ConvTranspose
    (*k, I, O).  flax's `ConvTranspose` (transpose_kernel=False) correlates
    with the kernel where torch's transpose conv convolves with it -- the
    spatial axes must be flipped to express the same function
    (`/root/reference/genie/module/video.py:202-277`)."""
    nd = w.ndim
    w = np.transpose(w, tuple(range(2, nd)) + (0, 1))
    return w[::-1, ::-1, ::-1] if nd == 5 else w[::-1, ::-1]


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _pointwise_conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch 1x1 Conv1d/Conv2d weight (O, I, *ones) -> flax 1x1x1 Conv3d
    kernel (1, 1, 1, I, O).

    The reference's depth-to-space/time upsamplers run a pointwise Conv2d/
    Conv1d per frame/pixel (`video.py:295-299,345-349`); this framework
    expresses the same contraction as a 1x1x1 3-D conv (`modules/video.py`
    `name="proj"`)."""
    o, i = w.shape[:2]
    if any(k != 1 for k in w.shape[2:]):
        raise ImportError_(
            f"pointwise conv expected all-ones kernel dims, got {w.shape}"
        )
    return w.reshape(o, i).T.reshape(1, 1, 1, i, o)


def group_reference_keys(
    state_dict: Mapping[str, np.ndarray],
) -> Tuple[Dict[str, Dict[str, np.ndarray]], List[str]]:
    """Split a reference state_dict into per-layer groups.

    Returns ``(groups, skipped)`` where groups maps a flax top-level name
    (``enc_layers_3``, ``dec_layers_0``, ``quant``, …) to its relative
    ``{subkey: array}`` dict, and ``skipped`` lists keys belonging to
    loss modules / buffers that are intentionally not imported.
    """
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    skipped: List[str] = []
    for key, val in state_dict.items():
        if any(key.startswith(p) for p in SKIPPED_PREFIXES):
            skipped.append(key)
            continue
        if key.split(".")[-1] in _BUFFER_LEAVES:
            skipped.append(key)
            continue
        parts = key.split(".")
        if parts[0] in ("enc_layers", "dec_layers") and parts[1].isdigit():
            top = f"{parts[0]}_{parts[1]}"
            rest = ".".join(parts[2:])
        else:
            top = parts[0]
            rest = ".".join(parts[1:])
        groups.setdefault(top, {})[rest] = np.asarray(val)
    return groups, skipped


def _take(ref: Dict[str, np.ndarray], key: str, ctx: str) -> np.ndarray:
    if key not in ref:
        raise ImportError_(
            f"{ctx}: expected reference key {key!r}; "
            f"have {sorted(ref)}"
        )
    return ref.pop(key)


def _conv_entry(
    ref: Dict[str, np.ndarray], prefix: str, tmpl: Mapping[str, Any], ctx: str
) -> Dict[str, np.ndarray]:
    """Map one conv-bearing reference entry onto a flax conv subtree.

    `tmpl` is either ``{kernel, bias?}`` (plain `nn.Conv`) or
    ``{conv3d: {kernel, bias?}}`` (our CausalConv3d wrapper) or
    ``{conv_transpose3d: {…}}``; the reference mirrors the nesting with
    its own ``conv3d.`` inner module for causal convs
    (`/root/reference/genie/module/video.py:106-200`)."""
    dot = prefix + "." if prefix else ""
    if "conv3d" in tmpl:
        inner = _conv_entry(ref, f"{dot}conv3d", tmpl["conv3d"], ctx)
        return {"conv3d": inner}
    if "conv_transpose3d" in tmpl:
        out: Dict[str, np.ndarray] = {
            "kernel": _tconv_kernel(_take(ref, f"{dot}weight", ctx))
        }
        if "bias" in tmpl["conv_transpose3d"]:
            out["bias"] = _take(ref, f"{dot}bias", ctx)
        return {"conv_transpose3d": out}
    w = _take(ref, f"{dot}weight", ctx)
    out = {"kernel": _conv_kernel(w)}
    if "bias" in tmpl:
        out["bias"] = _take(ref, f"{dot}bias", ctx)
    return out


def _norm_entry(
    ref: Dict[str, np.ndarray], prefix: str, ctx: str
) -> Dict[str, np.ndarray]:
    dot = prefix + "." if prefix else ""
    return {
        "scale": _take(ref, f"{dot}weight", ctx),
        "bias": _take(ref, f"{dot}bias", ctx),
    }


def _linear_entry(
    ref: Dict[str, np.ndarray], prefix: str, tmpl: Mapping[str, Any], ctx: str
) -> Dict[str, np.ndarray]:
    dot = prefix + "." if prefix else ""
    out = {"kernel": _linear_kernel(_take(ref, f"{dot}weight", ctx))}
    if "bias" in tmpl:
        out["bias"] = _take(ref, f"{dot}bias", ctx)
    return out


def _residual_block(
    ref: Dict[str, np.ndarray], tmpl: Mapping[str, Any], ctx: str
) -> Dict[str, Any]:
    """Map a reference VideoResidualBlock onto our block.

    Reference layout (`/root/reference/genie/module/video.py:539-656`):
    ``main`` = [Down?] -> GN -> act -> Conv -> [Down?] -> GN -> act -> Conv
    as an indexed Sequential; ``res`` = [Down?] -> 1x1 Conv.  Submodule
    indices shift with the optional downsamplers, so entries are paired by
    *kind in index order*: 1-D ``weight`` = GroupNorm -> norm1/norm2; conv
    weights -> conv1/conv2; ``go_down`` convs -> down_main/down_res; the
    ``res`` conv -> res_proj.
    """

    def idx_of(key: str) -> int:
        return int(key.split(".")[1])

    def branch_keys(branch: str) -> List[str]:
        return sorted(
            (k for k in ref if k.startswith(branch + ".")), key=idx_of
        )

    out: Dict[str, Any] = {}

    def classify(prefix: str) -> str:
        """Kind of the `main.{j}`/`res.{j}` submodule, from ALL its keys
        (never from whichever key happens to come first -- .npz inputs
        carry no registration-order guarantee)."""
        subs = {k[len(prefix) + 1 :] for k in ref if k.startswith(prefix + ".")}
        if any(s.startswith("go_down.") for s in subs):
            return "down"
        if "weight" in subs and ref[prefix + ".weight"].ndim == 1:
            return "norm"
        return "conv"

    # --- main branch ---
    norm_prefixes: List[str] = []
    conv_prefixes: List[str] = []
    down_main = None
    seen = set()
    for key in branch_keys("main"):
        prefix = ".".join(key.split(".")[:2])  # "main.{j}"
        if prefix in seen:
            continue
        seen.add(prefix)
        kind = classify(prefix)
        if kind == "norm":
            norm_prefixes.append(prefix)
        elif kind == "down":
            down_main = prefix + ".go_down"
        else:
            conv_prefixes.append(prefix)
    want_norms = 2 if "norm1" in tmpl else 0  # use_norm=False has none
    if len(norm_prefixes) != want_norms or len(conv_prefixes) != 2:
        raise ImportError_(
            f"{ctx}: expected {want_norms} norms + 2 convs in `main`, found "
            f"norms={norm_prefixes} convs={conv_prefixes}"
        )
    if want_norms:
        out["norm1"] = _norm_entry(ref, norm_prefixes[0], ctx)
        out["norm2"] = _norm_entry(ref, norm_prefixes[1], ctx)
    out["conv1"] = _conv_entry(ref, conv_prefixes[0], tmpl["conv1"], ctx)
    out["conv2"] = _conv_entry(ref, conv_prefixes[1], tmpl["conv2"], ctx)
    if "down_main" in tmpl:
        if down_main is None:
            raise ImportError_(f"{ctx}: template has down_main, reference not")
        out["down_main"] = {
            "down": _conv_entry(ref, down_main, tmpl["down_main"]["down"], ctx)
        }

    # --- residual branch ---
    down_res = None
    res_conv = None
    seen = set()
    for key in branch_keys("res"):
        prefix = ".".join(key.split(".")[:2])
        if prefix in seen:
            continue
        seen.add(prefix)
        if classify(prefix) == "down":
            down_res = prefix + ".go_down"
        else:
            res_conv = prefix
    if res_conv is None:
        raise ImportError_(f"{ctx}: no shortcut conv under `res`")
    out["res_proj"] = _conv_entry(ref, res_conv, tmpl["res_proj"], ctx)
    if "down_res" in tmpl:
        if down_res is None:
            raise ImportError_(f"{ctx}: template has down_res, reference not")
        out["down_res"] = {
            "down": _conv_entry(ref, down_res, tmpl["down_res"]["down"], ctx)
        }
    return out


def _convert_group(
    ref: Dict[str, np.ndarray], tmpl: Mapping[str, Any], ctx: str
) -> Dict[str, Any]:
    """Convert one top-level layer group, template-directed."""
    keys = set(tmpl)
    # Standalone GroupNorm wrapper (ours nests under "gn").
    if keys == {"gn"}:
        return {"gn": _norm_entry(ref, "", ctx)}
    # AdaptiveGroupNorm: gn (non-affine here -> may be absent) + std/avg
    # Linears over the conditioning dim (`/root/reference/genie/module/norm.py:38-39`).
    if "std" in keys:
        out: Dict[str, Any] = {
            "std": _linear_entry(ref, "std", tmpl["std"], ctx)
        }
        if "avg" in tmpl:
            out["avg"] = _linear_entry(ref, "avg", tmpl["avg"], ctx)
        if "gn" in tmpl:
            out["gn"] = _norm_entry(ref, "", ctx)
        return out
    # Residual block.
    if "res_proj" in keys:
        return _residual_block(ref, tmpl, ctx)
    # Standalone CausalConv3d / CausalConvTranspose3d.
    if keys == {"conv3d"} or keys == {"conv_transpose3d"}:
        return _conv_entry(ref, "", tmpl, ctx)
    # SpaceTimeDownsample: ref `go_down` CausalConv3d
    # (`/root/reference/genie/module/video.py:477-483`).
    if keys == {"down"}:
        return {"down": _conv_entry(ref, "go_down", tmpl["down"], ctx)}
    # DepthToSpaceTimeUpsample: ref `go_up.0` CausalConv3d
    # (`/root/reference/genie/module/video.py:379-430`).
    if keys == {"conv"}:
        return {"conv": _conv_entry(ref, "go_up.0", tmpl["conv"], ctx)}
    # SpaceTimeUpsample: ref `go_up` ConvTranspose3d (`video.py:449-455`).
    # Unreachable from real reference checkpoints (its registry never
    # exposes 'spacetime_upsample', `module/__init__.py:23-69`) but the
    # mapping is kept -- verified directly against the reference module.
    if keys == {"up"}:
        out = {"kernel": _tconv_kernel(_take(ref, "go_up.weight", ctx))}
        if "bias" in tmpl["up"]:
            out["bias"] = _take(ref, "go_up.bias", ctx)
        return {"up": out}
    # DepthToSpace/DepthToTime upsample: ref `go_up.0` pointwise Conv2d/
    # Conv1d (`video.py:295-299,345-349`); ours a 1x1x1 Conv3d `proj`.
    if keys == {"proj"}:
        out = {
            "kernel": _pointwise_conv3d_kernel(
                _take(ref, "go_up.0.weight", ctx)
            )
        }
        if "bias" in tmpl["proj"]:
            out["bias"] = _take(ref, "go_up.0.bias", ctx)
        return {"proj": out}
    # LFQ: optional projections (`quantization.py:55-58`); ours uses the
    # same attribute names.
    if keys <= {"proj_inp", "proj_out"}:
        out = {}
        for name in keys:
            out[name] = _linear_entry(ref, name, tmpl[name], ctx)
        return out
    raise ImportError_(
        f"{ctx}: unsupported layer template with keys {sorted(keys)} "
        f"(reference keys: {sorted(ref)})"
    )


def convert_reference_state_dict(
    state_dict: Mapping[str, Any], template: Mapping[str, Any]
) -> Tuple[Dict[str, Any], List[str]]:
    """Convert a reference model ``state_dict`` into a flax param tree.

    ``template`` is the target model's param dict (e.g. the ``model``
    subtree of a train state) -- it directs naming/nesting and is used to
    verify completeness.  Returns ``(params, skipped_keys)``.  Raises
    :class:`ImportError_` when a template leaf has no source or a
    reference parameter has no destination.
    """
    state_np = {k: np.asarray(v) for k, v in state_dict.items()}
    groups, skipped = group_reference_keys(state_np)

    out: Dict[str, Any] = {}
    for top, tmpl_sub in template.items():
        if top not in groups:
            raise ImportError_(
                f"no reference parameters for template group {top!r}; "
                f"reference groups: {sorted(groups)}"
            )
        ref_sub = groups.pop(top)
        out[top] = _convert_group(ref_sub, tmpl_sub, ctx=top)
        if ref_sub:
            raise ImportError_(
                f"{top}: unconsumed reference keys {sorted(ref_sub)}"
            )
    if groups:
        raise ImportError_(
            f"reference groups with no template slot: {sorted(groups)} "
            "(is the config the same blueprint the checkpoint was trained "
            "with?)"
        )

    # Shape check against the template, leaf by leaf.
    def _check(tmpl: Any, got: Any, path: str):
        if isinstance(tmpl, Mapping):
            missing = set(tmpl) - set(got)
            extra = set(got) - set(tmpl)
            if missing or extra:
                raise ImportError_(
                    f"{path}: tree mismatch (missing {sorted(missing)}, "
                    f"extra {sorted(extra)})"
                )
            for k in tmpl:
                _check(tmpl[k], got[k], f"{path}/{k}")
            return
        want = tuple(np.shape(tmpl))
        have = tuple(np.shape(got))
        if want != have:
            raise ImportError_(f"{path}: shape {have} != template {want}")

    _check(template, out, "params")
    return out, skipped
