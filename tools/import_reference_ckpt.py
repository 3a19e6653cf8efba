"""Import a reference (open-genie / PyTorch-Lightning) checkpoint.

Converts a ``VideoTokenizer`` checkpoint trained with the reference
implementation into an open-genie-tpu orbax checkpoint directory that
every ``--ckpt`` consumer (eval, generate, tokenize-data, genie warm
start, ``--resume``) can load:

    python tools/import_reference_ckpt.py \
        --ckpt last.ckpt --config configs/tokenize.yaml --out checkpoints/imported

``--ckpt`` accepts a Lightning ``.ckpt`` (the ``state_dict`` entry is
used), a raw ``torch.save``d state_dict, or an ``.npz`` with the same
keys.  The YAML config must describe the same blueprint the checkpoint
was trained with (reference configs load verbatim, so point at the very
YAML the reference run used).

Loss-module state (``gan_crit.…``/``perc_crit.…``) is not migrated -- the
discriminator restarts fresh if training continues (see PARITY.md).  The
mapping itself lives in ``open_genie_tpu/utils/torch_import.py``.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_reference_state_dict(path: str) -> dict:
    """Deserialize a reference checkpoint into {key: np.ndarray}."""
    import numpy as np

    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Real Lightning .ckpt files carry non-tensor metadata --
        # `hyper_parameters` is a lightning AttributeDict, the raw
        # `optimizer` init arg a functools.partial -- that the weights-only
        # unpickler rejects, and lightning itself is not importable here,
        # so a plain weights_only=False load ALSO dies resolving those
        # classes.  Only the tensors under 'state_dict' matter: unpickle
        # with unknown classes stubbed out.
        print(
            "# weights-only load failed (Lightning metadata in the "
            "checkpoint); retrying with unknown classes stubbed -- only "
            "do this with checkpoint files you trust"
        )
        obj = torch.load(
            path, map_location="cpu", weights_only=False,
            pickle_module=_tolerant_pickle(),
        )
    if isinstance(obj, dict) and "state_dict" in obj:  # Lightning .ckpt
        obj = obj["state_dict"]
    return {k: np.asarray(v) for k, v in obj.items()}


def _tolerant_pickle():
    """A pickle-module shim whose Unpickler stubs unresolvable classes.

    Checkpoint metadata objects (hyper-parameter containers, optimizer
    partials) become inert dict-like placeholders instead of raising
    ImportError/AttributeError; the tensor payload is unaffected."""
    import pickle
    import types

    class _Opaque(dict):
        def __init__(self, *a, **k):
            super().__init__()

        def __setstate__(self, state):
            return None

        def __call__(self, *a, **k):
            return self

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Opaque,), {})

    shim = types.ModuleType("tolerant_pickle")
    shim.Unpickler = _Unpickler
    shim.load = lambda f, **kw: _Unpickler(f, **kw).load()
    shim.loads = lambda b, **kw: _Unpickler(__import__("io").BytesIO(b), **kw).load()
    return shim


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .ckpt/.pt/.npz")
    ap.add_argument("--config", required=True, help="tokenizer YAML config")
    ap.add_argument("--out", required=True, help="output orbax ckpt dir")
    ap.add_argument(
        "--step", type=int, default=0,
        help="step number recorded in the imported checkpoint",
    )
    ap.add_argument(
        "--verify", metavar="REFERENCE_REPO", default=None,
        help="path to an open-genie checkout: after importing, run ITS "
        "VideoTokenizer on the checkpoint and assert encode parity "
        "against the imported params (catches silent weight corruption)",
    )
    args = ap.parse_args()

    import flax
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        save_checkpoint,
    )
    from open_genie_tpu.train.losses import frozen_param_mask
    from open_genie_tpu.train.trainer import _opt_kwargs, build_tokenizer_module
    from open_genie_tpu.utils.torch_import import convert_reference_state_dict

    cfg = load_config(args.config, kind="tokenizer")
    module = build_tokenizer_module(cfg.model)
    sample = jnp.zeros(
        (1, cfg.data.num_frames, cfg.data.height, cfg.data.width, 3),
        jnp.float32,
    )
    key = jax.random.PRNGKey(cfg.trainer.seed)
    # Build the optimizer EXACTLY as `train_tokenizer` does (config kwargs
    # + the perc-VGG freeze mask) so the saved opt_state tree matches what
    # `train tokenizer --resume` restores into.
    state = create_train_state(module, sample, key, make_optimizer())
    if cfg.model.perc_loss_weight > 0:
        mask = frozen_param_mask(state.params, ("perc_crit",))
        optimizer = make_optimizer(
            **_opt_kwargs(cfg.model.optimizer), frozen_mask=mask
        )
        state = state.replace(opt_state=optimizer.init(state.params))
    else:
        optimizer = make_optimizer(**_opt_kwargs(cfg.model.optimizer))
        state = state.replace(opt_state=optimizer.init(state.params))

    sd = load_reference_state_dict(args.ckpt)
    params = flax.core.unfreeze(state.params)
    params["model"], skipped = convert_reference_state_dict(
        sd, params["model"]
    )
    n = len(jax.tree.leaves(params["model"]))
    print(f"# imported {n} param tensors into the model subtree")
    if skipped:
        print(f"# skipped {len(skipped)} reference keys (buffers/loss "
              f"modules), e.g. {skipped[:4]}")

    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        step=jnp.asarray(args.step, jnp.int32),
    )
    save_checkpoint(args.out, state, step=args.step)
    print(f"# wrote orbax checkpoint step {args.step} to {args.out}")

    if args.verify:
        diff = _verify_against_reference(
            args.verify, cfg, sd, state.params["model"]
        )
        print(f"# verify: reference-vs-imported encode max |diff| = {diff:.2e}")
        if diff > 1e-2:
            raise SystemExit(
                "verify FAILED: imported params do not reproduce the "
                "reference encode (diff above shows silent corruption)"
            )
    return 0


def _verify_against_reference(ref_path, cfg, state_dict, model_params):
    """Run the reference VideoTokenizer on the same weights and compare
    `encode` outputs against the imported flax params on a random video."""
    import copy
    import types

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    sys.path.insert(0, ref_path)
    # The reference package pulls torchvision + lightning at import time;
    # stub them when absent (same technique as tools/gen_golden_fixtures).
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            tv.models.get_model = lambda *a, **k: None
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
    if "lightning" not in sys.modules:
        try:
            import lightning  # noqa: F401
        except ImportError:
            class _LM(torch.nn.Module):
                def save_hyperparameters(self, *a, **k):
                    pass

            lt = types.ModuleType("lightning")
            lt.LightningModule = _LM
            pt = types.ModuleType("lightning.pytorch")
            cb = types.ModuleType("lightning.pytorch.callbacks")
            cb.Callback = object
            pt.callbacks = cb
            lt.pytorch = pt
            sys.modules.update({
                "lightning": lt, "lightning.pytorch": pt,
                "lightning.pytorch.callbacks": cb,
            })

    from genie.tokenizer import VideoTokenizer as RefTok

    from open_genie_tpu.models.tokenizer import VideoTokenizer

    mcfg = cfg.model
    ref = RefTok(
        enc_desc=copy.deepcopy(tuple(mcfg.enc_desc)),
        dec_desc=copy.deepcopy(tuple(mcfg.dec_desc)),
        d_codebook=mcfg.d_codebook, n_codebook=mcfg.n_codebook,
        perc_loss_weight=0.0, gan_loss_weight=0.0,
    )
    ref.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in state_dict.items()},
        strict=False,  # buffers (blur/bit_mask) may be absent in .npz input
    )
    ref.eval()

    rng = np.random.default_rng(0)
    video = rng.standard_normal(
        (1, min(cfg.data.num_frames, 8), cfg.data.height, cfg.data.width, 3)
    ).astype(np.float32)
    with torch.no_grad():
        ref_enc = ref.encode(
            torch.from_numpy(np.transpose(video, (0, 4, 1, 2, 3)))
        ).numpy()

    ours = VideoTokenizer(**mcfg.tokenizer_kwargs())
    our_enc = jax.jit(
        lambda p, x: ours.apply({"params": p}, x, method=ours.encode)
    )(model_params, jnp.asarray(video))
    return float(np.max(np.abs(
        np.asarray(our_enc) - np.transpose(ref_enc, (0, 2, 3, 4, 1))
    )))


if __name__ == "__main__":
    raise SystemExit(main())
