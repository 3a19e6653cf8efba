"""Experiment drivers: wire config + data + loop for tokenizer/Genie runs.

The equivalents of `python tokenizer.py train -config ...` /
`python genie.py train -config ...` (reference root scripts) as plain
functions, invoked by `open_genie_tpu.cli`.
"""
from __future__ import annotations

import os
import shutil
import sys
import time
from collections.abc import Mapping
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from open_genie_tpu.data.loader import BatchLoader
from open_genie_tpu.data.video import Platformer2D, SyntheticVideo
from open_genie_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
)
from open_genie_tpu.train.config import (
    ExperimentConfig,
    GenieModelConfig,
    TokenizerModelConfig,
)
from open_genie_tpu.train.loop import (
    CheckpointWriter,
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    shard_state,
)
from open_genie_tpu.train.losses import (
    GenieTrainModule,
    TokenizerTrainModule,
    frozen_param_mask,
)
from open_genie_tpu.train.metrics import MetricLogger


def build_dataset(cfg, split: str = "train") -> object:
    if cfg.source == "synthetic" or not cfg.root:
        return SyntheticVideo(
            num_videos=cfg.num_videos if split == "train"
            else max(1, cfg.num_videos // 8),
            num_frames=cfg.num_frames,
            height=cfg.height,
            width=cfg.width,
            seed=0 if split == "train" else 1,
        )
    if cfg.source == "gvid":
        from open_genie_tpu.data.native import GVidDataset

        # convention: <root>/<split>.gvid or a single file for both splits
        path = cfg.root
        if os.path.isdir(path):
            path = os.path.join(path, f"{split}.gvid")
        return GVidDataset(path, num_frames=cfg.num_frames)
    if cfg.source == "tokens":
        from open_genie_tpu.data.tokens import TokenClipDataset

        return TokenClipDataset(cfg.root, split=split)
    if cfg.source == "kinetics":
        from open_genie_tpu.data.kinetics import KineticsFolder

        return KineticsFolder(
            root=cfg.root,
            split=split if split != "valid" else "val",
            frames_per_clip=cfg.num_frames,
            step_between_clips=cfg.step_between_clips,
            frame_rate=cfg.frame_rate,
            num_classes=cfg.num_classes,
            randomize=cfg.randomize,
        )
    return Platformer2D(
        root=cfg.root,
        env_name=cfg.env_name,
        split=split,
        padding=cfg.padding,
        randomize=cfg.randomize,
        num_frames=cfg.num_frames,
    )


def _sample_batch_shape(dataset, cfg) -> tuple:
    """Init-sample shape `(B, T, H, W, C)` from a REAL dataset item.

    File-backed sources (platformer mp4 trees, gvid, kinetics) yield
    whatever resolution is on disk; trusting `cfg.height/width` there turns
    a config mismatch into an opaque flax param-shape error on the first
    training batch. Synthetic sources honor the config, so the fallback
    only fires when the dataset cannot be peeked."""
    try:
        item = dataset[0]
        t, h, w, c = item.shape[-4:]
        return (cfg.data.batch_size, t, h, w, c)
    except (IndexError, NotImplementedError):
        pass  # expected: empty/peek-less sources honor the config
    except Exception as e:  # noqa: BLE001 -- fall back, but say why
        print(
            f"# WARNING: dataset peek failed ({type(e).__name__}: {e}); "
            "falling back to config shapes -- a corrupt source will "
            "resurface as a shape/param error on the first real batch",
            file=sys.stderr,
        )
    return (
        cfg.data.batch_size, cfg.data.num_frames,
        cfg.data.height, cfg.data.width, 3,
    )


def build_loader(cfg, dataset, mesh, tcfg, split: str = "train"):
    """Batch loader for a dataset: the C++ prefetcher for .gvid sources
    (`data/native.py`), threaded Python decode otherwise.

    Validation batch sizes round DOWN to a multiple of the mesh `data`
    axis so val batches shard like train batches; a val set smaller than
    the data axis falls back to tiny replicated batches (never a silent
    zero-length loader). Multi-process (after `init_distributed`): each
    process loads a disjoint stride of the dataset and 1/num_processes of
    the global batch; `place_batch` assembles the global array.
    """
    from open_genie_tpu.data.loader import DatasetShard
    from open_genie_tpu.data.native import GVidDataset, NativeBatchLoader
    from open_genie_tpu.parallel.mesh import DATA_AXIS

    train = split == "train"
    n_data = mesh.shape[DATA_AXIS]
    batch_size = cfg.data.batch_size
    sharding = batch_sharding(mesh)
    if not train:
        batch_size = min(batch_size, len(dataset))
        rounded = batch_size - batch_size % n_data
        if rounded == 0:
            sharding = None  # val set smaller than the data axis
        else:
            batch_size = rounded

    nproc = jax.process_count()
    if nproc > 1:
        assert batch_size % nproc == 0, (
            f"global batch {batch_size} must divide over {nproc} processes"
        )
        dataset = DatasetShard(dataset, jax.process_index(), nproc)
        batch_size //= nproc

    if isinstance(dataset, GVidDataset):
        return NativeBatchLoader(
            dataset,
            batch_size=batch_size,
            shuffle=train,
            num_threads=cfg.data.num_workers,
            seed=tcfg.seed,
            sharding=sharding,
        )
    return BatchLoader(
        dataset,
        batch_size=batch_size,
        shuffle=train,
        num_workers=cfg.data.num_workers,
        seed=tcfg.seed,
        sharding=sharding,
    )


def _opt_kwargs(ocfg) -> dict:
    """OptimizerConfig -> make_optimizer kwargs (schedule resolved)."""
    return dict(
        lr=ocfg.schedule(),
        weight_decay=ocfg.weight_decay,
        b1=ocfg.b1,
        b2=ocfg.b2,
        grad_clip=ocfg.grad_clip,
        ema_decay=ocfg.ema_decay,
        accum_steps=ocfg.accum_steps,
    )


def _make_val_fn(module, compute_dtype, loss_kwargs=None):
    """Jitted no-update eval step returning the loss metrics."""
    import functools

    loss_kwargs = dict(loss_kwargs or {})

    @functools.partial(jax.jit, static_argnums=())
    def val_fn(state, batch):
        if compute_dtype is not None:
            from open_genie_tpu.train.loop import _cast_batch

            batch = _cast_batch(batch, compute_dtype)
        key = jax.random.fold_in(state.key, 1)
        _, metrics = module.apply(
            {"params": state.params}, batch, key, train=False, **loss_kwargs
        )
        return metrics

    return val_fn


def _compute_dtype(precision: str):
    return jnp.bfloat16 if str(precision).startswith("16") else None


def _entropy_anneal_kwargs(mcfg) -> dict:
    """loss_kwargs for the LFQ entropy anneal (empty dict = no anneal).

    Returns `{"entropy_scale": schedule}` where the schedule maps the
    traced step to a scale ramping 1 -> 0 linearly over
    `lfq_entropy_anneal_steps` from `lfq_entropy_anneal_start`.
    `make_train_step` evaluates callables on `state.step` inside the
    jitted step, so the anneal costs no recompiles.
    """
    kwargs = {}
    start = getattr(mcfg, "lfq_entropy_anneal_start", None)
    if start is not None:
        ramp = max(int(getattr(mcfg, "lfq_entropy_anneal_steps", 1000)), 1)

        def entropy_scale(step, start=start, ramp=ramp):
            frac = (jnp.asarray(step, jnp.float32) - float(start)) / float(ramp)
            return jnp.clip(1.0 - frac, 0.0, 1.0)

        kwargs["entropy_scale"] = entropy_scale

    # Bit-balance anneal: 1 -> floor (not 0 -- keep a weak restoring
    # force) once the codebook is established. At convergence the balance
    # term is 2-3x the rec loss and competes with reconstruction.
    b_start = getattr(mcfg, "lfq_bit_balance_anneal_start", None)
    if b_start is not None:
        b_ramp = max(int(getattr(mcfg, "lfq_bit_balance_anneal_steps", 1000)), 1)
        floor = float(getattr(mcfg, "lfq_bit_balance_anneal_floor", 0.05))

        def bit_balance_scale(step, start=b_start, ramp=b_ramp, floor=floor):
            frac = (jnp.asarray(step, jnp.float32) - float(start)) / float(ramp)
            return jnp.clip(1.0 - frac, floor, 1.0)

        kwargs["bit_balance_scale"] = bit_balance_scale

    return kwargs


def build_tokenizer_module(mcfg: TokenizerModelConfig) -> TokenizerTrainModule:
    """Single source of the tokenizer train-module construction: training,
    eval, and CLI checkpoint templates must produce identical param trees
    (restore merges by template, so a drifted field surfaces as an opaque
    key/shape error)."""
    return TokenizerTrainModule(
        tokenizer=mcfg.tokenizer_kwargs(),
        disc_kwargs=mcfg.disc_kwargs,
        perceptual_model=mcfg.perceptual_model,
        perc_feat_layers=tuple(mcfg.perc_feat_layers),
        gan_discriminate=mcfg.gan_discriminate,
        gan_frames_per_batch=mcfg.gan_frames_per_batch,
        gan_loss_weight=mcfg.gan_loss_weight,
        perc_loss_weight=mcfg.perc_loss_weight,
        quant_loss_weight=mcfg.quant_loss_weight,
    )


def genie_model_kwargs(mcfg: GenieModelConfig) -> dict:
    """The Genie constructor kwargs shared by training, generate, play,
    and eval (same param-tree-identity requirement as above)."""
    return dict(
        tokenizer=mcfg.tokenizer,
        latent_action=mcfg.latent_action,
        dynamics=mcfg.dynamics,
    )


def restore_ema_params(module, sample, key, opt_kwargs, frozen_prefixes,
                       ckpt, init_kwargs=None):
    """Restore a checkpoint's EMA param tree.

    The EMA rides in the optimizer state, so the optimizer layout must
    replicate training exactly: same schedules/accum (`opt_kwargs` from
    the same config) and the same freeze mask (`frozen_prefixes`). The
    single implementation behind every `--ema` flag. Returns
    `(ema_params, step)`.
    """
    from open_genie_tpu.train.loop import get_ema_params

    opt = make_optimizer(**opt_kwargs)
    state = create_train_state(
        module, sample, key, opt, init_kwargs=init_kwargs
    )
    if frozen_prefixes:
        mask = frozen_param_mask(state.params, tuple(frozen_prefixes))
        opt = make_optimizer(**opt_kwargs, frozen_mask=mask)
        state = state.replace(opt_state=opt.init(state.params))
    state, step = restore_checkpoint(ckpt, state)
    ema = get_ema_params(state.opt_state)
    assert ema is not None, (
        "--ema: checkpoint carries no parameter EMA "
        "(train with model.optimizer.ema_decay set)"
    )
    return ema, step


def load_genie_params(cfg: ExperimentConfig, sample, ckpt=None,
                      use_ema: bool = False):
    """Template-build a Genie and restore checkpoint params for inference.

    The single restore path behind `generate`, `play`, and `eval genie`:
    builds the FULL train-module param tree (incl. the pixel decoder) so
    training checkpoints restore cleanly, and with `use_ema` rebuilds the
    training-time optimizer layout (schedules/accum/frozen-tokenizer
    mask) to read the EMA tree out of the optimizer state.

    Returns `(genie_kwargs, params, step)`; `params` is the train-module
    tree (the bare Genie's subtree is `params["model"]`).
    """
    from open_genie_tpu.train.loop import restore_params

    assert not (use_ema and not ckpt), (
        "--ema requires --ckpt (there is no EMA without a checkpoint)"
    )
    mcfg: GenieModelConfig = cfg.model
    genie_kwargs = genie_model_kwargs(mcfg)
    module = GenieTrainModule(genie=genie_kwargs)
    key = jax.random.PRNGKey(cfg.trainer.seed)

    if ckpt and use_ema:
        ema, step = restore_ema_params(
            module, sample, key, _opt_kwargs(mcfg.optimizer),
            ("model/tokenizer_",), ckpt,
            init_kwargs={"method": module.full_init},
        )
        return genie_kwargs, ema, step

    state = create_train_state(
        module, sample, key, make_optimizer(),
        init_kwargs={"method": module.full_init},
    )
    params, step = state.params, 0
    if ckpt:
        params, step = restore_params(ckpt, params)
    return genie_kwargs, params, step


def train_tokenizer(cfg: ExperimentConfig, resume: bool = False) -> TrainState:
    mcfg: TokenizerModelConfig = cfg.model
    tcfg = cfg.trainer
    init_distributed()  # multi-host: env-driven, no-op single-process

    module = build_tokenizer_module(mcfg)

    dataset = build_dataset(cfg.data)
    mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
    loader = build_loader(cfg, dataset, mesh, tcfg)

    key = jax.random.PRNGKey(tcfg.seed)
    sample = jnp.zeros(_sample_batch_shape(dataset, cfg), jnp.float32)
    state = create_train_state(
        module, sample, key,
        optimizer := make_optimizer(
            **_opt_kwargs(mcfg.optimizer), frozen_mask=None,
        ),
    )
    warn_random_perceptual(mcfg)
    # Pretrained perceptual weights: converted torchvision VGG16
    # (reference loads `weights='DEFAULT'`, loss.py:39,46).
    if mcfg.perc_loss_weight > 0 and getattr(mcfg, "perc_weights_npz", None):
        import flax

        from open_genie_tpu.modules.vgg import load_torch_vgg16_npz

        vgg_vars = load_torch_vgg16_npz(mcfg.perc_weights_npz)
        params = flax.core.unfreeze(state.params)
        existing = params["perc_crit"]["vgg"]
        # The trunk only instantiates convs up to the deepest tap; the
        # converted file carries all 13 -- load the intersection.
        loaded = {k: v for k, v in vgg_vars["params"].items() if k in existing}
        assert loaded.keys() == existing.keys(), (
            f"VGG weight file missing layers: {set(existing) - set(loaded)}"
        )
        params["perc_crit"]["vgg"] = jax.tree.map(
            lambda old, new: jnp.asarray(new, old.dtype), existing, loaded
        )
        state = state.replace(params=params)

    # Freeze the VGG inside the perceptual loss.
    if mcfg.perc_loss_weight > 0:
        mask = frozen_param_mask(state.params, ("perc_crit",))
        optimizer = make_optimizer(
            **_opt_kwargs(mcfg.optimizer), frozen_mask=mask,
        )
        state = state.replace(opt_state=optimizer.init(state.params))

    start_step = 0
    if resume:
        state, start_step = restore_checkpoint(tcfg.ckpt_dir, state)

    state = shard_state(state, mesh)
    loss_kwargs = _entropy_anneal_kwargs(mcfg)
    if tcfg.gan_alternate and mcfg.gan_loss_weight > 0:
        # Alternating G/D optimization: even steps train the generator
        # branch, odd steps the discriminator branch (a config switch over
        # the reference's single summed objective, SURVEY section 7).
        step_gen = make_train_step(
            module, optimizer, mesh=mesh,
            compute_dtype=_compute_dtype(tcfg.precision),
            loss_kwargs={"gan_branch": "gen", **loss_kwargs},
        )
        step_dis = make_train_step(
            module, optimizer, mesh=mesh,
            compute_dtype=_compute_dtype(tcfg.precision),
            loss_kwargs={"gan_branch": "dis", **loss_kwargs},
        )
        counter = {"i": 0}

        def step_fn(state, batch):
            fn = step_gen if counter["i"] % 2 == 0 else step_dis
            counter["i"] += 1
            return fn(state, batch)
    else:
        step_fn = make_train_step(
            module, optimizer, mesh=mesh,
            compute_dtype=_compute_dtype(tcfg.precision),
            loss_kwargs=loss_kwargs,
        )
    val_loader = val_fn = None
    if tcfg.val_check_interval:
        val_ds = build_dataset(cfg.data, split="val")
        val_loader = build_loader(cfg, val_ds, mesh, tcfg, split="val")
        val_fn = _make_val_fn(module, _compute_dtype(tcfg.precision))
    save_config_snapshot(tcfg.ckpt_dir, cfg)
    return _run_loop(
        state, step_fn, loader, tcfg, start_step, resume=resume,
        val_fn=val_fn, val_loader=val_loader,
    )


def train_genie(cfg: ExperimentConfig, resume: bool = False) -> TrainState:
    mcfg: GenieModelConfig = cfg.model
    tcfg = cfg.trainer
    init_distributed()  # multi-host: env-driven, no-op single-process

    module = GenieTrainModule(genie=genie_model_kwargs(mcfg))

    dataset = build_dataset(cfg.data)
    mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
    loader = build_loader(cfg, dataset, mesh, tcfg)

    key = jax.random.PRNGKey(tcfg.seed)
    sample = jnp.zeros(_sample_batch_shape(dataset, cfg), jnp.float32)
    state = create_train_state(
        module, sample, key,
        make_optimizer(**_opt_kwargs(mcfg.optimizer)),
        init_kwargs={"method": module.full_init},
    )

    # Full-genie warm start FIRST (a previous `train genie` checkpoint:
    # tokenizer + latent action + dynamics together), so the staged final
    # phase keeps the action codebook its shard-trained dynamics was
    # conditioned on; the subtree loaders below then overwrite their
    # pieces on top.
    if getattr(mcfg, "genie_ckpt", None):
        state = _load_genie_into_genie(state, mcfg.genie_ckpt)
    # Frozen pre-trained tokenizer: restore weights, mask out of optimizer.
    if mcfg.tokenizer_ckpt:
        state = _load_tokenizer_into_genie(state, mcfg.tokenizer_ckpt)
    # Staged-pretrained dynamics ('train dynamics' on token shards): warm
    # start the dynamics trunk, then keep training it jointly.
    if mcfg.dynamics_ckpt:
        state = _load_dynamics_into_genie(state, mcfg.dynamics_ckpt)
    # Pre-trained latent-action VQ-VAE ('train action' on raw video):
    # warm start, then keep training jointly.
    if getattr(mcfg, "action_ckpt", None):
        state = _load_subtree_into_genie(
            state, mcfg.action_ckpt, "latent_action_"
        )
    mask = frozen_param_mask(state.params, ("model/tokenizer_",))
    optimizer = make_optimizer(
        **_opt_kwargs(mcfg.optimizer), frozen_mask=mask,
    )
    state = state.replace(opt_state=optimizer.init(state.params))

    start_step = 0
    if resume:
        state, start_step = restore_checkpoint(tcfg.ckpt_dir, state)

    state = shard_state(state, mesh)
    step_fn = make_train_step(
        module, optimizer, mesh=mesh,
        compute_dtype=_compute_dtype(tcfg.precision),
    )
    val_loader = val_fn = eval_hook = None
    if tcfg.val_check_interval:
        val_ds = build_dataset(cfg.data, split="val")
        val_loader = build_loader(cfg, val_ds, mesh, tcfg, split="val")
        val_fn = _make_val_fn(module, _compute_dtype(tcfg.precision))
        eval_hook = make_eval_video_hook(
            module, tcfg, size=cfg.data.height, num_frames=8
        )
    save_config_snapshot(tcfg.ckpt_dir, cfg)
    return _run_loop(
        state, step_fn, loader, tcfg, start_step, resume=resume,
        val_fn=val_fn, val_loader=val_loader, eval_hook=eval_hook,
    )


def train_action(cfg: ExperimentConfig, resume: bool = False) -> TrainState:
    """Standalone LatentAction VQ-VAE pre-training on raw video.

    The reference's `LatentAction.forward` objective (SURVEY 3.4,
    `/root/reference/genie/action.py:151-176`) as its own run: pixel
    reconstruction + tiny-codebook LFQ. The checkpoint warm-starts joint
    Genie training via `model.action_ckpt`."""
    from open_genie_tpu.train.losses import ActionTrainModule

    mcfg = cfg.model
    tcfg = cfg.trainer
    init_distributed()

    module = ActionTrainModule(latent_action=mcfg.latent_action)
    dataset = build_dataset(cfg.data)
    mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
    loader = build_loader(cfg, dataset, mesh, tcfg)

    key = jax.random.PRNGKey(tcfg.seed)
    sample = jnp.zeros(_sample_batch_shape(dataset, cfg), jnp.float32)
    optimizer = make_optimizer(**_opt_kwargs(mcfg.optimizer))
    state = create_train_state(module, sample, key, optimizer)

    start_step = 0
    if resume:
        state, start_step = restore_checkpoint(tcfg.ckpt_dir, state)

    state = shard_state(state, mesh)
    step_fn = make_train_step(
        module, optimizer, mesh=mesh,
        compute_dtype=_compute_dtype(tcfg.precision),
    )
    val_loader = val_fn = None
    if tcfg.val_check_interval:
        val_ds = build_dataset(cfg.data, split="val")
        val_loader = build_loader(cfg, val_ds, mesh, tcfg, split="val")
        val_fn = _make_val_fn(module, _compute_dtype(tcfg.precision))
    save_config_snapshot(tcfg.ckpt_dir, cfg)
    return _run_loop(
        state, step_fn, loader, tcfg, start_step, resume=resume,
        val_fn=val_fn, val_loader=val_loader,
    )


def train_dynamics(cfg: ExperimentConfig, resume: bool = False) -> TrainState:
    """Dynamics-only training over pre-tokenized clips (`source: tokens`,
    shards from `cli.py tokenize-data`). The staged-training third stage:
    tokenizer and latent actions are frozen on disk, the step is pure
    MaskGIT masked-CE over `(tokens, actions)` dict batches."""
    from open_genie_tpu.train.config import DynamicsModelConfig
    from open_genie_tpu.train.losses import DynamicsTrainModule

    mcfg: DynamicsModelConfig = cfg.model
    tcfg = cfg.trainer
    init_distributed()  # multi-host: env-driven, no-op single-process

    assert cfg.data.source == "tokens", (
        "train_dynamics consumes pre-tokenized shards; set data.source: "
        "tokens and data.root to a tokenize-data output directory"
    )
    module = DynamicsTrainModule(dynamics=mcfg.dynamics_kwargs())
    dataset = build_dataset(cfg.data)
    mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
    loader = build_loader(cfg, dataset, mesh, tcfg)

    key = jax.random.PRNGKey(tcfg.seed)
    item = dataset[0]
    sample = {
        k: np.zeros((cfg.data.batch_size,) + v.shape, v.dtype)
        for k, v in item.items()
    }
    optimizer = make_optimizer(**_opt_kwargs(mcfg.optimizer))
    state = create_train_state(module, sample, key, optimizer)

    start_step = 0
    if resume:
        state, start_step = restore_checkpoint(tcfg.ckpt_dir, state)

    state = shard_state(state, mesh)
    step_fn = make_train_step(
        module, optimizer, mesh=mesh,
        compute_dtype=_compute_dtype(tcfg.precision),
    )
    val_loader = val_fn = None
    if tcfg.val_check_interval:
        try:
            val_ds = build_dataset(cfg.data, split="val")
        except FileNotFoundError:
            val_ds = None  # flat shard dir without a val split
        if val_ds is not None:
            val_loader = build_loader(cfg, val_ds, mesh, tcfg, split="val")
            val_fn = _make_val_fn(module, _compute_dtype(tcfg.precision))
    save_config_snapshot(tcfg.ckpt_dir, cfg)
    return _run_loop(
        state, step_fn, loader, tcfg, start_step, resume=resume,
        val_fn=val_fn, val_loader=val_loader,
    )


def _load_dynamics_into_genie(state: TrainState, ckpt: str) -> TrainState:
    """Copy `model/...` params from a `train dynamics` checkpoint into
    `model/dynamics_/...` of a Genie train state (staged warm start)."""
    import flax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"No checkpoint found at {ckpt}"
        restored = mgr.restore(step)
    dyn_params = restored["params"]["model"]

    params = flax.core.unfreeze(state.params)
    want = params["model"]["dynamics_"]
    assert jax.tree.structure(want) == jax.tree.structure(dyn_params), (
        "dynamics checkpoint tree does not match the genie dynamics config"
    )
    # Leaf shapes too: identical trees with different vocab/width (e.g.
    # staged tok_vocab != 2^d_codebook of the genie tokenizer) would load
    # silently and corrupt training via clamped embedding gathers.
    mismatched = [
        str(path)
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree.leaves(dyn_params),
        )
        if tuple(a.shape) != tuple(np.shape(b))
    ]
    assert not mismatched, (
        "dynamics checkpoint param shapes do not match the genie dynamics "
        f"config (check tok_vocab/act_vocab vs the genie codebooks): "
        f"{mismatched[:5]}"
    )
    params["model"]["dynamics_"] = jax.tree.map(jnp.asarray, dyn_params)
    return state.replace(params=params)


def _load_genie_into_genie(state: TrainState, ckpt: str) -> TrainState:
    """Restore ALL `model/...` params from a previous `train genie`
    checkpoint into a fresh Genie train state (full warm start), with the
    same tree/leaf-shape guards as the subtree loaders. Unlike `--resume`,
    the optimizer state and step counter start fresh (a new schedule for a
    new phase)."""
    import flax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"No checkpoint found at {ckpt}"
        restored = mgr.restore(step)
    genie_params = restored["params"]["model"]

    params = flax.core.unfreeze(state.params)
    want = params["model"]
    assert jax.tree.structure(want) == jax.tree.structure(genie_params), (
        "genie checkpoint tree does not match the genie config"
    )
    mismatched = [
        str(path)
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree.leaves(genie_params),
        )
        if tuple(a.shape) != tuple(np.shape(b))
    ]
    assert not mismatched, (
        "genie checkpoint param shapes do not match the genie config: "
        f"{mismatched[:5]}"
    )
    params["model"] = jax.tree.map(jnp.asarray, genie_params)
    return state.replace(params=params)


def _load_subtree_into_genie(
    state: TrainState, ckpt: str, subtree: str
) -> TrainState:
    """Copy `model/...` params from a standalone-training checkpoint into
    `model/<subtree>/...` of a Genie train state (warm starts), with the
    same tree/leaf-shape guards as the dynamics loader."""
    import flax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"No checkpoint found at {ckpt}"
        restored = mgr.restore(step)
    sub_params = restored["params"]["model"]

    params = flax.core.unfreeze(state.params)
    want = params["model"][subtree]
    assert jax.tree.structure(want) == jax.tree.structure(sub_params), (
        f"{subtree} checkpoint tree does not match the genie config"
    )
    mismatched = [
        str(path)
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree.leaves(sub_params),
        )
        if tuple(a.shape) != tuple(np.shape(b))
    ]
    assert not mismatched, (
        f"{subtree} checkpoint param shapes do not match the genie config: "
        f"{mismatched[:5]}"
    )
    params["model"][subtree] = jax.tree.map(jnp.asarray, sub_params)
    return state.replace(params=params)


def _raw_ckpt_ema_params(restored) -> Optional[dict]:
    """Locate the parameter-EMA tree inside a raw (template-free) orbax
    restore of a TrainState: `EmaState` serializes as a dict with a single
    'ema' key nested in the opt_state chain, whatever the optimizer layout
    (clip/adamw/multi_transform/MultiSteps) was at train time."""
    hits = []

    def visit(node):
        if hits:
            return
        if isinstance(node, Mapping):
            for k, v in node.items():
                if k == "ema":
                    hits.append(v)
                    return
                visit(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                visit(v)

    visit(restored.get("opt_state", {}))
    return hits[0] if hits else None


def _load_tokenizer_into_genie(state: TrainState, ckpt: str) -> TrainState:
    """Copy `model/...` params from a tokenizer checkpoint into
    `model/tokenizer_/...` of a Genie train state.

    Prefers the checkpoint's parameter EMA when it carries one: the
    tokenizer is FROZEN inside Genie, and `eval tokenizer --ema` scores the
    EMA weights -- the dynamics model must learn the token vocabulary of
    the same weights the tokenizer is judged (and served) with.
    """
    import flax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"No checkpoint found at {ckpt}"
        restored = mgr.restore(step)
    ema = _raw_ckpt_ema_params(restored)
    if ema is not None:
        # Validate the depth-first 'ema' hit before trusting it: a future
        # optimizer state could nest an unrelated dict key named 'ema'.
        # The real parameter EMA mirrors the params pytree exactly.
        want = jax.tree_util.tree_map(np.shape, restored["params"])
        try:
            got = jax.tree_util.tree_map(np.shape, ema)
        except Exception:
            got = None
        if got != want:
            print(
                f"# WARNING: 'ema' subtree in {ckpt} opt_state does not "
                "mirror the params tree -- ignoring it and loading raw "
                "params instead."
            )
            ema = None
    tok_params = (ema or restored["params"])["model"]
    print(f"# tokenizer_ckpt {ckpt} step {step}: loading "
          + ("EMA params" if ema else "raw params (no EMA in checkpoint)"))

    params = flax.core.unfreeze(state.params)
    params["model"]["tokenizer_"] = jax.tree.map(
        jnp.asarray, tok_params
    )
    return state.replace(params=params)


def perc_weights_status(mcfg) -> str:
    """'disabled' | 'random' | '<npz path>' -- the provenance of the
    perceptual critic's features, recorded in the config snapshot."""
    if getattr(mcfg, "perc_loss_weight", 0) <= 0:
        return "disabled"
    return getattr(mcfg, "perc_weights_npz", None) or "random"


def warn_random_perceptual(mcfg) -> bool:
    """Loud stderr banner when perceptual training will run on a RANDOMLY
    initialized VGG16 (perc_loss_weight > 0 without `perc_weights_npz`).

    The reference trains against pretrained torchvision features
    (`/root/reference/genie/module/loss.py:39,46`); in this zero-egress
    environment the pretrained values are unobtainable, so the default is
    random features. That is a defensible metric -- random deep features
    correlate surprisingly well with perceptual similarity (Zhang et al.
    2018, LPIPS: even untrained nets beat classic metrics; Ulyanov et al.
    2018, Deep Image Prior) -- but it is a silent quality divergence from
    the reference unless announced. Returns True if the warning fired.
    """
    if perc_weights_status(mcfg) != "random":
        return False
    print(
        "# " + "=" * 68 + "\n"
        "# WARNING: perc_loss_weight > 0 with no model.perc_weights_npz --\n"
        "# the perceptual loss will use a RANDOMLY INITIALIZED VGG16.\n"
        "# Random-feature perceptual distances are a usable metric (LPIPS,\n"
        "# Zhang et al. 2018, Table: untrained nets), but to match the\n"
        "# reference's pretrained-VGG quality, convert torchvision weights\n"
        "# with tools/convert_vgg_weights.py and set model.perc_weights_npz.\n"
        "# The config snapshot records `perc_weights: random`.\n"
        "# " + "=" * 68,
        file=sys.stderr,
    )
    return True


def save_config_snapshot(ckpt_dir: str, cfg: ExperimentConfig) -> None:
    """Write the resolved experiment config next to the checkpoints.

    The reference embeds hyperparameters inside every Lightning checkpoint
    (`save_hyperparameters`, `/root/reference/genie/tokenizer.py:305`); the
    framework-neutral equivalent is a `config.yaml` in the orbax directory
    so any checkpoint can be re-instantiated without the launch config.
    """
    import dataclasses

    import yaml

    def plain(o):
        if dataclasses.is_dataclass(o) and not isinstance(o, type):
            return {f.name: plain(getattr(o, f.name)) for f in dataclasses.fields(o)}
        if isinstance(o, dict):
            return {str(k): plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        if isinstance(o, (str, int, float, bool)) or o is None:
            return o
        return repr(o)

    snap = plain(cfg)
    if hasattr(cfg, "model"):
        # Perceptual-feature provenance: makes `perc_weights: random`
        # training runs auditable from the checkpoint dir alone.
        snap["perc_weights"] = perc_weights_status(cfg.model)
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.yaml"), "w") as f:
        yaml.safe_dump(snap, f, sort_keys=False)


def _run_loop(
    state,
    step_fn,
    loader,
    tcfg,
    start_step: int,
    resume: bool = False,
    val_fn=None,
    val_loader=None,
    eval_hook=None,
) -> TrainState:
    """Training loop with periodic logging / validation / checkpointing.

    `val_fn(state, batch) -> metrics` runs every `val_check_interval` steps
    over up to `limit_val_batches` batches (Lightning-equivalent knobs,
    `config/tokenize.yaml:79-81`); `eval_hook(state, step)` is the
    sample-video generation hook (reference `Genie.on_validation_end`,
    `genie/genie.py:155-174`).
    """
    logger = MetricLogger(tcfg.log_dir)
    if len(loader) == 0:
        raise ValueError(
            "empty train loader: dataset smaller than batch_size "
            f"({len(loader.dataset)} < {loader.batch_size})"
        )
    # Persistent async writers: saves overlap with training (the one-shot
    # blocking save would stall the step on disk I/O); drained in the
    # finally below so an exception mid-loop still commits staged saves.
    ckpt_writer = CheckpointWriter(
        tcfg.ckpt_dir, max_to_keep=getattr(tcfg, "ckpt_max_keep", None)
    )
    if not resume:
        # Fresh (non-resume) run claiming a reused ckpt_dir: stale steps
        # from an earlier run would outlive this one as `latest_step()`
        # and restore foreign params at eval/serve time.  Keyed on the
        # resume FLAG, not `start_step == 0`: a legitimate resume can sit
        # at step 0 (e.g. a checkpoint written by
        # tools/import_reference_ckpt.py) and must not be purged.
        n_stale = ckpt_writer.purge()
        best_dir = os.path.join(tcfg.ckpt_dir, "best")
        if os.path.isdir(best_dir):
            shutil.rmtree(best_dir)
            n_stale += 1
        if n_stale:
            print(
                f"# ckpt_dir {tcfg.ckpt_dir} held {n_stale} stale "
                "checkpoint(s) from a previous run -- purged (pass "
                "--resume to continue a previous run instead)"
            )
    best_writer = None
    max_steps = tcfg.max_steps or (tcfg.max_epochs * len(loader))
    # Best-checkpoint tracking: ModelCheckpoint(monitor=...) equivalent.
    # Monitor 'val_loss' means the 'loss' key of the validation metrics.
    monitor = getattr(tcfg, "monitor", "val_loss") or "val_loss"
    monitor_key = monitor[4:] if monitor.startswith("val_") else monitor
    best_val = float("inf")
    # Optional jax.profiler window (TrainerConfig.profile_*): traces N
    # steps to <log_dir>/profile for TensorBoard/XProf.
    prof_n = getattr(tcfg, "profile_num_steps", 0) or 0
    prof_start = getattr(tcfg, "profile_start_step", 0) or 0
    tracing = False
    step = start_step
    t0 = time.time()
    done = False
    from open_genie_tpu.data.loader import device_prefetch

    try:
        while not done:
            # Keep 2 sharded device batches in flight ahead of the step:
            # the next batch's host->HBM transfer overlaps the current
            # step's compute instead of serializing behind it.
            for batch in device_prefetch(loader, size=2):
                # >= not ==: a resume past profile_start_step still traces
                # the next prof_n steps instead of silently never starting.
                if prof_n and not tracing and prof_start <= step < prof_start + prof_n:
                    jax.profiler.start_trace(
                        os.path.join(tcfg.log_dir, "profile")
                    )
                    tracing = True
                state, metrics = step_fn(state, batch)
                step += 1
                if tracing and step >= prof_start + prof_n:
                    # Hard host sync: block_until_ready returns early over
                    # a remote-TPU tunnel (CLAUDE.md gotcha); a device_get
                    # transfer cannot.
                    jax.device_get(metrics)
                    jax.profiler.stop_trace()
                    tracing = False
                if step % tcfg.log_every_n_steps == 0:
                    metrics = jax.device_get(metrics)
                    dt = time.time() - t0
                    logger.log(step, {**{k: float(v) for k, v in metrics.items()},
                                      "steps_per_sec": tcfg.log_every_n_steps / dt})
                    t0 = time.time()
                if (
                    val_fn is not None
                    and val_loader is not None
                    and tcfg.val_check_interval
                    and step % tcfg.val_check_interval == 0
                ):
                    vm = _run_validation(
                        state, val_fn, val_loader, tcfg.limit_val_batches
                    )
                    logger.log(step, {f"val_{k}": v for k, v in vm.items()})
                    if monitor_key in vm and vm[monitor_key] < best_val:
                        best_val = vm[monitor_key]
                        if best_writer is None:
                            # best-so-far is monotone: only the newest
                            # best matters, so keep exactly one.
                            best_writer = CheckpointWriter(
                                os.path.join(tcfg.ckpt_dir, "best"),
                                max_to_keep=1,
                            )
                        best_writer.save(jax.device_get(state), step)
                    if eval_hook is not None:
                        eval_hook(state, step)
                    t0 = time.time()
                if step % tcfg.ckpt_every_n_steps == 0 or (
                    step >= max_steps and getattr(tcfg, "save_last", True)
                ):
                    ckpt_writer.save(jax.device_get(state), step)
                if step >= max_steps:
                    done = True
                    break
    finally:
        if tracing:
            jax.profiler.stop_trace()
        ckpt_writer.close()
        if best_writer is not None:
            best_writer.close()
        logger.close()
    return state


def _run_validation(state, val_fn, val_loader, limit: Optional[int]):
    import numpy as np

    sums: dict = {}
    count = 0
    for i, batch in enumerate(val_loader):
        if limit is not None and i >= limit:
            break
        metrics = jax.device_get(val_fn(state, batch))
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    return {k: v / max(count, 1) for k, v in sums.items()}


def make_eval_video_hook(module, tcfg, size: int = 64, num_frames: int = 8):
    """Sample-video generation hook for Genie training: roll out a short
    action-conditioned video from a noise prompt and dump it next to the
    logs (the reference logs via `add_video`; an mp4 is the framework-
    neutral equivalent)."""
    import numpy as np

    # One jitted program reused across hook invocations: eager dispatch of
    # the whole generate path over the TPU tunnel is pathologically slow
    # (CLAUDE.md), and the per-step keys/params are arguments so the
    # compile happens once.
    @jax.jit
    def _gen(params, prompt, actions, key):
        return module.apply(
            {"params": params}, prompt, actions, key,
            num_frames=num_frames, steps_per_frame=8,
            method=module.generate,
        )

    def hook(state, step):
        try:
            from open_genie_tpu.data.video import HAS_CV2, write_mp4

            if not HAS_CV2:
                return
            key = jax.random.PRNGKey(step)
            prompt = jax.random.uniform(key, (1, 1, size, size, 3))
            actions = jax.random.randint(key, (1, num_frames + 1), 0, 2)
            video = _gen(state.params, prompt, actions, key)
            out = np.asarray(jnp.clip(video[0], 0, 1))
            os.makedirs(tcfg.log_dir, exist_ok=True)
            write_mp4(
                os.path.join(tcfg.log_dir, f"sample_step{step}.mp4"), out
            )
        except Exception as e:  # eval must never kill training
            print(f"[eval-hook] sample video failed: {e}")

    return hook
