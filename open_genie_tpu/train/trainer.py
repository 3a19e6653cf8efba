"""Experiment drivers: wire config + data + loop for tokenizer/Genie runs.

The equivalents of `python tokenizer.py train -config ...` /
`python genie.py train -config ...` (reference root scripts) as plain
functions, invoked by `open_genie_tpu.cli`.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from open_genie_tpu.data.loader import BatchLoader
from open_genie_tpu.data.video import Platformer2D, SyntheticVideo
from open_genie_tpu.parallel.mesh import batch_sharding, make_mesh
from open_genie_tpu.train.config import (
    ExperimentConfig,
    GenieModelConfig,
    TokenizerModelConfig,
)
from open_genie_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    shard_state,
)
from open_genie_tpu.train.losses import (
    GenieTrainModule,
    TokenizerTrainModule,
    frozen_param_mask,
)
from open_genie_tpu.train.metrics import MetricLogger


def build_dataset(cfg) -> object:
    if cfg.source == "synthetic" or not cfg.root:
        return SyntheticVideo(
            num_videos=cfg.num_videos,
            num_frames=cfg.num_frames,
            height=cfg.height,
            width=cfg.width,
        )
    if cfg.source == "gvid":
        from open_genie_tpu.data.native import GVidDataset

        return GVidDataset(cfg.root, num_frames=cfg.num_frames)
    return Platformer2D(
        root=cfg.root,
        env_name=cfg.env_name,
        padding=cfg.padding,
        randomize=cfg.randomize,
        num_frames=cfg.num_frames,
    )


def _compute_dtype(precision: str):
    return jnp.bfloat16 if str(precision).startswith("16") else None


def train_tokenizer(cfg: ExperimentConfig, resume: bool = False) -> TrainState:
    mcfg: TokenizerModelConfig = cfg.model
    tcfg = cfg.trainer

    module = TokenizerTrainModule(
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

    dataset = build_dataset(cfg.data)
    mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
    loader = BatchLoader(
        dataset,
        batch_size=cfg.data.batch_size,
        num_workers=cfg.data.num_workers,
        seed=tcfg.seed,
        sharding=batch_sharding(mesh),
    )

    key = jax.random.PRNGKey(tcfg.seed)
    sample = jnp.zeros(
        (cfg.data.batch_size, cfg.data.num_frames, cfg.data.height,
         cfg.data.width, 3),
        jnp.float32,
    )
    state = create_train_state(
        module, sample, key,
        optimizer := make_optimizer(
            lr=mcfg.optimizer.lr,
            weight_decay=mcfg.optimizer.weight_decay,
            grad_clip=mcfg.optimizer.grad_clip,
            frozen_mask=None,
        ),
    )
    # Freeze the VGG inside the perceptual loss.
    if mcfg.perc_loss_weight > 0:
        mask = frozen_param_mask(state.params, ("perc_crit",))
        optimizer = make_optimizer(
            lr=mcfg.optimizer.lr,
            weight_decay=mcfg.optimizer.weight_decay,
            grad_clip=mcfg.optimizer.grad_clip,
            frozen_mask=mask,
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
    return _run_loop(state, step_fn, loader, tcfg, start_step)


def train_genie(cfg: ExperimentConfig, resume: bool = False) -> TrainState:
    mcfg: GenieModelConfig = cfg.model
    tcfg = cfg.trainer

    module = GenieTrainModule(
        genie=dict(
            tokenizer=mcfg.tokenizer,
            latent_action=mcfg.latent_action,
            dynamics=mcfg.dynamics,
        )
    )

    dataset = build_dataset(cfg.data)
    mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
    loader = BatchLoader(
        dataset,
        batch_size=cfg.data.batch_size,
        num_workers=cfg.data.num_workers,
        seed=tcfg.seed,
        sharding=batch_sharding(mesh),
    )

    key = jax.random.PRNGKey(tcfg.seed)
    sample = jnp.zeros(
        (cfg.data.batch_size, cfg.data.num_frames, cfg.data.height,
         cfg.data.width, 3),
        jnp.float32,
    )
    state = create_train_state(
        module, sample, key, make_optimizer(lr=mcfg.optimizer.lr),
        init_kwargs={"method": module.full_init},
    )

    # Frozen pre-trained tokenizer: restore weights, mask out of optimizer.
    if mcfg.tokenizer_ckpt:
        state = _load_tokenizer_into_genie(state, mcfg.tokenizer_ckpt)
    mask = frozen_param_mask(state.params, ("model/tokenizer_",))
    optimizer = make_optimizer(
        lr=mcfg.optimizer.lr,
        weight_decay=mcfg.optimizer.weight_decay,
        grad_clip=mcfg.optimizer.grad_clip,
        frozen_mask=mask,
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
    return _run_loop(state, step_fn, loader, tcfg, start_step)


def _load_tokenizer_into_genie(state: TrainState, ckpt: str) -> TrainState:
    """Copy `model/...` params from a tokenizer checkpoint into
    `model/tokenizer_/...` of a Genie train state."""
    import flax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"No checkpoint found at {ckpt}"
        restored = mgr.restore(step)
    tok_params = restored["params"]["model"]

    params = flax.core.unfreeze(state.params)
    params["model"]["tokenizer_"] = jax.tree.map(
        jnp.asarray, tok_params
    )
    return state.replace(params=params)


def _run_loop(state, step_fn, loader, tcfg, start_step: int) -> TrainState:
    logger = MetricLogger(tcfg.log_dir)
    max_steps = tcfg.max_steps or (tcfg.max_epochs * len(loader))
    step = start_step
    t0 = time.time()
    done = False
    while not done:
        for batch in loader:
            state, metrics = step_fn(state, batch)
            step += 1
            if step % tcfg.log_every_n_steps == 0:
                metrics = jax.device_get(metrics)
                dt = time.time() - t0
                logger.log(step, {**{k: float(v) for k, v in metrics.items()},
                                  "steps_per_sec": tcfg.log_every_n_steps / dt})
                t0 = time.time()
            if step % tcfg.ckpt_every_n_steps == 0 or step >= max_steps:
                save_checkpoint(tcfg.ckpt_dir, jax.device_get(state), step)
            if step >= max_steps:
                done = True
                break
    logger.close()
    return state
