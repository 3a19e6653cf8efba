"""Train loop: jitted, donated, mesh-sharded steps + orbax checkpointing.

Replaces the reference's Lightning Trainer orchestration
(`/root/reference/config/tokenize.yaml:73-93`) with an explicit JAX loop:
one compiled train step (forward + backward + optax update) with donated
params/opt-state, bf16 compute policy, mesh-sharded batches, and frozen-
parameter masks (VGG in the tokenizer objective, the tokenizer inside
Genie).
"""
from __future__ import annotations

import time
from collections.abc import Mapping
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct

from open_genie_tpu.parallel.mesh import (
    batch_sharding,
    param_shardings,
    replicated,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jax.Array


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = 1.0,
    frozen_mask: Optional[Any] = None,
    ema_decay: Optional[float] = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW matching the reference optimizer config
    (`config/tokenize.yaml:49-53`), plus gradient clipping, an optional
    trainable-mask (True = train, False = frozen), an optional parameter
    EMA, and gradient accumulation.

    `lr` may be a float or an optax schedule (see
    `OptimizerConfig.schedule()`). The EMA rides in the optimizer state
    (`EmaState`), so it is checkpointed/restored with no train-state
    schema change; read it back with `get_ema_params(opt_state)`.
    `accum_steps > 1` averages gradients over that many train-step calls
    before applying one optimizer update (large effective batches within
    one chip's HBM); clip/EMA/schedules see only the applied steps.
    """
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=jax.tree.map(
                lambda t: "train" if t else "freeze", frozen_mask
            ),
        )
    if ema_decay is not None:
        # After multi_transform so frozen params' EMA stays at their
        # (constant) value instead of never initializing.
        tx = optax.chain(tx, _params_ema(ema_decay))
    if accum_steps and accum_steps > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=accum_steps
        ).gradient_transformation()
    return tx


class EmaState(struct.PyTreeNode):
    ema: Any


def _params_ema(decay: float) -> optax.GradientTransformation:
    """Maintain `ema = decay * ema + (1 - decay) * new_params` as a
    final link in the update chain (updates pass through unchanged)."""

    def init(params):
        # jnp.copy, not asarray: the EMA must own distinct buffers, or
        # donating the train state hands XLA the same buffer twice
        # (params and ema aliased) and Execute() rejects it.
        return EmaState(ema=jax.tree.map(jnp.copy, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("params EMA requires update(..., params=...)")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params,
        )
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state) -> Optional[Any]:
    """Extract the EMA param tree from an optimizer state (None if the
    optimizer was built without `ema_decay`)."""
    found = []

    def visit(node):
        if isinstance(node, EmaState):
            found.append(node.ema)
            return
        if isinstance(node, (tuple, list)):
            for child in node:
                visit(child)
        elif isinstance(node, Mapping):
            # optax multi_transform / chains keyed by dict (e.g.
            # inner_states) hide their leaves in Mapping values.
            for child in node.values():
                visit(child)

    visit(opt_state)
    return found[0] if found else None


def create_train_state(
    module,
    sample_batch,
    key: jax.Array,
    optimizer: optax.GradientTransformation,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    init_kwargs = init_kwargs or {}
    k_init, k_drop, k_loss, k_state = jax.random.split(key, 4)
    # jitted init: one compile + one exec instead of thousands of eager
    # dispatches (critical over a remote-device tunnel). A 'dropout' rng is
    # supplied so dropout-enabled blueprints initialize.
    variables = jax.jit(
        lambda k, kd: module.init(
            {"params": k, "dropout": kd}, sample_batch, k_loss, **init_kwargs
        )
    )(k_init, k_drop)
    params = variables["params"]
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        key=k_state,
    )


def _cast_batch(batch, compute_dtype):
    """Cast the FLOAT leaves of a batch pytree to the compute dtype;
    integer leaves (token/action ids) pass through untouched."""
    return jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        batch,
    )


def make_train_step(
    module,
    optimizer: optax.GradientTransformation,
    mesh=None,
    compute_dtype=None,
    loss_kwargs: Optional[dict] = None,
) -> Callable[[TrainState, jnp.ndarray], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step.

    When `mesh` is given, the batch is sharded over the `data` axis and
    params follow the tensor-parallel sharding rules -- GSPMD inserts the
    gradient all-reduce and TP collectives. `compute_dtype=jnp.bfloat16`
    casts the batch (and thus most activations) to bf16 while params/optim
    stay f32, matching '16-mixed' semantics (`config/tokenize.yaml:78`).

    Callable `loss_kwargs` values are step schedules: evaluated on the
    (traced) `state.step` inside the jitted step, so e.g. an LFQ
    entropy-weight anneal costs no recompile.
    """
    loss_kwargs = dict(loss_kwargs or {})

    def step_fn(state: TrainState, batch):
        kw = {
            k: (v(state.step) if callable(v) else v)
            for k, v in loss_kwargs.items()
        }
        key, sub, k_drop = jax.random.split(state.key, 3)
        if compute_dtype is not None:
            batch = _cast_batch(batch, compute_dtype)

        def loss_fn(params):
            if compute_dtype is not None:
                # True mixed precision: compute (incl. conv/matmul weights)
                # in bf16, master weights and the optimizer stay f32 --
                # gradients flow through the cast back to f32.
                apply_params = jax.tree.map(
                    lambda p: p.astype(compute_dtype)
                    if p.dtype == jnp.float32 else p,
                    params,
                )
            else:
                apply_params = params
            loss, metrics = module.apply(
                {"params": apply_params}, batch, sub,
                rngs={"dropout": k_drop}, **kw
            )
            return loss.astype(jnp.float32), metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, key=key
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    data_sh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, data_sh),
    )


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place a train state on the mesh: params per TP rules, rest replicated."""
    p_sh = param_shardings(state.params, mesh)
    rep = replicated(mesh)

    params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state.params, p_sh
    )
    opt_state = jax.tree.map(lambda x: jax.device_put(x, rep), state.opt_state)
    return state.replace(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(state.step, rep),
        key=jax.device_put(state.key, rep),
    )


# --------------------------------------------------------------------- #
# Checkpointing (orbax)
# --------------------------------------------------------------------- #

def save_checkpoint(ckpt_dir: str, state: TrainState, step: Optional[int] = None):
    """One-shot blocking save (closing the manager waits for the write)."""
    writer = CheckpointWriter(ckpt_dir)
    try:
        writer.save(state, step)
    finally:
        writer.close()


class CheckpointWriter:
    """Persistent async checkpoint writer for training loops.

    orbax's CheckpointManager saves asynchronously by default, but a
    manager opened per save (the one-shot `save_checkpoint`) must wait for
    the write before closing -- the train step stalls behind disk I/O.
    Keeping one manager alive for the whole run makes `save` return after
    the host snapshot is staged; serialization and the directory commit
    happen on orbax's background thread while training continues.
    `close()` drains pending writes (call it before reading the dir)."""

    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp
        import os

        self._dir = os.path.abspath(ckpt_dir)
        # max_to_keep garbage-collects the oldest step dirs at save time.
        # A flagship checkpoint is ~5 GB (params + opt state + EMA); an
        # uncapped 20k-step run at ckpt_every=2000 once filled 82 GB of a
        # 252 GB disk. The latest step always survives; `best` lives in
        # its own writer/dir and is never GC'd.
        opts = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        self._mgr = ocp.CheckpointManager(self._dir, options=opts)

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        import orbax.checkpoint as ocp

        step = int(state.step) if step is None else step
        # A previous (possibly incompatible) run may have left the same
        # step number in ckpt_dir. orbax's default then silently SKIPS
        # the save -- the run "succeeds" while the stale checkpoint
        # survives to explode (or silently restore wrong params) at load
        # time. force=True only bypasses the save-interval policy (it
        # raises StepAlreadyExistsError rather than overwrite), so the
        # stale step must be deleted explicitly first.
        if step in self._mgr.all_steps():
            self._mgr.delete(step)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(flax.serialization.to_state_dict(state)),
            force=True,
        )

    def purge(self) -> int:
        """Delete every existing step in the directory; returns the count.

        For FRESH (non-resume) runs into a reused ckpt_dir: stale steps
        from an earlier run with numbers above the new run's final step
        would survive as `latest_step()` and silently restore foreign
        params at eval/serve time (same failure family as the same-step
        skip above, but un-fixable at save time)."""
        steps = list(self._mgr.all_steps())
        for step in steps:
            self._mgr.delete(step)
        return len(steps)

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_params(ckpt_dir: str, params) -> Tuple[Any, int]:
    """Restore only the `params` subtree of the latest checkpoint.

    For inference/eval: the optimizer-state layout depends on the training-
    time freeze masks, which an inference template need not replicate.
    """
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return params, 0
        restored = mgr.restore(step)  # raw pytree, no template
    template = flax.serialization.to_state_dict(params)

    def _merge(tmpl, raw):
        if isinstance(tmpl, dict):
            return {k: _merge(tmpl[k], raw[k]) for k in tmpl}
        return jnp.asarray(raw)

    merged = _merge(template, restored["params"])
    return flax.serialization.from_state_dict(params, merged), int(step)


def restore_checkpoint(ckpt_dir: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore the latest checkpoint into the (template) state."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state, 0
        template = flax.serialization.to_state_dict(state)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return flax.serialization.from_state_dict(state, restored), int(step)
