"""Orbax checkpoint save/restore tests (SURVEY.md section 5)."""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.train.loop import (
    create_train_state,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from open_genie_tpu.train.losses import TokenizerTrainModule

KEY = jax.random.PRNGKey(0)
B, T, H, W = 1, 4, 16, 16

TOK = dict(
    enc_desc=(
        ("spacetime_downsample", {
            "in_channels": 3, "kernel_size": 3, "out_channels": 8,
            "time_factor": 1, "space_factor": 4,
        }),
        ("causal-conv3d", {"in_channels": 8, "out_channels": 4, "kernel_size": 1}),
    ),
    dec_desc=(
        ("causal-conv3d", {"in_channels": 4, "out_channels": 8, "kernel_size": 3}),
        ("depth2spacetime_upsample", {
            "in_channels": 8, "out_channels": 3, "kernel_size": 3,
            "time_factor": 1, "space_factor": 4,
        }),
    ),
    d_codebook=4,
)


def test_save_restore_roundtrip(tmp_path):
    module = TokenizerTrainModule(
        tokenizer=TOK, gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(module, sample, KEY, opt)

    step = make_train_step(module, opt)
    batch = jax.random.uniform(KEY, (B, T, H, W, 3))
    state, _ = step(jax.tree.map(jnp.array, state), batch)
    state = jax.device_get(state)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state)

    template = create_train_state(module, sample, jax.random.PRNGKey(9), opt)
    restored, step_no = restore_checkpoint(ckpt_dir, template)
    assert step_no == 1
    a = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    b = flax.traverse_util.flatten_dict(jax.device_get(restored.params))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # Optimizer state and PRNG key also roundtrip.
    np.testing.assert_array_equal(
        np.asarray(state.key), np.asarray(restored.key)
    )


def test_async_writer_multiple_saves_restore_latest(tmp_path):
    """CheckpointWriter: non-blocking saves drain on close; the latest
    step restores, and restore sees nothing until the writer closes only
    if the write is still in flight (close() is the barrier)."""
    from open_genie_tpu.train.loop import CheckpointWriter

    module = TokenizerTrainModule(
        tokenizer=TOK, gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = jax.device_get(create_train_state(module, sample, KEY, opt))

    ckpt_dir = str(tmp_path / "ckpt")
    writer = CheckpointWriter(ckpt_dir)
    writer.save(state, 1)
    writer.save(state.replace(step=2), 2)
    writer.close()

    template = create_train_state(module, sample, jax.random.PRNGKey(9), opt)
    restored, step_no = restore_checkpoint(ckpt_dir, template)
    assert step_no == 2
    a = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    b = flax.traverse_util.flatten_dict(jax.device_get(restored.params))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_writer_max_to_keep_prunes_oldest(tmp_path):
    """max_to_keep GC's the oldest step dirs at save time (a flagship
    checkpoint is ~5 GB; an uncapped run once filled a third of the disk)
    while the latest step always survives and restores."""
    import os

    from open_genie_tpu.train.loop import CheckpointWriter

    module = TokenizerTrainModule(
        tokenizer=TOK, gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = jax.device_get(create_train_state(module, sample, KEY, opt))

    ckpt_dir = str(tmp_path / "ckpt")
    writer = CheckpointWriter(ckpt_dir, max_to_keep=2)
    for s in (1, 2, 3, 4):
        writer.save(state.replace(step=s), s)
    writer.close()

    kept = sorted(
        int(d) for d in os.listdir(ckpt_dir) if d.isdigit()
    )
    assert kept == [3, 4]
    template = create_train_state(module, sample, jax.random.PRNGKey(9), opt)
    _, step_no = restore_checkpoint(ckpt_dir, template)
    assert step_no == 4


def test_restore_missing_returns_step0(tmp_path):
    module = TokenizerTrainModule(
        tokenizer=TOK, gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(module, sample, KEY, opt)
    restored, step_no = restore_checkpoint(str(tmp_path / "none"), state)
    assert step_no == 0


def test_writer_overwrites_stale_same_step(tmp_path):
    """A ckpt_dir holding the SAME step number from a previous run must be
    overwritten, not silently skipped: orbax's default skips existing
    steps, which left a stale incompatible checkpoint behind a train run
    that appeared to succeed (found via a real restore explosion)."""
    from open_genie_tpu.train.loop import CheckpointWriter

    module = TokenizerTrainModule(
        tokenizer=TOK, gan_loss_weight=0.0, perc_loss_weight=0.0,
    )
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = jax.device_get(create_train_state(module, sample, KEY, opt))

    ckpt_dir = str(tmp_path / "ckpt")
    w1 = CheckpointWriter(ckpt_dir)
    w1.save(state, 3)
    w1.close()

    # "new run" into the same dir: different param values, same step
    state2 = jax.device_get(
        create_train_state(module, sample, jax.random.PRNGKey(42), opt)
    )
    w2 = CheckpointWriter(ckpt_dir)
    w2.save(state2, 3)
    w2.close()

    template = create_train_state(module, sample, jax.random.PRNGKey(9), opt)
    restored, step_no = restore_checkpoint(ckpt_dir, template)
    assert step_no == 3
    a = flax.traverse_util.flatten_dict(jax.device_get(state2.params))
    b = flax.traverse_util.flatten_dict(jax.device_get(restored.params))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
