"""Pre-tokenized staged training: shard IO, dict batching, dynamics-only
training end-to-end (`cli tokenize-data` -> `train dynamics`)."""
import numpy as np
import pytest

from open_genie_tpu.data.loader import BatchLoader
from open_genie_tpu.data.tokens import TokenClipDataset, write_token_shard


def _write_shards(root, n=4, t=3, h=4, w=4, split="train", seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        write_token_shard(
            str(root / split / f"{i:04d}.npz"),
            rng.integers(0, 16, (t, h, w)),
            rng.integers(0, 4, (t,)),
        )


def test_token_shard_roundtrip(tmp_path):
    _write_shards(tmp_path, n=3)
    ds = TokenClipDataset(str(tmp_path), split="train")
    assert len(ds) == 3
    item = ds[0]
    assert item["tokens"].shape == (3, 4, 4)
    assert item["tokens"].dtype == np.int32
    assert item["actions"].shape == (3,)


def test_token_dataset_flat_dir_rejects_val(tmp_path):
    for i in range(2):
        write_token_shard(
            str(tmp_path / f"{i}.npz"),
            np.zeros((2, 4, 4), np.int32), np.zeros((2,), np.int32),
        )
    assert len(TokenClipDataset(str(tmp_path), split="train")) == 2
    with pytest.raises(FileNotFoundError):
        TokenClipDataset(str(tmp_path), split="val")


def test_batch_loader_stacks_dict_items(tmp_path):
    _write_shards(tmp_path, n=4)
    ds = TokenClipDataset(str(tmp_path))
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert set(b.keys()) == {"tokens", "actions"}
    assert np.asarray(b["tokens"]).shape == (2, 3, 4, 4)
    assert np.asarray(b["actions"]).shape == (2, 3)


def test_train_dynamics_on_token_shards(tmp_path):
    from open_genie_tpu.train.config import (
        DataConfig,
        DynamicsModelConfig,
        ExperimentConfig,
        TrainerConfig,
    )
    from open_genie_tpu.train.trainer import train_dynamics

    _write_shards(tmp_path / "tokens", n=4, split="train", seed=0)
    _write_shards(tmp_path / "tokens", n=2, split="val", seed=1)

    cfg = ExperimentConfig(
        model=DynamicsModelConfig(
            dynamics=dict(
                desc=(("space-time_attn",
                       {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),),
                embed_dim=16,
            ),
            tok_vocab=16,
            act_vocab=4,
        ),
        data=DataConfig(source="tokens", root=str(tmp_path / "tokens"),
                        batch_size=2, num_workers=1),
        trainer=TrainerConfig(
            max_steps=2, precision="16-mixed", log_every_n_steps=1,
            ckpt_dir=str(tmp_path / "ckpt"), ckpt_every_n_steps=2,
            val_check_interval=2, limit_val_batches=1,
            log_dir=str(tmp_path / "logs"), n_data=1,
        ),
    )
    state = train_dynamics(cfg)
    assert int(state.step) == 2
    # checkpoint + config snapshot written
    import os

    assert os.path.isdir(tmp_path / "ckpt" / "2")
    assert os.path.exists(tmp_path / "ckpt" / "config.yaml")


def test_staged_dynamics_warm_starts_genie(tmp_path):
    """`train dynamics` checkpoint -> Genie via `dynamics_ckpt`: the
    staged recipe's hand-off. The genie train state's dynamics subtree
    must equal the staged checkpoint's params exactly after loading."""
    import flax
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.train.config import (
        DataConfig,
        DynamicsModelConfig,
        ExperimentConfig,
        TrainerConfig,
    )
    from open_genie_tpu.train.loop import create_train_state, make_optimizer
    from open_genie_tpu.train.losses import GenieTrainModule
    from open_genie_tpu.train.trainer import (
        _load_dynamics_into_genie,
        train_dynamics,
    )

    dyn_kwargs = dict(
        desc=(("space-time_attn",
               {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),),
        embed_dim=16,
    )
    # Vocabs must match the genie side: 2^d_codebook of tokenizer/action.
    _write_shards(tmp_path / "tokens", n=2, split="train")
    dyn_cfg = ExperimentConfig(
        model=DynamicsModelConfig(dynamics=dyn_kwargs, tok_vocab=16, act_vocab=4),
        data=DataConfig(source="tokens", root=str(tmp_path / "tokens"),
                        batch_size=2, num_workers=1),
        trainer=TrainerConfig(
            max_steps=1, precision="32", log_every_n_steps=1,
            ckpt_dir=str(tmp_path / "dyn_ckpt"), ckpt_every_n_steps=1,
            log_dir=str(tmp_path / "dyn_logs"), n_data=1,
        ),
    )
    dyn_state = train_dynamics(dyn_cfg)
    want = flax.traverse_util.flatten_dict(
        jax.device_get(dyn_state.params["model"])
    )

    genie_kwargs = dict(
        tokenizer=dict(
            enc_desc=(
                ("spacetime_downsample", {
                    "in_channels": 3, "kernel_size": 3, "out_channels": 8,
                    "time_factor": 1, "space_factor": 4,
                }),
                ("causal-conv3d", {"in_channels": 8, "out_channels": 4,
                                   "kernel_size": 1}),
            ),
            dec_desc=(
                ("causal-conv3d", {"in_channels": 4, "out_channels": 8,
                                   "kernel_size": 3}),
                ("depth2spacetime_upsample", {
                    "in_channels": 8, "out_channels": 3, "kernel_size": 3,
                    "time_factor": 1, "space_factor": 4,
                }),
            ),
            d_codebook=4,
        ),
        latent_action=dict(
            enc_desc=(("space-time_attn",
                       {"n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8}),),
            dec_desc=(("space-time_attn", {
                "n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8,
                "has_ext": True, "time_attn_kw": {"key_dim": 2},
            }),),
            d_codebook=2, n_embd=8, inp_shape=(16, 16),
        ),
        dynamics=dyn_kwargs,
    )
    module = GenieTrainModule(genie=genie_kwargs)
    sample = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    state = create_train_state(
        module, sample, jax.random.PRNGKey(0), make_optimizer(),
    )
    state = _load_dynamics_into_genie(state, str(tmp_path / "dyn_ckpt"))
    got = flax.traverse_util.flatten_dict(
        jax.device_get(state.params["model"]["dynamics_"])
    )
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_genie_ckpt_full_warm_start(tmp_path):
    """`train genie` checkpoint -> fresh Genie train state via
    `genie_ckpt`: the staged pipeline's final phase must keep the stage-2
    latent-action codebook (the shard-trained dynamics was conditioned on
    its action ids), not re-learn actions from scratch. All three model
    subtrees must round-trip exactly."""
    import flax
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        save_checkpoint,
    )
    from open_genie_tpu.train.losses import GenieTrainModule
    from open_genie_tpu.train.trainer import _load_genie_into_genie

    genie_kwargs = dict(
        tokenizer=dict(
            enc_desc=(
                ("spacetime_downsample", {
                    "in_channels": 3, "kernel_size": 3, "out_channels": 8,
                    "time_factor": 1, "space_factor": 4,
                }),
                ("causal-conv3d", {"in_channels": 8, "out_channels": 4,
                                   "kernel_size": 1}),
            ),
            dec_desc=(
                ("causal-conv3d", {"in_channels": 4, "out_channels": 8,
                                   "kernel_size": 3}),
                ("depth2spacetime_upsample", {
                    "in_channels": 8, "out_channels": 3, "kernel_size": 3,
                    "time_factor": 1, "space_factor": 4,
                }),
            ),
            d_codebook=4,
        ),
        latent_action=dict(
            enc_desc=(("space-time_attn",
                       {"n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8}),),
            dec_desc=(("space-time_attn", {
                "n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8,
                "has_ext": True, "time_attn_kw": {"key_dim": 2},
            }),),
            d_codebook=2, n_embd=8, inp_shape=(16, 16),
        ),
        dynamics=dict(
            desc=(("space-time_attn",
                   {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),),
            embed_dim=16,
        ),
    )
    module = GenieTrainModule(genie=genie_kwargs)
    sample = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    src = create_train_state(
        module, sample, jax.random.PRNGKey(1), make_optimizer(),
        init_kwargs={"method": module.full_init},
    )
    save_checkpoint(str(tmp_path / "genie_ckpt"), src, step=1)
    want = flax.traverse_util.flatten_dict(
        jax.device_get(src.params["model"])
    )

    dst = create_train_state(
        module, sample, jax.random.PRNGKey(2), make_optimizer(),
        init_kwargs={"method": module.full_init},
    )
    # Different seed -> different init; the load must overwrite it all.
    dst = _load_genie_into_genie(dst, str(tmp_path / "genie_ckpt"))
    got = flax.traverse_util.flatten_dict(
        jax.device_get(dst.params["model"])
    )
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_dynamics_dict_batches_shard_over_mesh():
    """Dict batches (token shards) train on a multi-device DP mesh: the
    sharding maps over pytree leaves and int leaves survive the bf16
    cast."""
    import jax
    import jax.numpy as jnp

    from open_genie_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        place_batch,
    )
    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        make_train_step,
        shard_state,
    )
    from open_genie_tpu.train.losses import DynamicsTrainModule

    module = DynamicsTrainModule(dynamics=dict(
        desc=(("space-time_attn",
               {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),),
        embed_dim=16, tok_vocab=16, act_vocab=4,
    ))
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8

    key = jax.random.PRNGKey(0)
    batch = {
        "tokens": jax.random.randint(key, (8, 3, 4, 4), 0, 16),
        "actions": jax.random.randint(key, (8, 3), 0, 4),
    }
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(module, batch, key, opt)
    state = shard_state(state, mesh)
    step = make_train_step(module, opt, mesh=mesh, compute_dtype=jnp.bfloat16)

    placed = place_batch(batch, batch_sharding(mesh))
    assert placed["tokens"].dtype == jnp.int32  # ints survived placement
    state2, metrics = step(state, placed)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
