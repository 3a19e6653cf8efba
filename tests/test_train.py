"""Train-step tests: tokenizer objective end-to-end, VGG freezing, Genie
joint loss, data pipeline, and multi-device mesh sharding on the virtual
8-CPU platform (what the reference never tests, SURVEY.md section 4)."""
import os

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.data.loader import BatchLoader
from open_genie_tpu.data.video import SyntheticVideo
from open_genie_tpu.parallel.mesh import batch_sharding, make_mesh
from open_genie_tpu.train.loop import (
    create_train_state,
    make_optimizer,
    make_train_step,
    shard_state,
)
from open_genie_tpu.train.losses import (
    GenieTrainModule,
    TokenizerTrainModule,
    frozen_param_mask,
)

KEY = jax.random.PRNGKey(0)
B, T, H, W = 2, 4, 16, 16

TOK = dict(
    enc_desc=(
        ("spacetime_downsample", {
            "in_channels": 3, "kernel_size": 3, "out_channels": 16,
            "time_factor": 1, "space_factor": 4,
        }),
        ("causal-conv3d", {"in_channels": 16, "out_channels": 6, "kernel_size": 1}),
    ),
    dec_desc=(
        ("causal-conv3d", {"in_channels": 6, "out_channels": 16, "kernel_size": 3}),
        ("depth2spacetime_upsample", {
            "in_channels": 16, "out_channels": 3, "kernel_size": 3,
            "time_factor": 1, "space_factor": 4,
        }),
    ),
    d_codebook=6,
)


def make_module():
    return TokenizerTrainModule(
        tokenizer=TOK,
        disc_kwargs=dict(
            inp_size=(H, W), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
        ),
        gan_frames_per_batch=2,
    )


@pytest.fixture(scope="module")
def _tok_state_template():
    module = make_module()
    sample = jnp.zeros((B, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(module, sample, KEY, opt)
    return module, opt, state


@pytest.fixture()
def tok_state(_tok_state_template):
    # Train steps donate the state's buffers; hand each test a fresh copy.
    module, opt, state = _tok_state_template
    return module, opt, jax.tree.map(jnp.array, state)


def test_tokenizer_objective_runs_and_updates(tok_state):
    module, opt, state = tok_state
    mask = frozen_param_mask(state.params, ("perc_crit",))
    opt = make_optimizer(lr=1e-3, frozen_mask=mask)
    state = state.replace(opt_state=opt.init(state.params))

    step = make_train_step(module, opt)
    batch = jax.random.uniform(KEY, (B, T, H, W, 3))
    vgg_before = jax.device_get(state.params["perc_crit"])
    model_before = jax.device_get(
        state.params["model"]["enc_layers_0"]["down"]["conv3d"]["kernel"]
    )
    state2, metrics = step(state, batch)

    assert np.isfinite(float(metrics["loss"]))
    for k in ("rec_loss", "gen_loss", "dis_loss", "perc_loss", "quant_loss"):
        assert k in metrics
    # VGG frozen, model updated.
    vgg_after = jax.device_get(state2.params["perc_crit"])
    flat_b = flax.traverse_util.flatten_dict(vgg_before)
    flat_a = flax.traverse_util.flatten_dict(vgg_after)
    for k in flat_b:
        np.testing.assert_array_equal(flat_b[k], flat_a[k])
    model_after = jax.device_get(
        state2.params["model"]["enc_layers_0"]["down"]["conv3d"]["kernel"]
    )
    assert not np.allclose(model_before, model_after)


def test_train_step_on_8_device_mesh(tok_state):
    module, opt, state = tok_state
    mesh = make_mesh()  # 8 virtual CPU devices, data axis
    assert mesh.shape["data"] == 8
    state = shard_state(state, mesh)
    step = make_train_step(module, opt, mesh=mesh)
    batch = jax.device_put(
        jax.random.uniform(KEY, (8, T, H, W, 3)), batch_sharding(mesh)
    )
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_dp_tp_mesh(tok_state):
    """4-way data x 2-way tensor mesh: GSPMD shards attention/head kernels."""
    module, opt, state = tok_state
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_state(state, mesh)
    step = make_train_step(module, opt, mesh=mesh)
    batch = jax.device_put(
        jax.random.uniform(KEY, (8, T, H, W, 3)), batch_sharding(mesh)
    )
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


GENIE = dict(
    tokenizer=TOK,
    latent_action=dict(
        enc_desc=(
            ("space-time_attn", {"n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8}),
        ),
        dec_desc=(
            ("space-time_attn", {
                "n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8,
                "has_ext": True, "time_attn_kw": {"key_dim": 4},
            }),
        ),
        d_codebook=4,
        n_embd=16,
        inp_shape=(H, W),
    ),
    dynamics=dict(
        desc=(("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 8}),),
        embed_dim=32,
    ),
)


def test_genie_joint_loss_and_frozen_tokenizer():
    module = GenieTrainModule(genie=GENIE)
    sample = jnp.zeros((1, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(
        module, sample, KEY, opt, init_kwargs={"method": module.full_init}
    )

    mask = frozen_param_mask(state.params, ("model/tokenizer_",))
    opt = make_optimizer(lr=1e-3, frozen_mask=mask)
    state = state.replace(opt_state=opt.init(state.params))

    step = make_train_step(module, opt)
    batch = jax.random.uniform(KEY, (1, T, H, W, 3))
    tok_before = flax.traverse_util.flatten_dict(
        jax.device_get(state.params["model"]["tokenizer_"])
    )
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "act_loss" in metrics and "dyn_loss" in metrics
    tok_after = flax.traverse_util.flatten_dict(
        jax.device_get(state2.params["model"]["tokenizer_"])
    )
    for k in tok_before:
        np.testing.assert_array_equal(tok_before[k], tok_after[k])


def test_batch_loader_shapes():
    ds = SyntheticVideo(num_videos=8, num_frames=4, height=16, width=16)
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].shape == (4, 4, 16, 16, 3)
    arr = np.asarray(batches[0])
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_batch_loader_prefetch_is_bounded():
    """Workers must not decode the whole epoch ahead of the consumer: with
    the consumer stalled after one batch, at most `prefetch + num_workers`
    batches past the served point may ever be claimed for decode."""
    import time

    class CountingDataset(SyntheticVideo):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.decoded = 0

        def __getitem__(self, idx):
            self.decoded += 1
            return super().__getitem__(idx)

    ds = CountingDataset(num_videos=64, num_frames=2, height=8, width=8)
    loader = BatchLoader(ds, batch_size=2, num_workers=2, prefetch=2,
                         shuffle=False)
    it = iter(loader)
    next(it)  # serve one batch, then stall
    time.sleep(0.3)  # give workers every chance to overrun the bound
    # window = prefetch + num_workers = 4 batches beyond the served point;
    # +1 for the batch already served = 5 batches = 10 items max.
    assert ds.decoded <= 10, (
        f"decoded {ds.decoded} items with consumer stalled -- prefetch "
        "bound not enforced"
    )
    it.close()


def test_batch_loader_propagates_worker_errors():
    class BrokenDataset(SyntheticVideo):
        def __getitem__(self, idx):
            raise RuntimeError("decode exploded")

    ds = BrokenDataset(num_videos=8, num_frames=2, height=8, width=8)
    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    with np.testing.assert_raises(RuntimeError):
        list(loader)


def test_synthetic_video_deterministic():
    ds = SyntheticVideo(num_videos=2, num_frames=3, height=8, width=8, seed=7)
    np.testing.assert_array_equal(ds[0], ds[0])
    assert not np.array_equal(ds[0], ds[1])


def test_lr_schedule_and_param_ema():
    """Warmup-cosine schedule resolves and steps; param EMA rides in the
    optimizer state and tracks `decay*ema + (1-decay)*params`."""
    import optax

    from open_genie_tpu.train.config import OptimizerConfig
    from open_genie_tpu.train.loop import get_ema_params

    ocfg = OptimizerConfig(
        lr=1e-2, lr_schedule="cosine", warmup_steps=2, decay_steps=10,
        ema_decay=0.5,
    )
    sched = ocfg.schedule()
    assert float(sched(0)) == 0.0          # warmup starts at zero
    assert float(sched(2)) == pytest.approx(1e-2)
    assert float(sched(10)) == pytest.approx(0.0, abs=1e-9)

    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    tx = make_optimizer(lr=sched, ema_decay=0.5, grad_clip=None)
    opt_state = tx.init(params)
    assert jax.tree.all(jax.tree.map(
        np.allclose, get_ema_params(opt_state), params
    ))

    grads = {"w": jnp.full((3,), 0.1), "b": jnp.full((2,), 0.1)}
    p = params
    manual_ema = params
    for _ in range(3):
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        manual_ema = jax.tree.map(
            lambda e, q: 0.5 * e + 0.5 * q, manual_ema, p
        )
    ema = get_ema_params(opt_state)
    np.testing.assert_allclose(ema["w"], manual_ema["w"], rtol=1e-6)
    np.testing.assert_allclose(ema["b"], manual_ema["b"], rtol=1e-6)


def test_ema_composes_with_frozen_mask():
    """EMA sits outside multi_transform: frozen params keep constant EMA."""
    from open_genie_tpu.train.loop import get_ema_params

    params = {"train_me": jnp.ones((2,)), "frozen": jnp.ones((2,))}
    mask = {"train_me": True, "frozen": False}
    tx = make_optimizer(lr=0.1, frozen_mask=mask, ema_decay=0.9, grad_clip=None)
    opt_state = tx.init(params)
    grads = {"train_me": jnp.ones((2,)), "frozen": jnp.ones((2,))}
    import optax

    updates, opt_state = tx.update(grads, opt_state, params)
    new_p = optax.apply_updates(params, updates)
    np.testing.assert_allclose(new_p["frozen"], params["frozen"])
    ema = get_ema_params(opt_state)
    np.testing.assert_allclose(ema["frozen"], params["frozen"])
    assert not np.allclose(ema["train_me"], params["train_me"])


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 over two half-batches produces the same parameter
    update as one full-batch step (pure-MSE objective: grads are linear
    in the batch mean, so the equivalence is exact up to fp)."""
    module = TokenizerTrainModule(
        tokenizer=TOK, gan_loss_weight=0.0, perc_loss_weight=0.0,
        quant_loss_weight=0.0,
    )
    batch = jax.random.uniform(jax.random.PRNGKey(5), (2, T, H, W, 3))

    opt_full = make_optimizer(lr=1e-2, grad_clip=None)
    state_full = create_train_state(module, batch, KEY, opt_full)
    step_full = make_train_step(module, opt_full)
    state_full, _ = step_full(state_full, batch)

    opt_acc = make_optimizer(lr=1e-2, grad_clip=None, accum_steps=2)
    state_acc = create_train_state(module, batch[:1], KEY, opt_acc)
    # Snapshot before stepping: the jitted step donates its input state.
    a0 = flax.traverse_util.flatten_dict(jax.device_get(state_acc.params))
    step_acc = make_train_step(module, opt_acc)
    mid, _ = step_acc(state_acc, batch[:1])

    # Mid-accumulation: gradients staged, parameters untouched.
    am = flax.traverse_util.flatten_dict(jax.device_get(mid.params))
    for k in a0:
        np.testing.assert_array_equal(a0[k], am[k])

    final, _ = step_acc(mid, batch[1:])
    a = flax.traverse_util.flatten_dict(jax.device_get(final.params))
    b = flax.traverse_util.flatten_dict(jax.device_get(state_full.params))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-6, err_msg=str(k))


def test_frozen_param_mask_anchored_segments():
    """Prefixes match whole path-segment sequences only: ('head',) must not
    over-freeze an unrelated 'action_head' (the old substring test did)."""
    params = {
        "head": {"kernel": jnp.zeros(1)},
        "action_head": {"kernel": jnp.zeros(1)},
        "model": {
            "tokenizer_": {"w": jnp.zeros(1)},
            "tokenizer_extra": {"w": jnp.zeros(1)},
        },
    }
    mask = frozen_param_mask(params, ("head",))
    assert mask["head"]["kernel"] is False
    assert mask["action_head"]["kernel"] is True

    mask = frozen_param_mask(params, ("model/tokenizer_",))
    assert mask["model"]["tokenizer_"]["w"] is False
    assert mask["model"]["tokenizer_extra"]["w"] is True
    assert mask["head"]["kernel"] is True

    # nested anchored match still works mid-path
    mask = frozen_param_mask(params, ("tokenizer_",))
    assert mask["model"]["tokenizer_"]["w"] is False
    assert mask["model"]["tokenizer_extra"]["w"] is True


def test_get_ema_params_recurses_into_mappings():
    """EmaState nested inside dict-valued optax states (multi_transform
    inner_states) must still be found."""
    from open_genie_tpu.train.loop import EmaState, get_ema_params

    ema = EmaState(ema={"w": jnp.ones(2)})
    nested = {"inner_states": {"train": (object(), ema), "freeze": ()}}
    out = get_ema_params(nested)
    assert out is not None and float(out["w"][0]) == 1.0
    assert get_ema_params({"inner_states": {"train": ()}}) is None


def test_schedule_rejects_decay_not_past_warmup():
    from open_genie_tpu.train.config import OptimizerConfig

    for kind in ("linear", "cosine"):
        cfg = OptimizerConfig(lr_schedule=kind, warmup_steps=10, decay_steps=10)
        with pytest.raises(ValueError, match="decay_steps"):
            cfg.schedule()
    ok = OptimizerConfig(lr_schedule="linear", warmup_steps=10, decay_steps=20)
    sched = ok.schedule()
    assert float(sched(10)) == pytest.approx(ok.lr)


def test_eval_video_hook_time_compressing_tokenizer(tmp_path, capsys):
    """The sample-video eval hook must produce an mp4 even when the
    tokenizer compresses time (its 1-frame noise prompt is edge-padded by
    `Genie.tokenize_prompt`); the round-4 flagship runs silently lost every
    sample to the zero-token-frames assert. Failures are swallowed by
    design, so assert on the artifact, not just on no-exception."""
    import pytest

    from open_genie_tpu.data.video import HAS_CV2
    from open_genie_tpu.train.trainer import make_eval_video_hook

    if not HAS_CV2:
        pytest.skip("cv2 unavailable")

    tok_tc = dict(
        TOK,
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 16,
                "time_factor": 2, "space_factor": 4,
            }),
            ("causal-conv3d", {"in_channels": 16, "out_channels": 6, "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 6, "out_channels": 16, "kernel_size": 3}),
            ("depth2spacetime_upsample", {
                "in_channels": 16, "out_channels": 3, "kernel_size": 3,
                "time_factor": 2, "space_factor": 4,
            }),
        ),
    )
    module = GenieTrainModule(genie=dict(GENIE, tokenizer=tok_tc))
    sample = jnp.zeros((1, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(
        module, sample, KEY, opt, init_kwargs={"method": module.full_init}
    )

    class _TCfg:
        log_dir = str(tmp_path)

    hook = make_eval_video_hook(module, _TCfg, size=H, num_frames=2)
    hook(state, step=7)
    assert "sample video failed" not in capsys.readouterr().out
    out = os.path.join(str(tmp_path), "sample_step7.mp4")
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_random_vgg_warning_and_snapshot(tmp_path, capsys):
    """perc_loss_weight>0 without pretrained weights must warn loudly and
    be recorded as `perc_weights: random` in the checkpoint config
    snapshot (VERDICT r2 item 4)."""
    import yaml

    from open_genie_tpu.train.config import (
        DataConfig, ExperimentConfig, TokenizerModelConfig, TrainerConfig,
    )
    from open_genie_tpu.train.trainer import (
        perc_weights_status, save_config_snapshot, warn_random_perceptual,
    )

    mcfg = TokenizerModelConfig(perc_loss_weight=1.0, perc_weights_npz=None)
    assert perc_weights_status(mcfg) == "random"
    assert warn_random_perceptual(mcfg)
    err = capsys.readouterr().err
    assert "RANDOMLY INITIALIZED VGG16" in err

    assert not warn_random_perceptual(
        TokenizerModelConfig(perc_loss_weight=0.0)
    )
    assert perc_weights_status(
        TokenizerModelConfig(perc_loss_weight=1.0, perc_weights_npz="/w.npz")
    ) == "/w.npz"

    cfg = ExperimentConfig(model=mcfg, data=DataConfig(),
                           trainer=TrainerConfig())
    save_config_snapshot(str(tmp_path), cfg)
    snap = yaml.safe_load(open(tmp_path / "config.yaml"))
    assert snap["perc_weights"] == "random"


def test_train_action_standalone_and_genie_warm_start(tmp_path):
    """`train action` pre-trains the LatentAction VQ-VAE alone (the
    reference defines the objective, `action.py:151-176`, but ships no
    entry point), and `model.action_ckpt` warm-starts joint Genie
    training from it -- loaded params must equal the checkpointed ones."""
    import numpy as np

    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.trainer import train_action, train_genie
    import yaml

    act_model = {
        "latent_action": {
            "enc_desc": [["space-time_attn",
                          {"n_rep": 1, "n_embd": 16, "n_head": 2,
                           "d_head": 8}]],
            "dec_desc": [["space-time_attn",
                          {"n_rep": 1, "n_embd": 16, "n_head": 2,
                           "d_head": 8, "has_ext": True,
                           "time_attn_kw": {"key_dim": 2}}]],
            "d_codebook": 2,
            "n_embd": 16,
            "inp_shape": [16, 16],
        },
    }
    data = {"source": "synthetic", "num_videos": 4, "num_frames": 4,
            "height": 16, "width": 16, "batch_size": 2}
    act_cfg = {
        "model": act_model,
        "data": data,
        "trainer": {"max_steps": 2, "log_every_n_steps": 1,
                    "val_check_interval": 0, "n_data": 1,
                    "ckpt_dir": str(tmp_path / "act"),
                    "log_dir": str(tmp_path / "act_logs"),
                    "ckpt_every_n_steps": 2},
    }
    p = tmp_path / "act.yaml"
    p.write_text(yaml.safe_dump(act_cfg))
    state = train_action(load_config(str(p), kind="action"))
    act_params = jax.device_get(state.params)["model"]

    genie_cfg = {
        "model": {
            "tokenizer": {
                "enc_desc": [
                    ["spacetime_downsample",
                     {"in_channels": 3, "kernel_size": 3,
                      "out_channels": 8, "time_factor": 1,
                      "space_factor": 4}],
                    ["causal-conv3d", {"in_channels": 8, "out_channels": 4,
                                       "kernel_size": 1}],
                ],
                "dec_desc": [
                    ["causal-conv3d", {"in_channels": 4, "out_channels": 8,
                                       "kernel_size": 3}],
                    ["depth2spacetime_upsample",
                     {"in_channels": 8, "out_channels": 3, "kernel_size": 3,
                      "time_factor": 1, "space_factor": 4}],
                ],
                "d_codebook": 4,
            },
            "latent_action": act_model["latent_action"],
            "action_ckpt": str(tmp_path / "act"),
            "dynamics": {
                "desc": [["space-time_attn",
                          {"n_rep": 1, "n_embd": 16, "n_head": 2,
                           "d_head": 8}]],
                "embed_dim": 16,
            },
        },
        "data": data,
        "trainer": {"max_steps": 1, "log_every_n_steps": 1,
                    "val_check_interval": 0, "n_data": 1,
                    "ckpt_dir": str(tmp_path / "genie"),
                    "log_dir": str(tmp_path / "genie_logs"),
                    "ckpt_every_n_steps": 1},
    }
    p2 = tmp_path / "genie.yaml"
    p2.write_text(yaml.safe_dump(genie_cfg))

    import open_genie_tpu.train.trainer as trainer_mod

    loaded = {}
    orig = trainer_mod._load_subtree_into_genie

    def spy(state, ckpt, subtree):
        out = orig(state, ckpt, subtree)
        loaded["params"] = jax.device_get(out.params)["model"][subtree]
        return out

    trainer_mod._load_subtree_into_genie = spy
    try:
        train_genie(load_config(str(p2), kind="genie"))
    finally:
        trainer_mod._load_subtree_into_genie = orig

    assert "params" in loaded, "action_ckpt warm start never ran"
    flat_a = jax.tree_util.tree_leaves(act_params)
    flat_b = jax.tree_util.tree_leaves(loaded["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_entropy_anneal_schedule_and_step_plumbing(tok_state):
    """The LFQ entropy anneal (round-4 collapse fix): the config-derived
    schedule ramps 1 -> 0, and `make_train_step` evaluates callable
    loss_kwargs on the traced `state.step` -- scale 0 must kill the
    entropy terms (quant_loss == commit-only) with no recompile knob."""
    from open_genie_tpu.train.trainer import _entropy_anneal_kwargs

    class MCfg:
        lfq_entropy_anneal_start = 100
        lfq_entropy_anneal_steps = 50

    kw = _entropy_anneal_kwargs(MCfg())
    sched = kw["entropy_scale"]
    assert float(sched(0)) == 1.0
    assert float(sched(100)) == 1.0
    assert abs(float(sched(125)) - 0.5) < 1e-6
    assert float(sched(150)) == 0.0
    assert float(sched(10_000)) == 0.0

    class NoAnneal:
        lfq_entropy_anneal_start = None

    assert _entropy_anneal_kwargs(NoAnneal()) == {}

    module, opt, state = tok_state
    batch = jax.random.uniform(KEY, (B, T, H, W, 3))

    # Schedule that is 0 from step 0: entropy objective must vanish.
    step_off = make_train_step(
        module, opt, loss_kwargs={"entropy_scale": lambda s: jnp.float32(0.0)}
    )
    _, m_off = step_off(jax.tree.map(jnp.array, state), batch)
    # Constant 1.0 (default): entropy objective present.
    step_on = make_train_step(module, opt)
    _, m_on = step_on(jax.tree.map(jnp.array, state), batch)

    # Aux entropy metrics stay UNSCALED (collapse stays visible in logs).
    assert float(m_off["lfq_avg_entropy"]) > 0.0
    np.testing.assert_allclose(
        float(m_off["lfq_avg_entropy"]), float(m_on["lfq_avg_entropy"]),
        rtol=1e-5,
    )
    # With scale 0 the quant loss is commit-only (>= 0); with scale 1 the
    # diversity reward makes it strictly smaller.
    np.testing.assert_allclose(
        float(m_off["quant_loss"]), 0.25 * float(m_off["lfq_commit_loss"]),
        rtol=1e-4,
    )
    assert float(m_on["quant_loss"]) < float(m_off["quant_loss"])
