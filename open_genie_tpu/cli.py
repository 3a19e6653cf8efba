"""Command-line entry points.

Equivalents of the reference root scripts (`/root/reference/tokenizer.py`,
`/root/reference/genie.py` -- 18-line LightningCLI wrappers) plus a
`generate` command for action-conditioned rollout and a `make-data` command
replacing `sample.py` (procedural synthetic videos instead of procgen).

Usage:
  python -m open_genie_tpu.cli train tokenizer --config configs/tokenize.yaml
  python -m open_genie_tpu.cli train genie     --config configs/genie.yaml
  python -m open_genie_tpu.cli generate --config configs/genie.yaml \
      --ckpt checkpoints --frames 16 --out rollout.mp4
  python -m open_genie_tpu.cli make-data --root data --num-videos 64
"""
from __future__ import annotations

import argparse
import os


def _train(args):
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.trainer import (
        train_action,
        train_dynamics,
        train_genie,
        train_tokenizer,
    )

    cfg = load_config(args.config, kind=args.what)
    if args.max_steps is not None:
        cfg.trainer.max_steps = args.max_steps
    fn = {"tokenizer": train_tokenizer, "genie": train_genie,
          "dynamics": train_dynamics, "action": train_action}[args.what]
    fn(cfg, resume=args.resume)


def _tokenize_data(args):
    """Pre-tokenize a video dataset with a frozen genie checkpoint: cache
    each clip's token grid + latent-action ids as one npz shard (the
    staged-training input for `train dynamics`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.data.tokens import write_token_shard
    from open_genie_tpu.models.genie import Genie
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        restore_params,
    )
    from open_genie_tpu.train.losses import GenieTrainModule
    from open_genie_tpu.train.trainer import build_dataset, genie_model_kwargs

    if not args.ckpt and not args.allow_random_params:
        raise SystemExit(
            "tokenize-data: --ckpt is required (shards written from "
            "randomly initialized models are garbage dynamics training "
            "data); pass --allow-random-params to override for tests"
        )
    cfg = load_config(args.config, kind="genie")
    genie_kwargs = genie_model_kwargs(cfg.model)
    module = GenieTrainModule(genie=genie_kwargs)
    key = jax.random.PRNGKey(cfg.trainer.seed)
    genie = Genie(**genie_kwargs)
    tok_fn = jax.jit(
        lambda p, v: genie.apply(p, v, method=genie.tokenize_with_actions)
    )

    params = None
    for split in args.splits.split(","):
        try:
            dataset = build_dataset(cfg.data, split=split)
        except FileNotFoundError:
            print(f"# split {split!r}: no source data, skipped")
            continue
        if params is None:  # template from the first available split
            sample = jnp.zeros((1,) + tuple(dataset[0].shape), jnp.float32)
            state = create_train_state(
                module, sample, key, make_optimizer(),
                init_kwargs={"method": module.full_init},
            )
            params = state.params
            if args.ckpt:
                params, step = restore_params(args.ckpt, params)
                print(f"# restored checkpoint step {step} from {args.ckpt}")
        n = len(dataset) if args.limit is None else min(args.limit, len(dataset))
        for i in range(n):
            video = jnp.asarray(np.asarray(dataset[i]))[None]
            tokens, acts = jax.device_get(
                tok_fn({"params": params["model"]}, video)
            )
            write_token_shard(
                os.path.join(args.out, split, f"{i:06d}.npz"),
                tokens[0], acts[0],
            )
        print(f"# split {split!r}: wrote {n} shards to {args.out}/{split}")


def _generate(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.data.video import SyntheticVideo, write_mp4
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.losses import GenieTrainModule
    from open_genie_tpu.train.trainer import load_genie_params

    cfg = load_config(args.config, kind="genie")
    key = jax.random.PRNGKey(args.seed)

    sample = jnp.zeros((1, 4, args.size, args.size, 3), jnp.float32)
    genie_kwargs, params, _ = load_genie_params(
        cfg, sample, ckpt=args.ckpt, use_ema=getattr(args, "ema", False),
    )
    module = GenieTrainModule(genie=genie_kwargs)

    prompt = jnp.asarray(
        SyntheticVideo(num_frames=1, height=args.size, width=args.size)[0]
    )[None]
    if getattr(args, "actions", None):
        ids = [int(a) for a in args.actions.split(",")]
        actions = jnp.asarray(ids, jnp.int32)[None]
    elif getattr(args, "actions_from_data", False):
        # Replay a real clip: prompt from its leading frames, actions from
        # the latent-action encoder's ids on it. Arbitrary ids index
        # embeddings the dynamics never trained against (LFQ action books
        # concentrate on a few dozen codes), so random ids produce an
        # uncontrolled rollout; emitted ids are the in-distribution drive.
        from open_genie_tpu.models.genie import Genie
        from open_genie_tpu.models.tokenizer import VideoTokenizer
        from open_genie_tpu.train.trainer import build_dataset

        dataset = build_dataset(cfg.data, split="val")
        clip = jnp.asarray(np.asarray(dataset[0]))[None]
        t_down = VideoTokenizer(
            parent=None, **genie_kwargs["tokenizer"]
        ).temporal_downsampling
        prompt = clip[:, :t_down]
        emitted = module.apply(
            {"params": params}, clip,
            method=lambda m, v: m.model.latent_action_(v, training=False)[0],
        )
        t_tok = max(1, clip.shape[1] // t_down)
        aligned = np.asarray(Genie.align_actions(emitted, t_tok))[0]
        need = 1 + args.frames  # 1 prompt token frame + generated frames
        reps = int(np.ceil(need / max(len(aligned), 1)))
        actions = jnp.asarray(np.tile(aligned, reps)[:need], jnp.int32)[None]
        print(f"# replaying {len(aligned)} emitted action ids "
              f"(pool {sorted(set(aligned.tolist()))})")
    else:
        actions = jax.random.randint(key, (1, args.frames + 1), 0, 2)
    video = module.apply(
        {"params": params},
        prompt, actions, key,
        num_frames=args.frames,
        steps_per_frame=args.steps_per_frame,
        top_k=args.top_k,
        method=module.generate,
    )
    video = np.asarray(jnp.clip(video[0], 0, 1))
    write_mp4(args.out, video)
    print(f"wrote {video.shape[0]} frames to {args.out}")


def _play(args):
    """Interactive world-model session: action in, frame out.

    `--actions 0,1,0,2` scripts the session (good for piping/testing);
    without it, actions are read from stdin one per line (blank = 0,
    'q' quits). Frames accumulate into `--out` as an mp4 on exit.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_genie_tpu.data.video import SyntheticVideo, write_mp4
    from open_genie_tpu.models.genie import Genie
    from open_genie_tpu.serve import InteractiveSession
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.trainer import load_genie_params

    cfg = load_config(args.config, kind="genie")
    sample = jnp.zeros((1, 4, args.size, args.size, 3), jnp.float32)
    genie_kwargs, params, _ = load_genie_params(
        cfg, sample, ckpt=args.ckpt, use_ema=getattr(args, "ema", False),
    )

    genie = Genie(**genie_kwargs)
    sess = InteractiveSession(
        genie, {"params": params["model"]},
        max_frames=args.max_frames,
        steps_per_frame=args.steps_per_frame,
        pixel_window=args.pixel_window,
        top_k=args.top_k,
        stream=(False if args.no_stream else None),
    )
    print(f"pixel decode: {'streaming (exact, O(1)/frame)' if sess.stream else f'sliding window ({args.pixel_window} frames)'}")
    prompt = jnp.asarray(
        SyntheticVideo(num_frames=1, height=args.size, width=args.size)[0]
    )[None]
    frames = [np.asarray(f) for f in sess.reset(np.asarray(prompt), seed=args.seed)[0]]
    print(
        f"session ready (unbounded; {args.max_frames}-frame cache window); "
        "prompt decoded"
    )

    # Sessions are unbounded (the session rebases its cache window when
    # the horizon fills), so the scripted/interactive loops have no cap.
    if args.actions:
        script = [int(a) for a in args.actions.split(",")]
        for i, a in enumerate(script):
            frame = sess.step(a)
            frames.append(np.asarray(frame[0]))
            print(f"[frame {i + 1}] action={a} -> {frame.shape[1:]}")
    else:  # pragma: no cover - interactive
        import itertools
        import sys

        print("enter action id per line (blank=0, q=quit):")
        for i in itertools.count():
            line = sys.stdin.readline()
            if not line or line.strip().lower() == "q":
                break
            a = int(line.strip() or 0)
            frame = sess.step(a)
            frames.append(np.asarray(frame[0]))
            print(f"[frame {i + 1}] action={a}")

    video = np.clip(np.stack(frames), 0, 1)
    write_mp4(args.out, video)
    print(f"wrote {video.shape[0]} frames to {args.out}")


def _eval(args):
    """Score a checkpoint: tokenizer PSNR/SSIM/codebook health, or genie
    validation metrics (joint loss, masked accuracy, action-code usage)."""
    if args.what == "genie":
        _eval_genie(args)
        return
    if args.what == "dynamics":
        _eval_dynamics(args)
        return

    import json

    import jax
    import jax.numpy as jnp

    from open_genie_tpu.eval import evaluate_tokenizer
    from open_genie_tpu.models.tokenizer import VideoTokenizer
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        restore_params,
    )
    from open_genie_tpu.train.trainer import (
        _sample_batch_shape,
        build_dataset,
        build_loader,
        build_tokenizer_module,
    )
    from open_genie_tpu.parallel.mesh import make_mesh

    cfg = load_config(args.config, kind="tokenizer")
    mcfg = cfg.model
    # Template through the TRAIN module so the param tree matches training
    # checkpoints exactly; eval then uses only the `model` subtree.
    module = build_tokenizer_module(mcfg)

    dataset = build_dataset(cfg.data, split=args.split)
    mesh = make_mesh(n_data=1, n_model=1)
    loader = build_loader(cfg, dataset, mesh, cfg.trainer, split=args.split)

    key = jax.random.PRNGKey(cfg.trainer.seed)
    sample = jnp.zeros(_sample_batch_shape(dataset, cfg), jnp.float32)

    assert not (args.ema and not args.ckpt), (
        "--ema requires --ckpt (there is no EMA without a checkpoint)"
    )
    if args.ckpt and args.ema:
        from open_genie_tpu.train.trainer import _opt_kwargs, restore_ema_params

        frozen = ("perc_crit",) if mcfg.perc_loss_weight > 0 else ()
        params, step = restore_ema_params(
            module, sample, key, _opt_kwargs(mcfg.optimizer), frozen,
            args.ckpt,
        )
        print(f"# restored EMA params at step {step} from {args.ckpt}")
    else:
        state = create_train_state(module, sample, key, make_optimizer())
        params = state.params
        if args.ckpt:
            params, step = restore_params(args.ckpt, params)
            print(f"# restored checkpoint step {step} from {args.ckpt}")

    tokenizer = VideoTokenizer(**mcfg.tokenizer_kwargs())
    report = evaluate_tokenizer(
        tokenizer, {"params": params["model"]}, loader,
        max_batches=args.max_batches,
    )
    print(json.dumps({k: round(float(v), 5) for k, v in report.items()}))


def _eval_genie(args):
    import json

    import jax
    import jax.numpy as jnp

    from open_genie_tpu.eval import evaluate_genie
    from open_genie_tpu.models.genie import Genie
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.trainer import (
        _sample_batch_shape,
        build_dataset,
        build_loader,
        load_genie_params,
    )
    from open_genie_tpu.parallel.mesh import make_mesh

    cfg = load_config(args.config, kind="genie")
    dataset = build_dataset(cfg.data, split=args.split)
    mesh = make_mesh(n_data=1, n_model=1)
    loader = build_loader(cfg, dataset, mesh, cfg.trainer, split=args.split)

    key = jax.random.PRNGKey(cfg.trainer.seed)
    sample = jnp.zeros(_sample_batch_shape(dataset, cfg), jnp.float32)
    use_ema = getattr(args, "ema", False)
    genie_kwargs, params, step = load_genie_params(
        cfg, sample, ckpt=args.ckpt, use_ema=use_ema,
    )
    if args.ckpt:
        kind = "EMA params" if use_ema else "checkpoint"
        print(f"# restored {kind} step {step} from {args.ckpt}")

    genie = Genie(**genie_kwargs)
    report = evaluate_genie(
        genie, params["model"], loader, key, max_batches=args.max_batches
    )
    if args.controllability_frames:
        import numpy as np

        from open_genie_tpu.eval import action_controllability

        # Sample test actions from the ids the latent-action encoder
        # actually emits on real data: ids outside the trained set index
        # embeddings the dynamics never saw, and uniform-over-vocab
        # sampling reads ~1.0 even for a controllable model.
        batch = jnp.asarray(next(iter(loader)))
        emitted = genie.apply(
            {"params": params["model"]}, batch,
            method=lambda m, v: m.latent_action_(v, training=False)[0],
        )
        pool = np.unique(np.asarray(emitted))
        prompt = batch[:1, :1]
        report.update(action_controllability(
            genie, {"params": params["model"]}, prompt,
            jax.random.fold_in(key, 7),
            num_frames=args.controllability_frames,
            action_pool=pool,
        ))
    print(json.dumps({k: round(float(v), 5) for k, v in report.items()}))


def _eval_dynamics(args):
    """Score a dynamics-only checkpoint on token shards (masked CE/acc)."""
    import json

    import jax
    import numpy as np

    from open_genie_tpu.eval import evaluate_dynamics
    from open_genie_tpu.models.dynamics import DynamicsModel
    from open_genie_tpu.train.config import load_config
    from open_genie_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        restore_params,
    )
    from open_genie_tpu.train.losses import DynamicsTrainModule
    from open_genie_tpu.train.trainer import (
        _opt_kwargs,
        build_dataset,
        build_loader,
        restore_ema_params,
    )
    from open_genie_tpu.parallel.mesh import make_mesh

    cfg = load_config(args.config, kind="dynamics")
    assert cfg.data.source == "tokens", (
        "eval dynamics consumes token shards; set data.source: tokens"
    )
    module = DynamicsTrainModule(dynamics=cfg.model.dynamics_kwargs())
    dataset = build_dataset(cfg.data, split=args.split)
    mesh = make_mesh(n_data=1, n_model=1)
    loader = build_loader(cfg, dataset, mesh, cfg.trainer, split=args.split)

    key = jax.random.PRNGKey(cfg.trainer.seed)
    item = dataset[0]
    sample = {k: np.zeros((cfg.data.batch_size,) + v.shape, v.dtype)
              for k, v in item.items()}

    assert not (args.ema and not args.ckpt), (
        "--ema requires --ckpt (there is no EMA without a checkpoint)"
    )
    if args.ckpt and args.ema:
        params, step = restore_ema_params(
            module, sample, key, _opt_kwargs(cfg.model.optimizer), (),
            args.ckpt,
        )
        print(f"# restored EMA params at step {step} from {args.ckpt}")
    else:
        state = create_train_state(module, sample, key, make_optimizer())
        params = state.params
        if args.ckpt:
            params, step = restore_params(args.ckpt, params)
            print(f"# restored checkpoint step {step} from {args.ckpt}")

    dynamics = DynamicsModel(**cfg.model.dynamics_kwargs())
    report = evaluate_dynamics(
        dynamics, params["model"], loader, key, max_batches=args.max_batches
    )
    print(json.dumps({k: round(float(v), 5) for k, v in report.items()}))


def _make_data(args):
    import numpy as np

    from open_genie_tpu.data.video import SyntheticVideo, write_mp4

    if args.source == "gym":
        # Reference `sample.py` path: gym envs under a random policy.
        # Gated: neither gym nor gymnasium is bundled in every environment.
        try:
            import gym  # noqa: F401
        except ImportError:
            try:
                import gymnasium  # noqa: F401
            except ImportError as e:
                raise SystemExit(
                    "--source gym requires the gym (or gymnasium) package "
                    f"(unavailable: {e}); use --source synthetic instead"
                )
        _make_data_gym(args)
        return

    for split, count in (("train", args.num_videos),
                         ("val", max(1, args.num_videos // 8))):
        out_dir = os.path.join(args.root, args.env_name, split)
        os.makedirs(out_dir, exist_ok=True)
        ds = SyntheticVideo(
            num_videos=count, num_frames=args.timeout,
            height=args.size, width=args.size,
            seed=0 if split == "train" else 1,
            motion_scale=getattr(args, "motion_scale", 1.0),
        )
        for i in range(count):
            write_mp4(os.path.join(out_dir, f"{i:04d}.mp4"), ds[i])
        print(f"wrote {count} videos to {out_dir}")


def _make_data_gym(args):
    """Gym-environment rollouts under a random policy -> mp4.

    Env resolution:
      * a bare name without a `-vN` suffix (`Coinrun`, ...) takes the
        reference `sample.py:27-53` procgen path verbatim: hard mode, one
        level per seed, the observation IS the frame;
      * a registered env id (`CartPole-v1`, ...) runs under gym OR
        gymnasium with `rgb_array` rendering -- the same random-policy
        rollout against any real environment available in the install
        (procgen itself predates gymnasium and is rarely installable).
    Both the legacy gym 4-tuple and the gymnasium 5-tuple step APIs are
    handled; frames are resized to `--size`.
    """
    try:
        import gym
    except ImportError:
        import gymnasium as gym
    import numpy as np

    from open_genie_tpu.data.video import HAS_CV2, write_mp4

    is_procgen = "-v" not in args.env_name

    def _resize(frame):
        if frame.shape[0] == args.size and frame.shape[1] == args.size:
            return frame
        assert HAS_CV2, "resizing gym frames requires OpenCV"
        import cv2

        return cv2.resize(
            frame, (args.size, args.size), interpolation=cv2.INTER_AREA
        )

    for seed in range(args.num_videos):
        if is_procgen:
            env = gym.make(
                f"procgen:procgen-{args.env_name.lower()}-v0",
                distribution_mode="hard",
                render_mode="rgb_array",
                start_level=seed,
                num_levels=1,
                use_sequential_levels=True,
            )
            out = env.reset()
            frames = [out[0] if isinstance(out, tuple) else out]
            for _ in range(args.timeout - 1):
                frames.append(env.step(env.action_space.sample())[0])
        else:
            env = gym.make(args.env_name, render_mode="rgb_array")
            env.reset(seed=seed)
            frames = [env.render()]
            for _ in range(args.timeout - 1):
                step_out = env.step(env.action_space.sample())
                done = (
                    step_out[2]
                    if len(step_out) == 4
                    else bool(step_out[2]) or bool(step_out[3])
                )
                frames.append(env.render())
                if done:
                    env.reset(seed=seed * 100003 + len(frames))
        env.close()
        out_dir = os.path.join(args.root, args.env_name, "train")
        os.makedirs(out_dir, exist_ok=True)
        video = np.stack([_resize(np.asarray(f)) for f in frames])
        write_mp4(os.path.join(out_dir, f"{seed:04d}.mp4"),
                  video.astype(np.float32) / 255.0)
    print(f"wrote {args.num_videos} gym rollouts to {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="open-genie-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train a model from a YAML config")
    pt.add_argument("what", choices=["tokenizer", "genie", "dynamics", "action"])
    pt.add_argument("--config", required=True)
    pt.add_argument("--resume", action="store_true")
    pt.add_argument("--max-steps", type=int, default=None)
    pt.set_defaults(fn=_train)

    pg = sub.add_parser("generate", help="action-conditioned video rollout")
    pg.add_argument("--config", required=True)
    pg.add_argument("--ckpt", default=None)
    pg.add_argument("--frames", type=int, default=16)
    pg.add_argument("--steps-per-frame", type=int, default=25)
    pg.add_argument("--top-k", dest="top_k", type=int, default=None,
                    help="restrict sampling to the top-k logits (1 = greedy)")
    pg.add_argument("--ema", action="store_true",
                    help="use the checkpoint's EMA params")
    pg.add_argument("--size", type=int, default=64)
    pg.add_argument("--seed", type=int, default=0)
    pg.add_argument("--actions", default=None,
                    help="comma-separated action ids driving the rollout")
    pg.add_argument("--actions-from-data", action="store_true",
                    help="prompt with a real val clip and replay the "
                    "latent-action encoder's emitted ids (in-distribution "
                    "drive; random ids index untrained embeddings)")
    pg.add_argument("--out", default="rollout.mp4")
    pg.set_defaults(fn=_generate)

    pp = sub.add_parser(
        "play", help="interactive world-model session (action in, frame out)"
    )
    pp.add_argument("--config", required=True)
    pp.add_argument("--ckpt", default=None)
    pp.add_argument("--actions", default=None,
                    help="comma-separated action ids (else read from stdin)")
    pp.add_argument("--size", type=int, default=64)
    pp.add_argument("--max-frames", dest="max_frames", type=int, default=32)
    pp.add_argument("--steps-per-frame", dest="steps_per_frame", type=int, default=8)
    pp.add_argument("--pixel-window", dest="pixel_window", type=int, default=4)
    pp.add_argument(
        "--no-stream", dest="no_stream", action="store_true",
        help="force sliding-window pixel decode even for streamable decoders",
    )
    pp.add_argument("--top-k", dest="top_k", type=int, default=None,
                    help="restrict sampling to the top-k logits (1 = greedy)")
    pp.add_argument("--ema", action="store_true",
                    help="use the checkpoint's EMA params")
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--out", default="session.mp4")
    pp.set_defaults(fn=_play)

    pe = sub.add_parser(
        "eval", help="score a checkpoint (tokenizer PSNR/SSIM/codebook, "
        "genie val loss/accuracy)"
    )
    pe.add_argument("what", choices=["tokenizer", "genie", "dynamics"],
                    nargs="?", default="tokenizer")
    pe.add_argument("--config", required=True)
    pe.add_argument("--ckpt", default=None)
    pe.add_argument("--split", default="val")
    pe.add_argument("--max-batches", dest="max_batches", type=int, default=16)
    pe.add_argument("--ema", action="store_true",
                    help="score the EMA params (requires a checkpoint "
                    "trained with optimizer.ema_decay)")
    pe.add_argument("--controllability-frames", dest="controllability_frames",
                    type=int, default=0,
                    help="genie only: also measure action controllability "
                    "(rollout divergence across action branches vs the "
                    "sampling-noise floor) over this many frames (0 = off)")
    pe.set_defaults(fn=_eval)

    pk = sub.add_parser(
        "tokenize-data",
        help="cache token/action shards from a frozen genie (staged training)",
    )
    pk.add_argument("--config", required=True)
    pk.add_argument("--ckpt", default=None)
    pk.add_argument(
        "--allow-random-params", action="store_true",
        help="permit writing shards WITHOUT --ckpt (randomly initialized "
        "tokenizer/action models -- garbage shards; tests/debug only)",
    )
    pk.add_argument("--out", required=True)
    pk.add_argument("--splits", default="train,val")
    pk.add_argument("--limit", type=int, default=None)
    pk.set_defaults(fn=_tokenize_data)

    pd = sub.add_parser("make-data", help="generate an mp4 dataset")
    pd.add_argument("--root", required=True)
    pd.add_argument("--source", choices=["synthetic", "gym"], default="synthetic")
    pd.add_argument("--env-name", default="Coinrun")
    pd.add_argument("--num-videos", type=int, default=16)
    pd.add_argument("--timeout", type=int, default=100)
    pd.add_argument("--size", type=int, default=64)
    pd.add_argument("--motion-scale", type=float, default=1.0,
                    help="per-frame displacement multiplier for the "
                    "synthetic source (~0.4 matches real 15-30 fps "
                    "gameplay at 64 px; 1.0 = historical fixtures)")
    pd.set_defaults(fn=_make_data)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
