"""CPU <-> TPU numeric parity artifact over the 5 BASELINE.md configs.

BASELINE.md's parity row: "CPU parity (fp tolerance) on all 5 driver
configs: tokenize->decode (16x64x64, MAGVIT2, d=18), LatentAction VQ-VAE,
Dynamics masked-train + iterative decode, full rollout, tokenizer
full-loss train step".

Design (same driver-robust shape as bench.py): the parent never imports
jax. Per config it runs two bounded subprocesses -- a CPU child in a
scrubbed environment (the machine's sitecustomize would otherwise send
"CPU" work over the TPU tunnel) and a TPU child -- sharing params/inputs
through files so both platforms execute the identical function on
identical bits (threefry PRNG is platform-invariant). The parent compares
the dumped outputs and writes `PARITY_r02.json`.

Both children force `jax_default_matmul_precision=highest` -- parity is a
correctness artifact; bf16-matmul speed is bench.py's business.

Run: `python tools/parity_check.py [--out PARITY_r02.json]`
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Integer outputs must match exactly; float outputs within these bounds
# (deep conv/attention stacks at f32-highest across two XLA backends).
ATOL = 2e-3
RTOL = 2e-2

TOK_CFG = dict(d_codebook=18)  # MAGVIT2 blueprints resolved in-child

GENIE_CFG = dict(  # compact rollout config (mirrors __graft_entry__)
    tokenizer=dict(
        enc_desc=(
            ("spacetime_downsample", {
                "in_channels": 3, "kernel_size": 3, "out_channels": 32,
                "time_factor": 1, "space_factor": 4,
            }),
            ("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 16}),
            ("causal-conv3d", {"in_channels": 32, "out_channels": 8, "kernel_size": 1}),
        ),
        dec_desc=(
            ("causal-conv3d", {"in_channels": 8, "out_channels": 32, "kernel_size": 3}),
            ("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 16}),
            ("depth2spacetime_upsample", {
                "in_channels": 32, "out_channels": 3, "kernel_size": 3,
                "time_factor": 1, "space_factor": 4,
            }),
        ),
        d_codebook=8,
    ),
    latent_action=dict(
        enc_desc=(
            ("space-time_attn", {"n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 16}),
        ),
        dec_desc=(
            ("space-time_attn", {
                "n_rep": 1, "n_embd": 32, "n_head": 2, "d_head": 16,
                "has_ext": True, "time_attn_kw": {"key_dim": 4},
            }),
        ),
        d_codebook=4,
        n_embd=32,
        inp_shape=(32, 32),
    ),
    dynamics=dict(
        desc=(("space-time_attn", {"n_rep": 2, "n_embd": 64, "n_head": 4, "d_head": 16}),),
        embed_dim=64,
    ),
)


# ------------------------------------------------------------------ #
# Config implementations (run inside children)
# ------------------------------------------------------------------ #

def _setup_child():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    return jax


def run_tokenize_decode(params_path, out):
    """MAGVIT2 d=18 tokenize -> decode @ (1, 16, 64, 64, 3)."""
    jax = _setup_child()
    import jax.numpy as jnp

    from open_genie_tpu.models.blueprints import MAGVIT2_DEC_DESC, MAGVIT2_ENC_DESC
    from open_genie_tpu.models.tokenizer import VideoTokenizer

    tok = VideoTokenizer(
        enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_DEC_DESC, d_codebook=18
    )
    video = jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 64, 64, 3))
    params = _load_or_init(
        params_path,
        lambda: jax.jit(lambda k: tok.init(k, video, train=False))(
            jax.random.PRNGKey(0)
        ),
    )

    @jax.jit
    def f(params, video):
        quant, idxs = tok.apply(params, video, method=tok.tokenize)
        rec = tok.apply(params, idxs, method=tok.decode_tokens)
        return quant, idxs, rec

    quant, idxs, rec = f(params, video)
    out["quant"] = quant
    out["idxs"] = idxs
    out["rec"] = rec


def run_latent_action(params_path, out):
    """LatentAction VQ-VAE full pass @ (1, 4, 32, 32, 3)."""
    jax = _setup_child()

    from open_genie_tpu.models.action import LatentAction

    act = LatentAction(**GENIE_CFG["latent_action"])
    video = jax.random.uniform(jax.random.PRNGKey(3), (1, 4, 32, 32, 3))
    params = _load_or_init(
        params_path,
        lambda: jax.jit(
            lambda k: act.init(k, video, training=False)
        )(jax.random.PRNGKey(1)),
    )

    @jax.jit
    def f(params, video):
        idxs, loss, aux = act.apply(params, video, training=False)
        return idxs, loss, aux["rec_loss"]

    idxs, loss, rec_loss = f(params, video)
    out["idxs"] = idxs
    out["loss"] = loss
    out["rec_loss"] = rec_loss


def run_dynamics(params_path, out):
    """MaskGIT masked-train loss + iterative decode @ (1, 4, 16, 16)."""
    jax = _setup_child()
    import jax.numpy as jnp

    from open_genie_tpu.models.dynamics import DynamicsModel

    dyn = DynamicsModel(
        **GENIE_CFG["dynamics"], tok_vocab=2 ** 8, act_vocab=2 ** 4
    )
    key = jax.random.PRNGKey(11)
    k_tok, k_act, k_loss, k_gen = jax.random.split(key, 4)
    tokens = jax.random.randint(k_tok, (1, 4, 16, 16), 0, 2 ** 8)
    act_id = jax.random.randint(k_act, (1, 4), 0, 2 ** 4)
    params = _load_or_init(
        params_path,
        lambda: jax.jit(
            lambda k: dyn.init(k, tokens, act_id, train=False)
        )(jax.random.PRNGKey(2)),
    )

    @jax.jit
    def f(params, tokens, act_id):
        loss, metrics = dyn.apply(
            params, tokens, act_id, k_loss, train=False,
            method=dyn.compute_loss,
        )
        gen = dyn.apply(
            params, tokens, act_id, k_gen, method=dyn.generate,
            steps=4, temp=1e-6,
        )
        return loss, metrics["masked_acc"], gen

    loss, acc, gen = f(params, tokens, act_id)
    out["loss"] = loss
    out["masked_acc"] = acc
    out["generated_tokens"] = gen


def run_rollout(params_path, out):
    """Full Genie action-conditioned rollout @ 16x16, near-greedy."""
    jax = _setup_child()
    import jax.numpy as jnp

    from open_genie_tpu.models.genie import Genie

    model = Genie(**GENIE_CFG)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    params = _load_or_init(
        params_path,
        lambda: jax.jit(
            lambda k: model.init(k, video, k, method=model.init_full)
        )(key),
    )
    prompt = jax.random.uniform(jax.random.PRNGKey(5), (1, 1, 16, 16, 3))
    actions = jax.random.randint(jax.random.PRNGKey(6), (1, 3), 0, 2 ** 4)

    @jax.jit
    def f(params, prompt, actions):
        return model.apply(
            params, prompt, actions, jax.random.PRNGKey(9),
            num_frames=2, steps_per_frame=4, temp=1e-6,
        )

    out["video"] = f(params, prompt, actions)


def run_tokenizer_train(params_path, out):
    """One full-loss tokenizer train step (rec+GAN+perc+LFQ) @ 16x16."""
    jax = _setup_child()
    import jax.numpy as jnp

    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )
    from open_genie_tpu.train.losses import TokenizerTrainModule

    module = TokenizerTrainModule(
        tokenizer=dict(
            enc_desc=(
                ("spacetime_downsample", {
                    "in_channels": 3, "kernel_size": 3, "out_channels": 16,
                    "time_factor": 1, "space_factor": 4,
                }),
                ("causal-conv3d", {"in_channels": 16, "out_channels": 8, "kernel_size": 1}),
            ),
            dec_desc=(
                ("causal-conv3d", {"in_channels": 8, "out_channels": 16, "kernel_size": 3}),
                ("depth2spacetime_upsample", {
                    "in_channels": 16, "out_channels": 3, "kernel_size": 3,
                    "time_factor": 1, "space_factor": 4,
                }),
            ),
            d_codebook=8,
        ),
        disc_kwargs=dict(
            inp_size=(16, 16), model_dim=8, dim_mults=(1, 2), down_step=(None, 2),
        ),
        perc_feat_layers=("features.6",),
        gan_frames_per_batch=2,
    )
    key = jax.random.PRNGKey(0)
    sample = jax.random.uniform(jax.random.PRNGKey(8), (2, 4, 16, 16, 3))
    optimizer = make_optimizer(lr=1e-3)
    state = create_train_state(module, sample, key, optimizer)
    if os.path.exists(params_path):
        state = state.replace(params=_load_params(params_path, state.params))
    else:
        _save_params(params_path, state.params)

    step = make_train_step(module, optimizer, compute_dtype=None)
    state2, metrics = step(state, sample)
    out["loss"] = metrics["loss"]
    out["rec_loss"] = metrics["rec_loss"]
    out["grad_norm"] = metrics["grad_norm"]
    # One representative updated tensor: the decoder head conv kernel.
    import flax

    flat = flax.traverse_util.flatten_dict(state2.params)
    k = sorted(flat)[0]
    out["updated_param0"] = flat[k]


CONFIGS = {
    "tokenize_decode": run_tokenize_decode,
    "latent_action": run_latent_action,
    "dynamics": run_dynamics,
    "rollout": run_rollout,
    "tokenizer_train": run_tokenizer_train,
}


# ------------------------------------------------------------------ #
# Param/output serialization
# ------------------------------------------------------------------ #

def _save_params(path, params):
    import flax

    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def _load_params(path, template):
    import flax

    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def _load_or_init(params_path, init_fn):
    """CPU child initializes + saves; TPU child loads the same bytes."""
    params = init_fn()
    if os.path.exists(params_path):
        return _load_params(params_path, params)
    import jax

    params = jax.device_get(params)
    _save_params(params_path, params)
    return params


def child_main(config: str, role: str, work_dir: str):
    import numpy as np

    out: dict = {}
    CONFIGS[config](os.path.join(work_dir, f"{config}.params"), out)
    arrays = {k: np.asarray(v) for k, v in out.items()}
    np.savez(os.path.join(work_dir, f"{config}.{role}.npz"), **arrays)
    print(f"RESULT {config}/{role}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in arrays.items()
    ))


# ------------------------------------------------------------------ #
# Parent orchestration
# ------------------------------------------------------------------ #

def _scrubbed_cpu_env() -> dict:
    from open_genie_tpu.utils.hostenv import scrubbed_cpu_env

    return scrubbed_cpu_env(repo_root=REPO)


def _run_child(config, role, work_dir, timeout):
    env = _scrubbed_cpu_env() if role == "cpu" else dict(os.environ)
    if role == "tpu":
        # Reuse bench.py's persistent executable cache: the remote compile
        # service dominates TPU-child wall time on repeat runs.
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_tpu_cache")
        )
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", config, "--role", role, "--dir", work_dir],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"# {config}/{role} TIMEOUT after {timeout:.0f}s")
        return False
    dt = time.monotonic() - t0
    ok = proc.returncode == 0 and "RESULT" in (proc.stdout or "")
    tag = "ok" if ok else f"FAILED rc={proc.returncode}"
    print(f"# {config}/{role} {tag} in {dt:.0f}s")
    if not ok:
        for line in ((proc.stderr or "").strip().splitlines())[-4:]:
            print(f"#   {line[:240]}")
    return ok


def _compare(config, work_dir):
    import numpy as np

    cpu = np.load(os.path.join(work_dir, f"{config}.cpu.npz"))
    tpu = np.load(os.path.join(work_dir, f"{config}.tpu.npz"))
    report = {}
    ok = True
    for k in cpu.files:
        a, b = cpu[k], tpu[k]
        if np.issubdtype(a.dtype, np.integer) or a.dtype == bool:
            mismatch = float(np.mean(a != b))
            # Sampled/quantized integer outputs: tiny fp differences can
            # flip a hard threshold; demand near-exact agreement.
            entry_ok = mismatch <= 0.01
            report[k] = {"kind": "int", "mismatch_frac": round(mismatch, 6),
                         "ok": entry_ok}
        else:
            diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
            scale = np.maximum(np.abs(a.astype(np.float64)), 1.0)
            entry_ok = bool(np.all(diff <= ATOL + RTOL * scale))
            report[k] = {
                "kind": "float",
                "max_abs_diff": float(diff.max()),
                "mean_abs_diff": float(diff.mean()),
                "ok": entry_ok,
            }
        ok &= entry_ok
    return ok, report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None, choices=list(CONFIGS))
    ap.add_argument("--role", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--dir", default="/tmp/ogt_parity")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_r02.json"))
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument(
        "--merge", action="store_true",
        help="seed results from an existing --out artifact, so a rerun of "
        "the subset that timed out (cold compiles on a slow tunnel) keeps "
        "the configs that already passed this round",
    )
    args = ap.parse_args()

    if args.child:
        child_main(args.child, args.role, args.dir)
        return

    os.makedirs(args.dir, exist_ok=True)
    results = {}
    if args.merge and os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = dict(json.load(f).get("configs", {}))
            print(f"# merged {len(results)} prior config results from {args.out}")
        except (OSError, json.JSONDecodeError):
            results = {}
    for config in args.configs.split(","):
        if not _run_child(config, "cpu", args.dir, args.timeout):
            results[config] = {"ok": False, "error": "cpu child failed"}
            continue
        if not _run_child(config, "tpu", args.dir, args.timeout):
            results[config] = {"ok": False, "error": "tpu child failed"}
            continue
        ok, report = _compare(config, args.dir)
        results[config] = {"ok": ok, "tensors": report}
        print(f"# {config}: parity {'OK' if ok else 'MISMATCH'}")

    all_ok = bool(results) and all(
        r.get("ok") for r in results.values()
    ) and set(results) >= set(CONFIGS)
    blob = {
        "artifact": "CPU<->TPU parity, BASELINE.md 5-config row",
        "atol": ATOL, "rtol": RTOL,
        "matmul_precision": "highest",
        "ok": all_ok,
        "configs": results,
    }
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps({"parity_ok": all_ok, "out": args.out}))


if __name__ == "__main__":
    main()
