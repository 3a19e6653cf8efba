"""Rollout latency breakdown on the real chip.

Measures, for the bench flagship config: full rollout (tokens + pixels) at
several steps-per-frame, token-only rollout, bare cached decode_frame
steps, prefill, and pixel decode -- so optimization targets the part that
actually dominates. Hard host sync everywhere (tunnel-safe).

Usage: python tools/profile_rollout.py [--frames 16] [--repeats 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_tpu_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _sync(x) -> float:
    import numpy as np

    return float(np.asarray(x).sum())


def best_of(fn, repeats):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _bf16_params, _genie_cfg
    from open_genie_tpu.models.genie import Genie

    model = Genie(**_genie_cfg())
    key = jax.random.PRNGKey(0)
    prompt = jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16)
    video = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)["params"]
    params = _bf16_params(params)
    nf = args.frames

    actions = jnp.zeros((1, nf + 1), jnp.int32)

    # -- full rollout at several spf ---------------------------------
    for spf in (1, 8, 25):
        @jax.jit
        def roll(params, prompt, actions, key, _spf=spf):
            return model.apply({"params": params}, prompt, actions, key,
                               num_frames=nf, steps_per_frame=_spf)

        _sync(roll(params, prompt, actions, key))
        dt = best_of(lambda: _sync(roll(params, prompt, actions, key)),
                     args.repeats)
        print(f"full rollout spf={spf:3d}: {dt * 1e3:8.1f} ms"
              f"  {nf / dt:7.1f} fps")

    # -- token-only rollout ------------------------------------------
    tokens = model.apply({"params": params}, prompt,
                         method=model.tokenize_prompt)

    @jax.jit
    def tok_roll(params, tokens, actions, key):
        return model.apply({"params": params}, tokens, actions, key,
                           num_frames=nf, steps_per_frame=25,
                           method=model.rollout_tokens)

    _sync(tok_roll(params, tokens, actions, key))
    dt = best_of(lambda: _sync(tok_roll(params, tokens, actions, key)),
                 args.repeats)
    print(f"token-only rollout spf=25: {dt * 1e3:8.1f} ms  {nf / dt:7.1f} fps")

    # -- pixel decode of the full buffer -----------------------------
    buf = tok_roll(params, tokens, actions, key)

    @jax.jit
    def dec(params, buf):
        return model.apply({"params": params}, buf,
                           method=model.decode_window)

    _sync(dec(params, buf))
    dt = best_of(lambda: _sync(dec(params, buf)), args.repeats)
    print(f"pixel decode {int(buf.shape[1])} frames: {dt * 1e3:8.1f} ms")

    # -- bare cached decode_frame steps ------------------------------
    from open_genie_tpu.models.dynamics import DynamicsModel

    dyn_params = params["dynamics_"]
    dyn = DynamicsModel(
        **{**_genie_cfg()["dynamics"],
           "tok_vocab": 2 ** _genie_cfg()["tokenizer"]["d_codebook"],
           "act_vocab": 2 ** _genie_cfg()["latent_action"]["d_codebook"]})
    frame = jnp.zeros((1, 16, 16), jnp.int32)
    act = jnp.zeros((1,), jnp.int32)

    for n in (25, 50):
        @jax.jit
        def steps(dyn_params, frame, act, _n=n):
            cache = dyn.apply({"params": dyn_params}, 1, 16, 16, nf + 1,
                              jnp.bfloat16, method=dyn.init_cache)

            def body(c, _):
                logits, c2 = dyn.apply({"params": dyn_params}, frame, act,
                                       c, 0, method=dyn.decode_frame)
                return c2, logits.mean()

            _, outs = jax.lax.scan(body, cache, None, length=_n)
            return outs.sum()

        _sync(steps(dyn_params, frame, act))
        dt = best_of(lambda: _sync(steps(dyn_params, frame, act)),
                     args.repeats)
        print(f"decode_frame x{n}: {dt * 1e3:8.1f} ms"
              f" -> {dt / n * 1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
