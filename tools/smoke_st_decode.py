"""On-chip lowering + numerics smoke for the fused Pallas decode kernels.

The interpret-mode CPU parity tests (tests/test_st_decode_pallas.py)
cannot catch Mosaic lowering failures (round 3 found `.at[].set` inside
a kernel dies with "Unimplemented ... scatter" only on real TPU). This
tool compiles ONE refine-step program per `OGT_PALLAS_DECODE` mode on
the live backend, asserts logit parity vs the XLA decode branch, and
times a 200-step refine scan per mode — the direct per-step signal the
full-rollout A/B (`tools/ab_st_decode.py`) aggregates.

The env gate is read at TRACE time, so each mode gets its own `jax.jit`
wrapper (a shared jit instance would silently reuse the first mode's
executable). Scratch diagnostics — not part of the bench contract.
"""
from __future__ import annotations

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

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bf16_params, _genie_cfg
from open_genie_tpu.models.dynamics import DynamicsModel, maskgit_commit

MODES = ("attn", "fuse-attn", "full", "fuse")
N_STEPS = 200
TMAX = 17


def _sync(x):
    return float(np.asarray(x).sum())


def main():
    g = _genie_cfg()
    dyn = DynamicsModel(
        **{**g["dynamics"],
           "tok_vocab": 2 ** g["tokenizer"]["d_codebook"],
           "act_vocab": 2 ** g["latent_action"]["d_codebook"]}
    )
    key = jax.random.PRNGKey(0)
    frame0 = jnp.zeros((1, 1, 16, 16), jnp.int32)
    act0 = jnp.zeros((1, 1), jnp.int32)
    params = _bf16_params(
        jax.jit(lambda k: dyn.init(k, frame0, act0, train=False))(key)["params"]
    )
    cache = jax.tree_util.tree_map(
        lambda z: (0.02 * jax.random.normal(key, z.shape, jnp.float32)
                   ).astype(z.dtype),
        dyn.apply({"params": params}, 1, 16, 16, TMAX, jnp.bfloat16,
                  method=dyn.init_cache))
    act1 = jnp.zeros((1,), jnp.int32)
    fr = jax.random.randint(key, (1, 16, 16), 0, 1024)
    pos = jnp.asarray(9, jnp.int32)

    def one_step(p, fr, pos, cch):
        logits, _ = dyn.apply({"params": p}, fr, act1, cch, pos,
                              commit=False, method=dyn.decode_frame)
        return logits

    def refine_loop(p, cch, pos):
        keys = jax.random.split(key, N_STEPS)
        sched = jnp.full((N_STEPS,), 10, jnp.int32)
        mask0 = jnp.ones((1, 256), bool)
        code0 = jnp.zeros((1, 256), jnp.int32)

        def body(carry, inp):
            ntok, sk = inp
            mask, code = carry
            f = jnp.where(mask, 0, code).reshape(1, 16, 16)
            logits = one_step(p, f, pos, cch)
            return maskgit_commit(sk, logits.reshape(1, 256, -1),
                                  mask, code, ntok), None
        (m, c), _ = jax.lax.scan(body, (mask0, code0), (sched, keys))
        return c.sum()

    results = {}
    os.environ.pop("OGT_PALLAS_DECODE", None)
    ref = np.asarray(jax.jit(one_step)(params, fr, pos, cache),
                     np.float32)
    loop_x = jax.jit(refine_loop)
    _sync(loop_x(params, cache, pos))  # compile + warm
    t0 = time.perf_counter()
    _sync(loop_x(params, cache, pos))
    tx = time.perf_counter() - t0
    # one timed run is enough at 200 steps; dispatch noise ~30ms << total
    print(f"  {'xla':>9}: {tx / N_STEPS * 1e3:6.3f} ms/step")
    results["xla"] = tx / N_STEPS

    for mode in MODES:
        os.environ["OGT_PALLAS_DECODE"] = mode
        try:
            out = np.asarray(jax.jit(one_step)(params, fr, pos, cache),
                             np.float32)
            diff = float(np.max(np.abs(out - ref)))
            loop_k = jax.jit(refine_loop)
            _sync(loop_k(params, cache, pos))  # compile+warm
            t0 = time.perf_counter()
            _sync(loop_k(params, cache, pos))
            tk = time.perf_counter() - t0
            ok = diff < 0.06  # bf16 matmul reassociation tolerance
            print(f"  {mode:>9}: {tk / N_STEPS * 1e3:6.3f} ms/step  "
                  f"max|Δlogit|={diff:.2e} {'OK' if ok else 'MISMATCH'}")
            results[mode] = tk / N_STEPS
        except Exception as e:  # noqa: BLE001 — report every mode
            msg = str(e).splitlines()[0][:160]
            print(f"  {mode:>9}: FAILED {type(e).__name__}: {msg}")
    os.environ.pop("OGT_PALLAS_DECODE", None)
    print({m: round(v * 1e3, 3) for m, v in results.items()})


if __name__ == "__main__":
    main()
