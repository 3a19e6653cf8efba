"""Progressive-ingredient A/B of the MaskGIT refine step on the chip.

The isolated 200-step refine loop (static pos, static num_tokens, cache
as a random argument) runs 0.43-0.44 ms/step ex-dispatch, but the real
rollout's spf-sweep slope is ~0.65 ms/step. This adds the real loop's
ingredients one at a time to find which one pays the difference:

  V0  static pos, static ntok          (the fast harness)
  V1  + dynamic num_tokens (scan xs)   (real schedule plumbing)
  V2  + dynamic pos (device scalar)    (real tgt plumbing)
  V3  outer frame scan carrying the cache, inner refine closing over
      it, one commit per frame         (the real rollout structure)

Scratch diagnostics -- not part of the bench contract.
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

REPEATS = 5
N_STEPS = 200
TMAX = 17


def _sync(x):
    return float(np.asarray(x).sum())


def best_of(fn):
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


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
        lambda z: jax.random.normal(key, z.shape, jnp.float32).astype(z.dtype),
        dyn.apply({"params": params}, 1, 16, 16, TMAX, jnp.bfloat16,
                  method=dyn.init_cache))
    act1 = jnp.zeros((1,), jnp.int32)
    schedule = jnp.full((N_STEPS,), 10, jnp.int32)
    keys = jax.random.split(key, N_STEPS)

    # dispatch floor
    def null_loop(p, fr):
        def body(f, _):
            return (f + 1) % 1024, None
        out, _ = jax.lax.scan(body, fr, None, length=N_STEPS)
        return out.sum()

    fr0 = jnp.zeros((1, 16, 16), jnp.int32)
    comp = jax.jit(null_loop).lower(params, fr0).compile()
    _sync(comp(params, fr0))
    floor = best_of(lambda: _sync(comp(params, fr0)))
    print(f"dispatch floor: {floor * 1e3:6.1f} ms")

    def refine_body(p, mask, code, sk, ntok, pos, cch):
        fr = jnp.where(mask, 0, code).reshape(1, 16, 16)
        logits, _ = dyn.apply({"params": p}, fr, act1, cch, pos,
                              commit=False, method=dyn.decode_frame)
        return maskgit_commit(sk, logits.reshape(1, 256, -1), mask, code, ntok)

    mask0 = jnp.ones((1, 256), bool)
    code0 = jnp.zeros((1, 256), jnp.int32)

    # -- V0: static pos, static ntok ---------------------------------
    def v0(p, cch):
        def body(carry, sk):
            mask, code = refine_body(p, *carry, sk, 10, 1, cch)
            return (mask, code), None
        (m, c), _ = jax.lax.scan(body, (mask0, code0), keys)
        return c.sum()

    # -- V1: dynamic ntok (xs) ---------------------------------------
    def v1(p, cch, sched):
        def body(carry, inp):
            ntok, sk = inp
            mask, code = refine_body(p, *carry, sk, ntok, 1, cch)
            return (mask, code), None
        (m, c), _ = jax.lax.scan(body, (mask0, code0), (sched, keys))
        return c.sum()

    # -- V2: + dynamic pos -------------------------------------------
    def v2(p, cch, sched, pos):
        def body(carry, inp):
            ntok, sk = inp
            mask, code = refine_body(p, *carry, sk, ntok, pos, cch)
            return (mask, code), None
        (m, c), _ = jax.lax.scan(body, (mask0, code0), (sched, keys))
        return c.sum()

    # -- V3: real structure (outer frame scan carries cache) ---------
    SPF = 25
    NF = N_STEPS // SPF  # 8 frames

    def v3(p, cch):
        sched_f = jnp.full((SPF,), 10, jnp.int32)

        def gen_frame(carry, f_idx):
            cch, total = carry
            ks = jax.random.split(jax.random.fold_in(key, f_idx), SPF)

            def body(carry2, inp):
                ntok, sk = inp
                mask, code = refine_body(p, *carry2, sk, ntok, f_idx, cch)
                return (mask, code), None

            (m, c), _ = jax.lax.scan(body, (mask0, code0), (sched_f, ks))
            fr = c.reshape(1, 16, 16)
            _, cch = dyn.apply({"params": p}, fr, act1, cch, f_idx,
                               method=dyn.decode_frame)
            return (cch, total + fr.sum()), None

        (cch, total), _ = jax.lax.scan(
            gen_frame, (cch, jnp.zeros((), jnp.int32)), jnp.arange(NF))
        return total

    # -- V3b: outer scan carries cache, NO commit (passthrough) ------
    def v3b(p, cch):
        sched_f = jnp.full((SPF,), 10, jnp.int32)

        def gen_frame(carry, f_idx):
            cch, total = carry
            ks = jax.random.split(jax.random.fold_in(key, f_idx), SPF)

            def body(carry2, inp):
                ntok, sk = inp
                mask, code = refine_body(p, *carry2, sk, ntok, f_idx, cch)
                return (mask, code), None

            (m, c), _ = jax.lax.scan(body, (mask0, code0), (sched_f, ks))
            return (cch, total + c.sum()), None

        (cch, total), _ = jax.lax.scan(
            gen_frame, (cch, jnp.zeros((), jnp.int32)), jnp.arange(NF))
        return total

    # -- V3c: Python-unrolled outer loop, with commits ---------------
    def v3c(p, cch):
        sched_f = jnp.full((SPF,), 10, jnp.int32)
        total = jnp.zeros((), jnp.int32)
        for f in range(NF):
            ks = jax.random.split(jax.random.fold_in(key, f), SPF)

            def body(carry2, inp, _cch=cch, _f=f):
                ntok, sk = inp
                mask, code = refine_body(p, *carry2, sk, ntok, _f, _cch)
                return (mask, code), None

            (m, c), _ = jax.lax.scan(body, (mask0, code0), (sched_f, ks))
            fr = c.reshape(1, 16, 16)
            _, cch = dyn.apply({"params": p}, fr, act1, cch, f,
                               method=dyn.decode_frame)
            total = total + fr.sum()
        return total

    # -- V3d: cache threaded through the INNER carry (unchanged) -----
    def v3d(p, cch, sched, pos):
        def body(carry, inp):
            mask, code, cch = carry
            ntok, sk = inp
            mask, code = refine_body(p, mask, code, sk, ntok, pos, cch)
            return (mask, code, cch), None
        (m, c, _), _ = jax.lax.scan(body, (mask0, code0, cch), (sched, keys))
        return c.sum()

    # -- V3e: nested scans, cache in BOTH carries (no commit) --------
    def v3e(p, cch):
        sched_f = jnp.full((SPF,), 10, jnp.int32)

        def gen_frame(carry, f_idx):
            cch, total = carry
            ks = jax.random.split(jax.random.fold_in(key, f_idx), SPF)

            def body(carry2, inp):
                mask, code, cch2 = carry2
                ntok, sk = inp
                mask, code = refine_body(p, mask, code, sk, ntok, f_idx, cch2)
                return (mask, code, cch2), None

            (m, c, cch), _ = jax.lax.scan(
                body, (mask0, code0, cch), (sched_f, ks))
            return (cch, total + c.sum()), None

        (cch, total), _ = jax.lax.scan(
            gen_frame, (cch, jnp.zeros((), jnp.int32)), jnp.arange(NF))
        return total

    # -- V3f: V3e + commit per frame (the candidate real fix) --------
    def v3f(p, cch):
        sched_f = jnp.full((SPF,), 10, jnp.int32)

        def gen_frame(carry, f_idx):
            cch, total = carry
            ks = jax.random.split(jax.random.fold_in(key, f_idx), SPF)

            def body(carry2, inp):
                mask, code, cch2 = carry2
                ntok, sk = inp
                mask, code = refine_body(p, mask, code, sk, ntok, f_idx, cch2)
                return (mask, code, cch2), None

            (m, c, cch), _ = jax.lax.scan(
                body, (mask0, code0, cch), (sched_f, ks))
            fr = c.reshape(1, 16, 16)
            _, cch = dyn.apply({"params": p}, fr, act1, cch, f_idx,
                               method=dyn.decode_frame)
            return (cch, total + fr.sum()), None

        (cch, total), _ = jax.lax.scan(
            gen_frame, (cch, jnp.zeros((), jnp.int32)), jnp.arange(NF))
        return total

    # -- V4: FLAT single scan, lax.cond refine/commit per step -------
    def v4(p, cch):
        n_total = NF * (SPF + 1)
        sched_f = jnp.full((SPF,), 10, jnp.int32)
        ntoks = jnp.tile(jnp.concatenate(
            [sched_f, jnp.zeros((1,), jnp.int32)]), (NF,))
        fkeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(NF))
        skeys = jax.vmap(lambda fk: jax.random.split(fk, SPF))(fkeys)
        skeys = jnp.concatenate([skeys, skeys[:, :1]], axis=1)
        skeys = skeys.reshape(n_total, *skeys.shape[2:])
        is_commit = jnp.tile(jnp.arange(SPF + 1) == SPF, (NF,))
        tgts = jnp.repeat(jnp.arange(NF), SPF + 1)

        def step(carry, inp):
            mask, code, cch = carry
            ntok, sk, isc, tgt = inp

            def refine(mask, code, cch):
                mask, code = refine_body(p, mask, code, sk, ntok, tgt, cch)
                return mask, code, cch

            def commit(mask, code, cch):
                fr = code.reshape(1, 16, 16)
                _, cch = dyn.apply({"params": p}, fr, act1, cch, tgt,
                                   method=dyn.decode_frame)
                return jnp.ones_like(mask), jnp.zeros_like(code), cch

            return jax.lax.cond(isc, commit, refine, mask, code, cch), None

        (m, c, cch), _ = jax.lax.scan(
            step, (mask0, code0, cch), (ntoks, skeys, is_commit, tgts))
        return c.sum()

    # -- V5: outer scan + inner refine scan UNROLLED into its body ---
    def v5(p, cch):
        sched_f = jnp.full((SPF,), 10, jnp.int32)

        def gen_frame(carry, f_idx):
            cch, total = carry
            ks = jax.random.split(jax.random.fold_in(key, f_idx), SPF)

            def body(carry2, inp):
                ntok, sk = inp
                mask, code = refine_body(p, *carry2, sk, ntok, f_idx, cch)
                return (mask, code), None

            (m, c), _ = jax.lax.scan(
                body, (mask0, code0), (sched_f, ks), unroll=SPF)
            fr = c.reshape(1, 16, 16)
            _, cch = dyn.apply({"params": p}, fr, act1, cch, f_idx,
                               method=dyn.decode_frame)
            return (cch, total + fr.sum()), None

        (cch, total), _ = jax.lax.scan(
            gen_frame, (cch, jnp.zeros((), jnp.int32)), jnp.arange(NF))
        return total

    pos1 = jnp.asarray(1, jnp.int32)
    only = sys.argv[1:]  # optional name-prefix filters, e.g. `V5`
    for name, fn, args, steps, n_commit, pallas in (
        ("V0 static", v0, (params, cache), N_STEPS, 0, False),
        ("V2 +dyn pos", v2, (params, cache, schedule, pos1), N_STEPS, 0, False),
        ("V3 real structure", v3, (params, cache), N_STEPS, NF, False),
        ("V5 inner-unrolled", v5, (params, cache), N_STEPS + NF, NF, False),
        # Same programs traced with the fused Pallas decode kernels
        # (refine steps only; commits stay XLA). "attn" keeps FFN on XLA.
        ("V2P pallas", v2, (params, cache, schedule, pos1), N_STEPS, 0, "1"),
        ("V5P pallas", v5, (params, cache), N_STEPS + NF, NF, "1"),
        ("V2A attn-only", v2, (params, cache, schedule, pos1), N_STEPS, 0,
         "attn"),
        ("V5A attn-only", v5, (params, cache), N_STEPS + NF, NF, "attn"),
        ("V2F fuse", v2, (params, cache, schedule, pos1), N_STEPS, 0,
         "fuse"),
        ("V5F fuse", v5, (params, cache), N_STEPS + NF, NF, "fuse"),
        ("V5FA fuse-attn", v5, (params, cache), N_STEPS + NF, NF,
         "fuse-attn"),
    ):
        if only and not any(name.split()[0].startswith(p) for p in only):
            continue
        if pallas:
            os.environ["OGT_PALLAS_DECODE"] = pallas
        try:
            comp = jax.jit(fn).lower(*args).compile()
        finally:
            os.environ.pop("OGT_PALLAS_DECODE", None)
        _sync(comp(*args))
        dt = best_of(lambda: _sync(comp(*args)))
        per = (dt - floor) / steps
        note = f" (incl {n_commit} commits)" if n_commit else ""
        print(f"{name:>18}: {dt * 1e3:7.1f} ms total, "
              f"{per * 1e3:6.3f} ms/step ex-dispatch{note}")


if __name__ == "__main__":
    main()
