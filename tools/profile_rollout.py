"""Rollout latency breakdown + roofline/MFU accounting on the real chip.

Measures, for the bench flagship config: full rollout (tokens + pixels) at
several steps-per-frame, token-only rollout, bare cached decode_frame
steps, prefill, and pixel decode -- so optimization targets the part that
actually dominates. Every timed program is AOT-compiled
(`jit(...).lower(...).compile()`) so XLA's own cost model supplies FLOPs
and HBM bytes, from which achieved TFLOP/s, MFU vs the chip's bf16 peak,
and the roofline bound are derived (`open_genie_tpu/utils/roofline.py`).
Hard host sync everywhere (tunnel-safe).

Usage:
  python tools/profile_rollout.py              # rollout breakdown + MFU
  python tools/profile_rollout.py --sweep      # + B in {1,4,8} scaling
  python tools/profile_rollout.py --tokenizer  # + tokenize/decode roofline
  python tools/profile_rollout.py --train      # + train-step roofline
  python tools/profile_rollout.py --all
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


def compile_timed(fn, *args):
    """AOT-compile `fn(*args)`; returns `(compiled, cost_dict)`."""
    import jax

    from open_genie_tpu.utils.roofline import cost_analysis

    compiled = jax.jit(fn).lower(*args).compile()
    return compiled, cost_analysis(compiled)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sweep", action="store_true",
                    help="batch sweep B in {1,4,8} of the full rollout")
    ap.add_argument("--tokenizer", action="store_true",
                    help="MAGVIT2 d=18 tokenize/decode roofline")
    ap.add_argument("--train", action="store_true",
                    help="tokenizer full-loss train step roofline")
    ap.add_argument("--no-breakdown", action="store_true",
                    help="skip the per-stage rollout breakdown")
    ap.add_argument("--steps-sweep", action="store_true",
                    help="in-scan per-step timing at B in {1,8}: refine "
                    "vs commit vs sampling, to localize batch scaling")
    ap.add_argument("--trunk-breakdown", action="store_true",
                    help="attribute the refine forward inside the trunk: "
                    "k-block sweep (fixed vs per-block cost) + standalone "
                    "spatial/temporal/FFN stage timings")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    if args.all:
        args.sweep = args.tokenizer = args.train = True

    import jax
    import jax.numpy as jnp

    from bench import _bf16_params, _genie_cfg
    from open_genie_tpu.models.genie import Genie
    from open_genie_tpu.utils.roofline import device_peaks, summarize

    peaks = device_peaks()
    print(f"device: {jax.devices()[0].device_kind!r} -> peaks {peaks.label}: "
          f"{peaks.flops / 1e12:.0f} bf16 TFLOP/s, {peaks.bw / 1e9:.0f} GB/s, "
          f"balance {peaks.balance:.0f} FLOP/byte")

    model = Genie(**_genie_cfg())
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, video, k, method=model.init_full)
    )(key)["params"]
    params = _bf16_params(params)
    nf = args.frames

    def rollout_fn(params, prompt, actions, key, spf):
        return model.apply({"params": params}, prompt, actions, key,
                           num_frames=nf, steps_per_frame=spf)

    # -- full rollout at several spf (+ roofline) ---------------------
    # NOTE: XLA's cost model counts a lax.scan body ONCE, not per trip, so
    # scanned-program rows are LOWER BOUNDS; the accurate per-step costs
    # (and the analytic rollout roofline derived from them) come from the
    # unscanned decode_frame programs below.
    rollout_times = {}
    if not args.no_breakdown:
        prompt = jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16)
        actions = jnp.zeros((1, nf + 1), jnp.int32)
        for spf in (1, 8, 25):
            comp, cost = compile_timed(
                lambda p, pr, a, k, _spf=spf: rollout_fn(p, pr, a, k, _spf),
                params, prompt, actions, key,
            )
            _sync(comp(params, prompt, actions, key))
            dt = best_of(lambda: _sync(comp(params, prompt, actions, key)),
                         args.repeats)
            rollout_times[spf] = dt
            print(summarize(
                f"full rollout spf={spf:3d} ({nf / dt:6.1f} fps) [scan-LB]",
                dt, cost, peaks))

        # -- token-only rollout --------------------------------------
        tokens = model.apply({"params": params}, prompt,
                             method=model.tokenize_prompt)
        comp, cost = compile_timed(
            lambda p, t, a, k: model.apply(
                {"params": p}, t, a, k, num_frames=nf, steps_per_frame=25,
                method=model.rollout_tokens,
            ),
            params, tokens, actions, key,
        )
        _sync(comp(params, tokens, actions, key))
        dt = best_of(lambda: _sync(comp(params, tokens, actions, key)),
                     args.repeats)
        print(summarize(f"token-only rollout spf=25 ({nf / dt:6.1f} fps)",
                        dt, cost, peaks))

        # -- pixel decode of the full buffer -------------------------
        buf = comp(params, tokens, actions, key)
        dcomp, dcost = compile_timed(
            lambda p, b: model.apply({"params": p}, b,
                                     method=model.decode_window),
            params, buf,
        )
        _sync(dcomp(params, buf))
        dt = best_of(lambda: _sync(dcomp(params, buf)), args.repeats)
        print(summarize(f"pixel decode {int(buf.shape[1])}f", dt, dcost, peaks))

        # -- bare cached decode_frame steps --------------------------
        from open_genie_tpu.models.dynamics import DynamicsModel

        dyn_params = params["dynamics_"]
        dyn = DynamicsModel(
            **{**_genie_cfg()["dynamics"],
               "tok_vocab": 2 ** _genie_cfg()["tokenizer"]["d_codebook"],
               "act_vocab": 2 ** _genie_cfg()["latent_action"]["d_codebook"]})
        frame = jnp.zeros((1, 16, 16), jnp.int32)
        act = jnp.zeros((1,), jnp.int32)

        for n in (25,):
            def steps(dyn_params, frame, act, _n=n):
                cache = dyn.apply({"params": dyn_params}, 1, 16, 16, nf + 1,
                                  jnp.bfloat16, method=dyn.init_cache)

                def body(c, _):
                    logits, c2 = dyn.apply({"params": dyn_params}, frame, act,
                                           c, 0, method=dyn.decode_frame)
                    return c2, logits.mean()

                _, outs = jax.lax.scan(body, cache, None, length=_n)
                return outs.sum()

            comp, cost = compile_timed(steps, dyn_params, frame, act)
            _sync(comp(dyn_params, frame, act))
            dt = best_of(lambda: _sync(comp(dyn_params, frame, act)),
                         args.repeats)
            print(summarize(
                f"decode_frame x{n} ({dt / n * 1e3:5.2f} ms/step) [scan-LB]",
                dt, cost, peaks))

        # Accurate single-step costs (no scan): refine (read-only) and
        # commit decode_frame programs, lowered standalone.
        cache0 = dyn.apply({"params": dyn_params}, 1, 16, 16, nf + 1,
                           jnp.bfloat16, method=dyn.init_cache)
        pos = jnp.asarray(1, jnp.int32)
        rcomp, rcost = compile_timed(
            lambda p, f, a, c, t: dyn.apply(
                {"params": p}, f, a, c, t, commit=False,
                method=dyn.decode_frame)[0].mean(),
            dyn_params, frame, act, cache0, pos,
        )
        _sync(rcomp(dyn_params, frame, act, cache0, pos))
        rdt = best_of(
            lambda: _sync(rcomp(dyn_params, frame, act, cache0, pos)),
            args.repeats)
        print(summarize("refine step (single, exact cost)", rdt, rcost, peaks))
        ccomp, ccost = compile_timed(
            lambda p, f, a, c, t: dyn.apply(
                {"params": p}, f, a, c, t,
                method=dyn.decode_frame)[0].mean(),
            dyn_params, frame, act, cache0, pos,
        )
        _sync(ccomp(dyn_params, frame, act, cache0, pos))
        cdt = best_of(
            lambda: _sync(ccomp(dyn_params, frame, act, cache0, pos)),
            args.repeats)
        print(summarize("commit step (single, exact cost)", cdt, ccost, peaks))

        # Analytic rollout roofline: per-step exact costs x step counts
        # over the measured full-rollout time (the scan programs above
        # under-count). Rollout @ spf: prefill(1) + nf commits + nf*spf
        # refines, plus the pixel decode program.
        if 25 in rollout_times:
            dt25 = rollout_times[25]
            flops = (
                (1 + nf) * ccost["flops"] + nf * 25 * rcost["flops"]
                + dcost["flops"]
            )
            bytes_ = (
                (1 + nf) * ccost["bytes"] + nf * 25 * rcost["bytes"]
                + dcost["bytes"]
            )
            print(summarize(
                f"ANALYTIC full rollout spf=25 ({nf / dt25:6.1f} fps)",
                dt25, {"flops": flops, "bytes": bytes_}, peaks))

    # -- in-scan per-step decomposition at B in {1, 8} ----------------
    if args.steps_sweep:
        from open_genie_tpu.models.dynamics import (
            DynamicsModel, maskgit_commit,
        )

        dyn_params = params["dynamics_"]
        dyn = DynamicsModel(
            **{**_genie_cfg()["dynamics"],
               "tok_vocab": 2 ** _genie_cfg()["tokenizer"]["d_codebook"],
               "act_vocab": 2 ** _genie_cfg()["latent_action"]["d_codebook"]})
        # A single dispatch of ANY program over the tunnel costs ~30 ms
        # (memory: tunnel-bench playbook), which smears ~30/n_steps ms
        # into every per-step figure. 200 steps bounds the smear at
        # ~0.15 ms; the null loop below measures it exactly so per-step
        # numbers can be read dispatch-corrected.
        n_steps = 200
        print(f"\n# in-scan per-step timing ({n_steps} steps), refine mode")

        def null_loop(dyn_params, frame, act):
            def body(fr, _):
                return (fr + 1) % 1024, None
            out, _ = jax.lax.scan(body, frame, None, length=n_steps)
            return out.sum()

        comp, _ = compile_timed(
            null_loop, params["dynamics_"],
            jnp.zeros((1, 16, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
        _sync(comp(params["dynamics_"], jnp.zeros((1, 16, 16), jnp.int32),
                   jnp.zeros((1,), jnp.int32)))
        floor = best_of(
            lambda: _sync(comp(params["dynamics_"],
                               jnp.zeros((1, 16, 16), jnp.int32),
                               jnp.zeros((1,), jnp.int32))),
            args.repeats)
        print(f"dispatch floor (null {n_steps}-step scan): "
              f"{floor * 1e3:6.1f} ms total = "
              f"{floor / n_steps * 1e3:5.3f} ms/step smear")
        def rand_cache(d, b):
            # The cache must be a RANDOM-VALUED ARGUMENT, not a zeros
            # closure constant: XLA algebraically simplifies dots against
            # constant-zero buffers, which silently deleted most of the
            # temporal attention from earlier harnesses (measured: 0.44
            # ms/step on zeros vs 0.69 real -- the round-3 PARITY numbers
            # before this fix under-reported the refine cost).
            zeros = d.apply({"params": dyn_params}, b, 16, 16, nf + 1,
                            jnp.bfloat16, method=d.init_cache)
            return jax.tree_util.tree_map(
                lambda z: jax.random.normal(
                    key, z.shape, jnp.float32).astype(z.dtype),
                zeros)

        for b in (1, 8):
            frame_b = jnp.zeros((b, 16, 16), jnp.int32)
            act_b = jnp.zeros((b,), jnp.int32)
            cache_b = rand_cache(dyn, b)

            def refine_loop(dyn_params, frame, act, cache, _b=b):
                # The frame must depend on the carry: with a constant
                # input XLA hoists the whole loop-invariant forward out
                # of the scan and the loop times nothing.
                def body(fr, _):
                    logits, _ = dyn.apply(
                        {"params": dyn_params}, fr, act, cache, 1,
                        commit=False, method=dyn.decode_frame)
                    fr = (fr + logits[..., 0].astype(jnp.int32)) % 1024
                    return fr, None

                out, _ = jax.lax.scan(
                    body, frame, None, length=n_steps)
                return out.sum()

            def sampling_only_loop(dyn_params, frame, act, cache, _b=b):
                # maskgit_commit alone over fixed logits (mask/code carry
                # + per-step keys keep it in the loop).
                logits0 = jax.random.normal(
                    key, (_b, 256, dyn.tok_vocab), jnp.float32)
                mask0 = jnp.ones((_b, 256), bool)
                code0 = jnp.zeros((_b, 256), jnp.int32)
                keys = jax.random.split(key, n_steps)

                def body(carry, k):
                    mask, code = carry
                    mask, code = maskgit_commit(
                        k, logits0 + code[..., None], mask, code, 3)
                    return (mask, code), None

                (mask, code), _ = jax.lax.scan(body, (mask0, code0), keys)
                return code.sum()

            def sample_loop(dyn_params, frame, act, cache, _b=b):
                # refine + the full maskgit_commit sampling/rank/commit
                mask0 = jnp.ones((_b, 256), bool)
                code0 = jnp.zeros((_b, 256), jnp.int32)
                keys = jax.random.split(key, n_steps)

                def body(carry, k):
                    mask, code = carry
                    fr = jnp.where(mask, 0, code).reshape(_b, 16, 16)
                    logits, _ = dyn.apply(
                        {"params": dyn_params}, fr, act, cache, 1,
                        commit=False, method=dyn.decode_frame)
                    mask, code = maskgit_commit(
                        k, logits.reshape(_b, 256, -1), mask, code, 10)
                    return (mask, code), None

                (mask, code), _ = jax.lax.scan(body, (mask0, code0), keys)
                return code.sum()

            for label, fn in (("model-only", refine_loop),
                              ("sampling-only", sampling_only_loop),
                              ("model+sampling", sample_loop)):
                comp, _ = compile_timed(fn, dyn_params, frame_b, act_b,
                                        cache_b)
                _sync(comp(dyn_params, frame_b, act_b, cache_b))
                dt = best_of(
                    lambda: _sync(comp(dyn_params, frame_b, act_b, cache_b)),
                    args.repeats)
                print(f"B={b} {label:>14}: {dt / n_steps * 1e3:6.2f} ms/step"
                      f" ({(dt - floor) / n_steps * 1e3:6.2f} ex-dispatch,"
                      f" {dt * 1e3:7.1f} ms total)")

    # -- trunk attribution: where the refine forward's time lives -----
    if args.trunk_breakdown:
        from open_genie_tpu.models.dynamics import DynamicsModel

        gcfg = _genie_cfg()
        base_name, base_kw = gcfg["dynamics"]["desc"][0]
        n_full = int(base_kw.get("n_rep", 1))
        n_steps = 200
        frame1 = jnp.zeros((1, 16, 16), jnp.int32)
        act1 = jnp.zeros((1,), jnp.int32)

        # (a) k-block sweep of the in-scan refine forward: the slope is
        # the per-block cost; the k=0 intercept bundles the embed+head
        # cost WITH the ~30 ms tunnel dispatch of the whole scan program
        # (so it is an upper bound on fixed on-device work). The cache is
        # a RANDOM-VALUED ARGUMENT (see rand-cache note above): a zeros
        # closure constant lets XLA delete the temporal-attention dots.
        print(f"\n# trunk k-block sweep (in-scan refine, B=1, {n_steps} steps)")
        times_k = {}
        for k in sorted({0, 1, n_full // 2, n_full}):
            kw = dict(base_kw, n_rep=k)
            desc_k = ((base_name, kw),) if k else ()
            dyn_k = DynamicsModel(
                desc=desc_k, embed_dim=gcfg["dynamics"]["embed_dim"],
                tok_vocab=2 ** gcfg["tokenizer"]["d_codebook"],
                act_vocab=2 ** gcfg["latent_action"]["d_codebook"],
            )
            params_k = _bf16_params(jax.jit(
                lambda kk, _d=dyn_k: _d.init(kk, frame1[:, None],
                                             act1[:, None], train=False)
            )(key)["params"])
            cache_k = jax.tree_util.tree_map(
                lambda z: jax.random.normal(
                    key, z.shape, jnp.float32).astype(z.dtype),
                dyn_k.apply({"params": params_k}, 1, 16, 16, nf + 1,
                            jnp.bfloat16, method=dyn_k.init_cache))

            def refine_loop(p, frame, act, cache, _d=dyn_k):
                def body(fr, _):
                    logits, _ = _d.apply(
                        {"params": p}, fr, act, cache, 1,
                        commit=False, method=_d.decode_frame)
                    fr = (fr + logits[..., 0].astype(jnp.int32)) % 1024
                    return fr, None

                out, _ = jax.lax.scan(body, frame, None, length=n_steps)
                return out.sum()

            comp, _ = compile_timed(refine_loop, params_k, frame1, act1,
                                    cache_k)
            _sync(comp(params_k, frame1, act1, cache_k))
            dt = best_of(lambda: _sync(comp(params_k, frame1, act1, cache_k)),
                         args.repeats)
            times_k[k] = dt / n_steps
            print(f"  k={k} blocks: {dt / n_steps * 1e3:6.3f} ms/step")
        if n_full in times_k and 0 in times_k and n_full:
            per_block = (times_k[n_full] - times_k[0]) / n_full
            print(f"  -> fixed (embed+head + dispatch smear):"
                  f" {times_k[0] * 1e3:6.3f} ms,"
                  f" per block: {per_block * 1e3:6.3f} ms")

        # (b) standalone block stages at the block's decode shape. Every
        # buffer the stage reads (KV cache, FFN kernel/norm params) is a
        # randomized ARGUMENT -- zeros closures get algebraically folded
        # (zero kernel => conv deleted => the loop times an identity).
        from open_genie_tpu.modules.attention import (
            SpatialAttention, TemporalAttention, _per_frame_group_norm,
            _time_valid_conv,
        )

        heads = base_kw.get("n_head", 8)
        dh = base_kw.get("d_head", 64)
        c = base_kw.get("n_embd") or heads * dh
        x1 = jax.random.normal(key, (1, 1, 16, 16, c), jnp.float32
                               ).astype(jnp.bfloat16)
        print(f"# block stages @ (1,1,16,16,{c}) bf16, in-scan")

        def _rand(shape, dtype=jnp.bfloat16):
            return jax.random.normal(key, shape, jnp.float32).astype(dtype)

        sa = SpatialAttention(n_head=heads, d_head=dh, d_inp=c, d_out=c)
        sa_params = _bf16_params(jax.jit(sa.init)(key, x1)["params"])

        def sa_loop(p, x, _aux):
            def body(xc, _):
                return sa.apply({"params": p}, xc) + xc, None
            out, _ = jax.lax.scan(body, x, None, length=n_steps)
            return out.sum()

        ta = TemporalAttention(n_head=heads, d_head=dh, d_inp=c, d_out=c,
                               causal=True)
        kbuf0 = _rand((256, heads, nf + 1, dh))
        ta_params = _bf16_params(jax.jit(
            lambda kk: ta.init(kk, x1, kv_cache=(kbuf0, kbuf0), cache_pos=1,
                               cache_write=False)
        )(key)["params"])

        def ta_loop(p, x, aux):
            kbuf, vbuf = aux["k"], aux["v"]

            def body(xc, _):
                out, _kv = ta.apply({"params": p}, xc, kv_cache=(kbuf, vbuf),
                                    cache_pos=1, cache_write=False)
                return out + xc, None
            out, _ = jax.lax.scan(body, x, None, length=n_steps)
            return out.sum()

        kt = base_kw.get("kernel_size", 3)

        def ffn_loop(_p, x, aux):
            def body(xc, _):
                xn = _per_frame_group_norm(xc, aux["scale"], aux["bias"],
                                           heads)
                out = aux["h"] + _time_valid_conv(
                    xn, aux["kernel"][kt - 1:], aux["bias"])
                return out + xc, None
            out, _ = jax.lax.scan(body, x, None, length=n_steps)
            return out.sum()

        stage_aux = (
            ("spatial attn", sa_loop, sa_params, {}),
            ("temporal attn", ta_loop, ta_params,
             {"k": kbuf0, "v": _rand((256, heads, nf + 1, dh))}),
            ("FFN refine", ffn_loop, {},
             {"kernel": _rand((kt, 3, 3, c, c)) * 0.02,
              "scale": _rand((c,)), "bias": _rand((c,)),
              "h": _rand((1, 1, 16, 16, c))}),
        )
        for label, fn, p, aux in stage_aux:
            comp, _ = compile_timed(fn, p, x1, aux)
            _sync(comp(p, x1, aux))
            dt = best_of(lambda: _sync(comp(p, x1, aux)), args.repeats)
            print(f"  {label:>14}: {dt / n_steps * 1e3:6.3f} ms/step"
                  f" ({(dt / n_steps - times_k.get(0, 0.0)) * 1e3:+6.3f}"
                  " vs k=0 floor)")

    # -- batch sweep: does the chip scale with B? ---------------------
    if args.sweep:
        print("\n# batch sweep, full rollout spf=25 (per-stream / aggregate)")
        base = None
        for b in (1, 4, 8):
            prompt_b = jnp.zeros((b, 1, 64, 64, 3), jnp.bfloat16)
            actions_b = jnp.zeros((b, nf + 1), jnp.int32)
            comp, cost = compile_timed(
                lambda p, pr, a, k: rollout_fn(p, pr, a, k, 25),
                params, prompt_b, actions_b, key,
            )
            _sync(comp(params, prompt_b, actions_b, key))
            dt = best_of(
                lambda: _sync(comp(params, prompt_b, actions_b, key)),
                args.repeats)
            base = base or dt
            print(summarize(
                f"B={b} ({nf / dt:6.1f} fps/stream, {b * nf / dt:7.1f} "
                f"aggregate, {dt / base:4.2f}x time)",
                dt, cost, peaks))

    # -- MAGVIT2 tokenize/decode roofline -----------------------------
    if args.tokenizer:
        from open_genie_tpu.models.blueprints import (
            MAGVIT2_DEC_DESC, MAGVIT2_ENC_DESC,
        )
        from open_genie_tpu.models.tokenizer import VideoTokenizer

        print("\n# MAGVIT2 d=18 tokenizer @ 1x16x64x64 bf16")
        tok = VideoTokenizer(
            enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_DEC_DESC, d_codebook=18
        )
        tvideo = jnp.zeros((1, 16, 64, 64, 3), jnp.bfloat16)
        tparams = _bf16_params(
            jax.jit(lambda k: tok.init(k, tvideo, train=False))(key)
        )
        tcomp, tcost = compile_timed(
            lambda p, v: tok.apply(p, v, method=tok.tokenize)[1],
            tparams, tvideo,
        )
        idxs = tcomp(tparams, tvideo)
        _sync(idxs)
        dt = best_of(lambda: _sync(tcomp(tparams, tvideo)), args.repeats)
        print(summarize(f"tokenize ({16 / dt:6.1f} fps)", dt, tcost, peaks))
        # fused-vs-unfused LFQ head (VERDICT r2 item 5: measure or demote)
        ucomp, ucost = compile_timed(
            lambda p, v: tok.apply(p, v, method=tok.tokenize, fused=False)[1],
            tparams, tvideo,
        )
        _sync(ucomp(tparams, tvideo))
        udt = best_of(lambda: _sync(ucomp(tparams, tvideo)), args.repeats)
        print(summarize(
            f"tokenize UNFUSED head ({16 / udt:6.1f} fps, fused is "
            f"{(udt / dt - 1) * 100:+.1f}%)", udt, ucost, peaks))
        dcomp, dcost = compile_timed(
            lambda p, i: tok.apply(p, i, method=tok.decode_tokens),
            tparams, idxs,
        )
        _sync(dcomp(tparams, idxs))
        dt = best_of(lambda: _sync(dcomp(tparams, idxs)), args.repeats)
        print(summarize(f"decode   ({16 / dt:6.1f} fps)", dt, dcost, peaks))

    # -- tokenizer full-loss train step roofline ----------------------
    if args.train:
        from open_genie_tpu.models.blueprints import (
            MAGVIT2_DEC_DESC, MAGVIT2_ENC_DESC,
        )
        from open_genie_tpu.train.loop import (
            create_train_state, make_optimizer, make_train_step,
        )
        from open_genie_tpu.train.losses import (
            TokenizerTrainModule, frozen_param_mask,
        )

        b, f = 2, 4
        print(f"\n# MAGVIT2 full-loss train step @ b{b}f{f} 64x64")
        module = TokenizerTrainModule(
            tokenizer=dict(
                enc_desc=MAGVIT2_ENC_DESC, dec_desc=MAGVIT2_DEC_DESC,
                d_codebook=18,
            ),
            disc_kwargs=dict(
                inp_size=(64, 64), model_dim=64, dim_mults=(1, 2, 4),
                down_step=(None, 2, 2), num_groups=8, use_attn=True,
                num_heads=4, dim_head=32,
            ),
            gan_frames_per_batch=4,
        )
        sample = jnp.zeros((b, f, 64, 64, 3), jnp.float32)
        state = create_train_state(module, sample, key, make_optimizer())
        mask = frozen_param_mask(state.params, ("perc_crit",))
        opt = make_optimizer(frozen_mask=mask)
        state = state.replace(opt_state=opt.init(state.params))
        step = make_train_step(module, opt, compute_dtype=jnp.bfloat16)

        from open_genie_tpu.utils.roofline import cost_analysis

        lowered = step.lower(state, sample)
        comp = lowered.compile()
        cost = cost_analysis(comp)
        state, metrics = comp(state, sample)
        _sync(metrics["grad_norm"])
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, metrics = comp(state, sample)
            _sync(metrics["grad_norm"])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(summarize(f"train step ({b * f / dt:6.1f} frames/s)",
                        dt, cost, peaks))


if __name__ == "__main__":
    main()
