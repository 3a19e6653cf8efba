"""Pallas kernels: fused ST-transformer block, KV-cached decode (refine) mode.

The MaskGIT rollout's hot path is the READ-ONLY decode of one token frame
(`SpaceTimeAttention.__call__` with `cache_write=False`): at decode shapes
(256 tokens, 512 wide) every matmul is tiny, so the XLA path's ~30 small ops
per block are bound by per-op scheduling latency, not FLOPs or bandwidth
(measured ~72 us/block on v5e vs a ~15 us weight-streaming floor;
`tools/profile_rollout.py` trunk breakdown). These kernels collapse each
stage's op chain into one VMEM pass:

  * `spatial_block`   : RoPE-2d -> LayerNorm -> fused QKV -> 8-head 256x256
                        attention -> out proj -> +skip, one kernel.
  * `temporal_decode` : RoPE-1d(pos) -> LayerNorm -> fused QKV -> per-tube
                        1-query attention over the temporal KV cache
                        (history streamed HBM->VMEM in time chunks with an
                        online softmax -- the cache never materializes in
                        VMEM) + the live position -> out proj -> +skip.
  * `ffn_refine`      : per-frame GroupNorm -> single-time-tap 3x3 conv (9
                        shifted matmuls) -> +fh -> +skip.

Numerics mirror the XLA decode path (f32 logits/normalizers, params-dtype
matmuls); parity is pinned by tests/test_st_decode_pallas.py against
`SpaceTimeAttention`'s decode branch. The commit pass (1 per frame vs 25
refines) stays on XLA.

Reference behavior being accelerated: per-step MaskGIT refinement forward
(`/root/reference/genie/dynamics.py:136`, full re-forward per step there).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_genie_tpu.ops.rope import rope_frequencies

_INTERPRET = False  # flipped by tests on CPU


def _rot_half(x):
    """`(x1, x2) -> (-x2, x1)` on interleaved feature pairs, via lane rolls
    (strided lane shuffles are not expressible directly in Mosaic)."""
    n = x.shape[-1]
    xp = pltpu.roll(x, 1, axis=x.ndim - 1)      # x[k-1]
    xm = pltpu.roll(x, n - 1, axis=x.ndim - 1)  # x[k+1] (shifts must be >= 0)
    even = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % 2
    ) == 0
    return jnp.where(even, -xm, xp)


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


# ---------------------------------------------------------------------- #
# Spatial attention block
# ---------------------------------------------------------------------- #


def _spatial_math(x, cos, sin, lns, lnb, wqkv, wo, heads, d_head, scale):
    """Value-level spatial-attention stage (shared by the standalone and
    merged kernels): RoPE-2d -> LN -> fused QKV -> per-head attention ->
    out proj -> +skip. `x` is `(N, C)` f32."""
    xr = x * cos + _rot_half(x) * sin
    xn = _layer_norm(xr, lns, lnb)
    wdt = wqkv.dtype
    qkv = jnp.dot(
        xn.astype(wdt), wqkv, preferred_element_type=jnp.float32
    )                                                     # (N, 3C)
    c = heads * d_head
    # Per-head results are CONCATENATED, not scattered into a zeros
    # buffer: Mosaic(TC) has no scatter lowering, so `.at[:, sl].set`
    # fails to compile on real chips (caught by the round-3 on-chip A/B;
    # interpret-mode CPU tests can't see it).
    per_head = []
    for h in range(heads):
        q = qkv[:, h * d_head : (h + 1) * d_head]
        k = qkv[:, c + h * d_head : c + (h + 1) * d_head]
        v = qkv[:, 2 * c + h * d_head : 2 * c + (h + 1) * d_head]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                         # (N, N)
        probs = jax.nn.softmax(logits, axis=-1)
        oh = jnp.dot(
            probs.astype(wdt), v.astype(wdt),
            preferred_element_type=jnp.float32,
        )
        per_head.append(oh)
    attn_out = (
        per_head[0] if heads == 1 else jnp.concatenate(per_head, axis=-1)
    )
    out = jnp.dot(
        attn_out.astype(wdt), wo, preferred_element_type=jnp.float32
    )
    return out + x


def _spatial_kernel(
    x_ref, cos_ref, sin_ref, lns_ref, lnb_ref, wqkv_ref, wo_ref, o_ref,
    *, heads: int, d_head: int, scale: float,
):
    out = _spatial_math(
        x_ref[0].astype(jnp.float32), cos_ref[:], sin_ref[:], lns_ref[:],
        lnb_ref[:], wqkv_ref[:], wo_ref[:], heads, d_head, scale,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def spatial_block(x, ln_scale, ln_bias, wqkv, wo, *, heads: int):
    """Fused: RoPE-2d -> LN -> QKV -> multi-head attention over the `N`
    spatial tokens -> out proj -> +identity skip. `x` is `(B, N, C)` (one
    frame's flattened grid per batch row); returns the same shape."""
    b, n, c = x.shape
    d_head = c // heads
    freq = rope_frequencies(c, kind="2d")
    phase = jnp.repeat(
        jnp.arange(n, dtype=jnp.float32)[:, None] * freq[None, :], 2, axis=-1
    )
    cos, sin = jnp.cos(phase), jnp.sin(phase)             # (N, C) consts
    kernel = functools.partial(
        _spatial_kernel, heads=heads, d_head=d_head, scale=d_head ** -0.5
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_INTERPRET,
    )(x, cos, sin, ln_scale.astype(jnp.float32),
      ln_bias.astype(jnp.float32), wqkv, wo)


# ---------------------------------------------------------------------- #
# Temporal decode attention (read-only KV cache)
# ---------------------------------------------------------------------- #


def _temporal_math(
    x, pos, b, cos, sin, lns, lnb, wqkv, wo, k_hbm, v_hbm,
    k_vmem, v_vmem, sem, heads, d_head, scale, t_chunk, t_max, n,
):
    """Value-level temporal decode-attention stage (shared by the
    standalone and merged kernels). `x` is `(N, C)` f32 at position `pos`
    of batch row `b`; the KV history streams HBM->VMEM double-buffered."""
    xr = x * cos + _rot_half(x) * sin
    xn = _layer_norm(xr, lns, lnb)
    wdt = wqkv.dtype
    qkv = jnp.dot(
        xn.astype(wdt), wqkv, preferred_element_type=jnp.float32
    )
    c = heads * d_head
    q = qkv[:, :c].reshape(n, heads, d_head)
    # Round the live position's K/V through the CACHE dtype (matching the
    # XLA read-only branch, attention.py): a bf16 cache means the commit
    # pass will store bf16-rounded values, and refine steps must see the
    # same logits the committed history would produce.
    cdt = k_vmem.dtype
    k_cur = (
        qkv[:, c : 2 * c].astype(cdt).astype(jnp.float32)
    ).reshape(n, heads, d_head)
    v_cur = (
        qkv[:, 2 * c :].astype(cdt).astype(jnp.float32)
    ).reshape(n, heads, d_head)

    # Online softmax over history chunks (t < pos), streamed from HBM
    # with double-buffered DMA (chunk c+1's copy overlaps chunk c's math).
    n_chunks = t_max // t_chunk
    m0 = jnp.full((n, heads), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((n, heads), jnp.float32)
    a0 = jnp.zeros((n, heads, d_head), jnp.float32)

    # Only chunks that can contain t < pos contribute; bounding the loop
    # by pos makes decode work O(pos), not O(t_max).
    live_chunks = jnp.minimum(
        (pos + t_chunk - 1) // t_chunk, n_chunks
    )

    def start_copy(ci, slot):
        cp = pltpu.make_async_copy(
            k_hbm.at[pl.ds(b * n, n), :, pl.ds(ci * t_chunk, t_chunk), :],
            k_vmem.at[slot], sem.at[2 * slot],
        )
        cp.start()
        cv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(b * n, n), :, pl.ds(ci * t_chunk, t_chunk), :],
            v_vmem.at[slot], sem.at[2 * slot + 1],
        )
        cv.start()
        return cp, cv

    @pl.when(live_chunks > 0)
    def _():
        start_copy(0, 0)[0]  # warm-up: first chunk into slot 0

    def chunk_body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < live_chunks)
        def _():
            start_copy(ci + 1, 1 - slot)

        # Wait on this chunk's two DMAs (re-constructed handles wait on
        # the same semaphores the starts signalled).
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(b * n, n), :, pl.ds(ci * t_chunk, t_chunk), :],
            k_vmem.at[slot], sem.at[2 * slot],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(b * n, n), :, pl.ds(ci * t_chunk, t_chunk), :],
            v_vmem.at[slot], sem.at[2 * slot + 1],
        ).wait()
        kc = k_vmem[slot].astype(jnp.float32)             # (N, H, Tc, D)
        logits = jnp.sum(q[:, :, None, :] * kc, axis=-1) * scale  # (N,H,Tc)
        tvals = ci * t_chunk + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 2
        )
        logits = jnp.where(tvals < pos, logits, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        # exp(-inf - -inf) guard: where m_new is still -inf nothing has
        # been accumulated, keep l/acc at zero.
        alpha = jnp.where(
            m_new == -jnp.inf, 0.0, jnp.exp(m - m_new)
        )
        p = jnp.where(
            m_new[:, :, None] == -jnp.inf, 0.0,
            jnp.exp(logits - m_new[:, :, None]),
        )
        vc = v_vmem[slot].astype(jnp.float32)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, :, None] + jnp.sum(
            p[:, :, :, None] * vc, axis=2
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(
        0, live_chunks, chunk_body, (m0, l0, a0)
    )

    # The live position's K/V (identical logit set to the XLA read-only
    # path: history from the buffers, current from the live projections).
    logit_s = jnp.sum(q * k_cur, axis=-1) * scale         # (N, H)
    m_new = jnp.maximum(m, logit_s)
    alpha = jnp.where(m_new == -jnp.inf, 0.0, jnp.exp(m - m_new))
    p_s = jnp.exp(logit_s - m_new)
    l = l * alpha + p_s
    acc = acc * alpha[:, :, None] + p_s[:, :, None] * v_cur
    out_h = (acc / l[:, :, None]).reshape(n, c)
    out = jnp.dot(
        out_h.astype(wdt), wo, preferred_element_type=jnp.float32
    )
    return out + x


def _temporal_kernel(
    pos_ref,  # scalar prefetch (SMEM)
    x_ref, cos_ref, sin_ref, lns_ref, lnb_ref, wqkv_ref, wo_ref,
    k_hbm, v_hbm, o_ref,
    k_vmem, v_vmem, sem,
    *, heads: int, d_head: int, scale: float, t_chunk: int, t_max: int,
    n: int,
):
    out = _temporal_math(
        x_ref[0].astype(jnp.float32), pos_ref[0], pl.program_id(0),
        cos_ref[:], sin_ref[:], lns_ref[:], lnb_ref[:], wqkv_ref[:],
        wo_ref[:], k_hbm, v_hbm, k_vmem, v_vmem, sem,
        heads, d_head, scale, t_chunk, t_max, n,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def temporal_decode(x, pos, ln_scale, ln_bias, wqkv, wo, k_buf, v_buf,
                    *, heads: int, t_chunk: int = 8):
    """Fused: RoPE-1d(pos) -> LN -> QKV -> per-tube single-query attention
    over the temporal KV cache (read-only; history streamed in time chunks)
    + the live position -> out proj -> +identity skip.

    `x` is `(B, N, C)` (N pixel tubes of the frame at `pos`); `k_buf`/
    `v_buf` are the `(B*N, heads, T_max, d_head)` cache buffers. `t_max`
    must be a multiple of `t_chunk` (callers pad the session horizon)."""
    b, n, c = x.shape
    d_head = c // heads
    t_max = k_buf.shape[2]
    assert t_max % t_chunk == 0, (t_max, t_chunk)
    freq = rope_frequencies(c, kind="1d")
    phase = jnp.repeat(pos.astype(jnp.float32) * freq, 2, axis=-1)  # (C,)
    cos, sin = jnp.cos(phase)[None, :], jnp.sin(phase)[None, :]     # (1, C)
    kernel = functools.partial(
        _temporal_kernel, heads=heads, d_head=d_head,
        scale=d_head ** -0.5, t_chunk=t_chunk, t_max=t_max, n=n,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k cache (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # v cache (HBM)
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n, heads, t_chunk, d_head), k_buf.dtype),
            pltpu.VMEM((2, n, heads, t_chunk, d_head), v_buf.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_INTERPRET,
    )(jnp.asarray(pos, jnp.int32).reshape(1), x, cos, sin,
      ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      wqkv, wo, k_buf, v_buf)


def _qkv_weights(p):
    """Horizontally fused QKV kernel from an `Attention` param subtree."""
    return jnp.concatenate(
        [p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"]],
        axis=1,
    )


# ---------------------------------------------------------------------- #
# Merged spatial+temporal attention kernel (one launch per block pair)
# ---------------------------------------------------------------------- #


def _attn_pair_kernel(
    pos_ref,
    x_ref, cos2_ref, sin2_ref, lns_s_ref, lnb_s_ref, wqkv_s_ref, wo_s_ref,
    cos1_ref, sin1_ref, lns_t_ref, lnb_t_ref, wqkv_t_ref, wo_t_ref,
    k_hbm, v_hbm, o_ref,
    k_vmem, v_vmem, sem,
    *, heads: int, d_head: int, scale: float, t_chunk: int, t_max: int,
    n: int,
):
    x = _spatial_math(
        x_ref[0].astype(jnp.float32), cos2_ref[:], sin2_ref[:],
        lns_s_ref[:], lnb_s_ref[:], wqkv_s_ref[:], wo_s_ref[:],
        heads, d_head, scale,
    )
    out = _temporal_math(
        x, pos_ref[0], pl.program_id(0),
        cos1_ref[:], sin1_ref[:], lns_t_ref[:], lnb_t_ref[:],
        wqkv_t_ref[:], wo_t_ref[:], k_hbm, v_hbm, k_vmem, v_vmem, sem,
        heads, d_head, scale, t_chunk, t_max, n,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def attn_pair(x, pos, sp, tp, k_buf, v_buf, *, heads: int,
              t_chunk: int = 8):
    """Spatial + temporal decode attention merged into ONE kernel launch
    per block (saves a kernel boundary and an activation HBM round-trip).
    `sp`/`tp` are the spatial/temporal `Attention` param subtrees."""
    b, n, c = x.shape
    d_head = c // heads
    t_max = k_buf.shape[2]
    assert t_max % t_chunk == 0, (t_max, t_chunk)
    freq2 = rope_frequencies(c, kind="2d")
    phase2 = jnp.repeat(
        jnp.arange(n, dtype=jnp.float32)[:, None] * freq2[None, :], 2,
        axis=-1,
    )
    freq1 = rope_frequencies(c, kind="1d")
    phase1 = jnp.repeat(pos.astype(jnp.float32) * freq1, 2, axis=-1)

    kernel = functools.partial(
        _attn_pair_kernel, heads=heads, d_head=d_head,
        scale=d_head ** -0.5, t_chunk=t_chunk, t_max=t_max, n=n,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((n, c)), full((n, c)), full((c,)), full((c,)),
            full((c, 3 * c)), full((c, c)),
            full((1, c)), full((1, c)), full((c,)), full((c,)),
            full((c, 3 * c)), full((c, c)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n, heads, t_chunk, d_head), k_buf.dtype),
            pltpu.VMEM((2, n, heads, t_chunk, d_head), v_buf.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_INTERPRET,
    )(jnp.asarray(pos, jnp.int32).reshape(1), x,
      jnp.cos(phase2), jnp.sin(phase2),
      sp["norm"]["scale"].astype(jnp.float32),
      sp["norm"]["bias"].astype(jnp.float32), _qkv_weights(sp),
      sp["to_out"]["kernel"],
      jnp.cos(phase1)[None, :], jnp.sin(phase1)[None, :],
      tp["norm"]["scale"].astype(jnp.float32),
      tp["norm"]["bias"].astype(jnp.float32), _qkv_weights(tp),
      tp["to_out"]["kernel"], k_buf, v_buf)


# ---------------------------------------------------------------------- #
# FFN refine (per-frame GroupNorm + single-time-tap conv + fh + skip)
# ---------------------------------------------------------------------- #


def _ffn_kernel(
    x_ref, gns_ref, gnb_ref, ind_ref, w_ref, cb_ref, fh_ref, o_ref,
    pad_ref,
    *, hs: int, ws: int, c: int, groups: int, kh: int, kw: int,
):
    x = x_ref[0].astype(jnp.float32)                      # (Hs, Ws, C)
    flat = x.reshape(hs * ws, c)
    # Per-frame GroupNorm: stats over (H, W, C/groups) per group, applied
    # via a (groups, C) indicator matmul (no lane-splitting reshapes).
    cg = c // groups
    csum = jnp.sum(flat, axis=0, keepdims=True)           # (1, C)
    csq = jnp.sum(jnp.square(flat), axis=0, keepdims=True)
    gsum = jax.lax.dot_general(
        csum, ind_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (1, groups)
    gsq = jax.lax.dot_general(
        csq, ind_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cnt = float(hs * ws * cg)
    mean_g = gsum / cnt
    var_g = gsq / cnt - jnp.square(mean_g)
    mean_c = jnp.dot(mean_g, ind_ref[:],
                     preferred_element_type=jnp.float32)  # (1, C)
    var_c = jnp.dot(var_g, ind_ref[:],
                    preferred_element_type=jnp.float32)
    xn = (flat - mean_c) * jax.lax.rsqrt(var_c + 1e-6)
    xn = xn * gns_ref[:] + gnb_ref[:]

    # Zero-padded spatial window for the 3x3 (kh x kw) tap conv.
    pad_ref[:] = jnp.zeros_like(pad_ref)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    pad_ref[ph : ph + hs, pw : pw + ws, :] = xn.reshape(hs, ws, c).astype(
        pad_ref.dtype
    )
    wdt = w_ref.dtype
    acc = jnp.zeros((hs * ws, c), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            shifted = pad_ref[dy : dy + hs, dx : dx + ws, :]
            acc = acc + jnp.dot(
                shifted.reshape(hs * ws, c).astype(wdt),
                w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    out = acc + cb_ref[:] + fh_ref[0].astype(jnp.float32).reshape(
        hs * ws, c
    ) + flat
    o_ref[0] = out.reshape(hs, ws, c).astype(o_ref.dtype)


def ffn_refine(x, gn_scale, gn_bias, tap_kernel, cbias, fh, *, groups: int):
    """Fused decode-mode FFN refine step: per-frame GroupNorm -> the causal
    conv's CURRENT time tap (`kernel[kt-1]`, a `(kh, kw, C, C)` spatial
    conv done as kh*kw shifted matmuls) -> + `fh` (the cached history-tap
    contribution) -> +identity skip. `x`/`fh` are `(B, Hs, Ws, C)`."""
    b, hs, ws, c = x.shape
    kh, kw = tap_kernel.shape[0], tap_kernel.shape[1]
    ind = jnp.zeros((groups, c), jnp.float32)
    cg = c // groups
    ind = ind.at[
        jnp.repeat(jnp.arange(groups), cg), jnp.arange(c)
    ].set(1.0)
    if cbias is None:
        cbias = jnp.zeros((c,), jnp.float32)
    kernel = functools.partial(
        _ffn_kernel, hs=hs, ws=ws, c=c, groups=groups, kh=kh, kw=kw
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hs, ws, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, c, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs, ws, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hs, ws, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hs + kh - 1, ws + kw - 1, c), x.dtype),
        ],
        interpret=_INTERPRET,
    )(x, gn_scale.astype(jnp.float32), gn_bias.astype(jnp.float32),
      ind, tap_kernel, cbias.astype(jnp.float32), fh)


# ---------------------------------------------------------------------- #
# Whole-block wrapper (the SpaceTimeAttention decode read-only fast path)
# ---------------------------------------------------------------------- #


def refine_block(video, cache, pos, params, *, heads: int,
                 t_chunk: int = 8, use_ffn_kernel: bool = True,
                 merge_attn: bool = False):
    """One ST-transformer block's read-only decode step via the fused
    kernels. `video` is `(B, 1, H, W, C)`; `cache` the layer's
    `{k, v, ffn, fh}` dict; `params` the layer's param tree (reads the
    same leaves the XLA decode path reads). Returns the block output
    `(B, 1, H, W, C)`; the cache is untouched.

    `use_ffn_kernel=False` (env `OGT_PALLAS_DECODE=attn`) keeps the FFN
    stage on XLA -- profiling shows XLA overlaps the FFN conv with
    neighboring work, so the kernel may only pay for the attention
    stages; the A/B in tools/scratch_refine_ab.py measures both."""
    b, _, h, w, c = video.shape
    n = h * w
    x = video.reshape(b, n, c)

    sp = params["space_attn"]["attn"]
    tp = params["temp_attn"]["attn"]
    if merge_attn:
        x = attn_pair(
            x, pos, sp, tp, cache["k"], cache["v"],
            heads=heads, t_chunk=t_chunk,
        )
    else:
        x = spatial_block(
            x, sp["norm"]["scale"], sp["norm"]["bias"], _qkv_weights(sp),
            sp["to_out"]["kernel"], heads=heads,
        )
        x = temporal_decode(
            x, pos, tp["norm"]["scale"], tp["norm"]["bias"], _qkv_weights(tp),
            tp["to_out"]["kernel"], cache["k"], cache["v"],
            heads=heads, t_chunk=t_chunk,
        )
    fp = params["ffn"]
    kt = fp["block_0"]["kernel"].shape[0]
    if use_ffn_kernel:
        out = ffn_refine(
            x.reshape(b, h, w, c),
            fp["norm"]["scale"], fp["norm"]["bias"],
            fp["block_0"]["kernel"][kt - 1],
            fp["block_0"].get("bias"),
            cache["fh"].reshape(b, h, w, c),
            groups=heads,
        )
        return out.reshape(b, 1, h, w, c)
    # XLA FFN (same math as SpaceTimeAttention's decode refine branch).
    from open_genie_tpu.modules.attention import (
        _per_frame_group_norm, _time_valid_conv,
    )

    xv = x.reshape(b, 1, h, w, c)
    xn = _per_frame_group_norm(
        xv, fp["norm"]["scale"], fp["norm"]["bias"], heads
    )
    ffn = cache["fh"].astype(xn.dtype) + _time_valid_conv(
        xn, fp["block_0"]["kernel"][kt - 1 :], fp["block_0"].get("bias")
    )
    return ffn + xv


_MODES = ("full", "attn", "fuse", "fuse-attn")


def mode() -> Optional[str]:
    """Dispatch gate for the fused decode kernels, read at trace time.

    `OGT_PALLAS_DECODE` values (prefix with `interpret:` to force
    interpreter mode off-TPU, tests/A-B only):
      1|full    : spatial + temporal + FFN kernels (3 launches/block)
      attn      : spatial + temporal kernels, FFN on XLA
      fuse      : merged spatial+temporal kernel + FFN kernel
      fuse-attn : merged spatial+temporal kernel, FFN on XLA
    Defaults OFF: the on-chip A/B (v5e, flagship 6-block/512-wide config,
    `tools/scratch_refine_ab.py V5`) measured every mode 0.4-4% SLOWER
    than the optimized XLA decode path (0.484 ms/refine-step XLA vs
    0.486/0.489/0.497/0.504 for fuse-attn/fuse/attn/full) -- the round-3
    XLA-side work (read-only refine, FFN time-tap split, fused QKV, flat
    frame x refine scan) already removed the per-op dispatch latency these
    kernels were written to hide. Kept as a parity-pinned opt-in for
    configs where XLA scheduling regresses. Returns the mode name or
    None (off)."""
    import os
    import warnings

    global _INTERPRET
    v = os.environ.get("OGT_PALLAS_DECODE", "")
    if v in ("", "0", "false"):
        return None  # leaves a manually-set _INTERPRET (tests) untouched
    if v.startswith("interpret"):
        _INTERPRET = True
        v = v.split(":", 1)[1] if ":" in v else "full"
    else:
        # Two-way for explicit modes: a process that earlier traced in
        # interpret mode must not silently keep interpreting.
        _INTERPRET = False
        if jax.default_backend() != "tpu":
            return None
    v = "full" if v == "1" else v
    if v in _MODES:
        return v
    if v not in ("", "0", "false"):
        # Unknown values DISABLE the opt-in kernels (never silently
        # enable a mode the user didn't ask for) but say so once.
        warnings.warn(
            f"OGT_PALLAS_DECODE={v!r} is not one of {_MODES}; "
            "fused decode kernels stay OFF"
        )
    return None


def enabled() -> bool:
    return mode() is not None


def refine_block_supported(d_inp, space_hid, time_hid, d_out, heads_s,
                           heads_t, bias, t_max, hid_dim,
                           t_chunk: int = 8) -> bool:
    """Static dispatch check: uniform width (identity skips), no QKV
    biases, single-conv FFN, equal head counts, chunk-aligned horizon,
    and a lane-aligned channel width."""
    return (
        d_inp == space_hid == time_hid == d_out
        and heads_s == heads_t
        and not bias
        and hid_dim is None
        and t_max % t_chunk == 0
        and d_inp % 128 == 0
    )
