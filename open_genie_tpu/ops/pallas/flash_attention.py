"""Flash attention Pallas kernels (TPU): fwd + bwd with O(N) memory.

Used by `open_genie_tpu.ops.attention.dot_product_attention` for long
sequences (the latent-action spatial attention runs 4096 tokens per frame).
XLA's attention stores the (N, N) probability matrix as a backward residual
(8.6 GB for that model -> HBM OOM at training resolution); here the forward
saves only (q, k, v, out, logsumexp) and the backward recomputes probability
tiles blockwise, so peak memory is O(N * block).

Forward: canonical online-softmax tiling over (batch*heads, q-blocks,
k-blocks) with f32 accumulators in VMEM; also emits the per-row logsumexp.

Backward (standard flash-attention math):
  delta_i = rowsum(dout_i * out_i)
  p_ij    = exp(s * q_i k_j - lse_i)            (recomputed per tile)
  dv_j    = sum_i p_ij dout_i
  ds_ij   = p_ij * (dout_i v_j - delta_i)
  dq_i    = s * sum_j ds_ij k_j
  dk_j    = s * sum_i ds_ij q_i
split into a dk/dv kernel (grid over k-blocks, accumulating over q-blocks)
and a dq kernel (grid over q-blocks, accumulating over k-blocks).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at (8,4,4096,64) f32 fwd+bwd: (512,1024) 672ms,
# (256,256) 730ms, (512,512) 756ms, (1024,512) 773ms; XLA attention
# 1126ms (and O(N^2) residuals).
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e30


# --------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------- #

def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    kv_len: int = 0,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    should_run = True
    if causal:
        should_run = kj * block_k <= qi * block_q + block_q - 1

    @pl.when(should_run)
    def _compute():
        # Keep bf16 operands ON the MXU (bf16 x bf16 -> f32 accumulate is
        # its native fast path); upcasting to f32 first would force slow
        # f32 MXU passes. f32 inputs stay f32 throughout.
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        if causal or kv_len:
            cols = kj * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = jnp.full((block_q, block_k), True)
            if causal:
                rows = qi * block_q + lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                keep &= cols <= rows
            if kv_len:  # padded keys past kv_len must not enter the softmax
                keep &= cols < kv_len
            s = jnp.where(keep, s, _NEG_INF)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = corr * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        acc_ref[:] = acc_ref[:] * corr + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == nk - 1)
    def _epilogue():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_ref[:, :1] + jnp.log(l)).astype(lse_ref.dtype)


def _flash_forward(
    q, k, v, scale, causal, block_q, block_k, interpret, kv_len=0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bh, nq, d = q.shape
    nk = k.shape[1]
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    assert nq % block_q == 0 and nk % block_k == 0, (
        f"seq lengths ({nq}, {nk}) must tile by ({block_q}, {block_k})"
    )

    grid = (bh, nq // block_q, nk // block_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=kv_len,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            # (bh, nq, 1): trailing block dims (block_q, 1) satisfy the
            # TPU (8, 128)-or-full tiling rule.
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


# --------------------------------------------------------------------- #
# Backward
# --------------------------------------------------------------------- #

def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    kv_len: int = 0,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    should_run = True
    if causal:
        # q block contributes to this k block iff any row i >= col j.
        should_run = qi * block_q + block_q - 1 >= kj * block_k

    @pl.when(should_run)
    def _compute():
        # bf16 operands stay bf16 on the MXU (f32 accumulate); recomputed
        # probability/ds tiles are cast back down for their matmuls.
        q = q_ref[0]                          # (bq, d)
        k = k_ref[0]                          # (bk, d)
        v = v_ref[0]                          # (bk, d)
        do = do_ref[0]                        # (bq, d)
        lse = lse_ref[0]                      # (bq, 1)
        delta = delta_ref[0]                  # (bq, 1)

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                            # (bq, bk)
        if causal or kv_len:
            cols = kj * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = jnp.full((block_q, block_k), True)
            if causal:
                rows = qi * block_q + lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                keep &= cols <= rows
            if kv_len:
                keep &= cols < kv_len
            s = jnp.where(keep, s, _NEG_INF)

        p = jnp.exp(s - lse)                 # (bq, bk)
        # dv_j += p^T dout
        dv_acc[:] += lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # (bq, bk)
        ds = p * (dp - delta)
        # dk_j += s * ds^T q
        dk_acc[:] += scale * lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _emit():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    kv_len: int = 0,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    should_run = True
    if causal:
        should_run = kj * block_k <= qi * block_q + block_q - 1

    @pl.when(should_run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal or kv_len:
            cols = kj * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = jnp.full((block_q, block_k), True)
            if causal:
                rows = qi * block_q + lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                keep &= cols <= rows
            if kv_len:
                keep &= cols < kv_len
            s = jnp.where(keep, s, _NEG_INF)

        p = jnp.exp(s - lse)
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_acc[:] += scale * lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == n_k - 1)
    def _emit():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_backward(q, k, v, out, lse, do, scale, causal, block_q, block_k,
                    interpret, kv_len=0):
    bh, nq, d = q.shape
    nk = k.shape[1]
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # (bh, nq, 1)

    in_specs = [
        pl.BlockSpec((1, block_q, d), None),   # q     (index_map set below)
        pl.BlockSpec((1, block_k, d), None),   # k
        pl.BlockSpec((1, block_k, d), None),   # v
        pl.BlockSpec((1, block_q, d), None),   # dout
        pl.BlockSpec((1, block_q), None),      # lse
        pl.BlockSpec((1, block_q), None),      # delta
    ]

    # dk/dv: grid (bh, k-blocks, q-blocks)
    kv_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
        ),
        grid=(bh, nk // block_k, nq // block_q),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # dq: grid (bh, q-blocks, k-blocks)
    q_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
        ),
        grid=(bh, nq // block_q, nk // block_k),
        in_specs=q_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    return dq, dk, dv


# --------------------------------------------------------------------- #
# custom-vjp wrapper
# --------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, scale, causal, interpret, block_q, block_k, kv_len):
    out, _ = _flash_forward(
        q, k, v, scale, causal, block_q, block_k, interpret, kv_len
    )
    return out


def _flash_fwd(q, k, v, scale, causal, interpret, block_q, block_k, kv_len):
    out, lse = _flash_forward(
        q, k, v, scale, causal, block_q, block_k, interpret, kv_len
    )
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, causal, interpret, block_q, block_k, kv_len, res, g):
    q, k, v, out, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, out, lse, g, scale, causal,
        block_q, block_k, interpret, kv_len,
    )
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention over `(B, H, N, D)` tensors (self-attention shapes).

    O(N) residual memory in training (q, k, v, out, lse); probability tiles
    are recomputed blockwise in both kernels.

    Arbitrary sequence lengths are supported: q/k/v are zero-padded up to
    the block grid and padded *keys* are masked out of the softmax inside
    the kernels (`kv_len`); padded query rows are sliced off (their
    cotangents arrive as zeros, so gradients stay exact). Block sizes
    shrink to fit short sequences.
    """
    b, h, n, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        from open_genie_tpu.utils import is_tpu_backend

        interpret = not is_tpu_backend()

    # Shrink blocks toward short sequences (128-lane granularity), then pad
    # the sequence up to the block grid.
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(nk, 128))
    n_pad = _round_up(n, bq)
    nk_pad = _round_up(nk, bk)
    kv_len = nk if nk_pad != nk else 0  # 0 = no key masking needed

    fold = lambda t: t.reshape(b * h, t.shape[2], d)
    qf, kf, vf = fold(q), fold(k), fold(v)
    if n_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - n), (0, 0)))
    if nk_pad != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - nk), (0, 0)))

    out = _flash(qf, kf, vf, float(scale), causal, interpret, bq, bk, kv_len)
    return out[:, :n].reshape(b, h, n, d)
