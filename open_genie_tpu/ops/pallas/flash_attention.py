"""Flash attention Pallas kernel (TPU) with online softmax.

Used by `open_genie_tpu.ops.attention.dot_product_attention` for long
sequences (spatial attention over large grids). Canonical tiling: the grid
iterates (batch*heads, q-blocks, k-blocks); an f32 accumulator plus running
max/denominator live in VMEM scratch, and the epilogue writes the normalized
block. Causal masking skips fully-masked k-blocks.

The backward pass recomputes attention with the XLA path (O(N^2) memory in
the backward only) via `jax.custom_vjp`; a fused Pallas backward is a
planned perf-pass item. Forward-only consumers (the MaskGIT rollout, the
tokenize path) never hit the backward.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref,
    acc_ref, m_ref, l_ref,
    *, scale: float, causal: bool, block_q: int, block_k: int, seq_k: int,
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
        # q block rows span [qi*bq, qi*bq + bq); k cols [kj*bk, ...).
        should_run = kj * block_k <= qi * block_q + block_q - 1

    @pl.when(should_run)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (bq, d)
        k = k_ref[0].astype(jnp.float32)  # (bk, d)
        v = v_ref[0].astype(jnp.float32)  # (bk, d)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)

        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(cols <= rows, s, _NEG_INF)

        m_prev = m_ref[:, :1]  # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)  # (bq, bk)
        correction = jnp.exp(m_prev - m_new)  # (bq, 1)
        l_new = correction * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == nk - 1)
    def _epilogue():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _flash_forward(
    q, k, v, scale: float, causal: bool,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
):
    """q, k, v: (BH, N, D) -> (BH, N, D)."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    assert nq % block_q == 0 and nk % block_k == 0, (
        f"seq lengths ({nq}, {nk}) must tile by ({block_q}, {block_k})"
    )

    grid = (bh, nq // block_q, nk // block_k)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, seq_k=nk,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _xla_reference(q, k, v, scale, causal):
    logits = jnp.einsum(
        "bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if causal:
        nq, nk = logits.shape[-2], logits.shape[-1]
        row = jnp.arange(nq)[:, None] + (nk - nq)
        mask = jnp.arange(nk)[None, :] <= row
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, causal, interpret):
    return _flash_forward(q, k, v, scale, causal, interpret=interpret)


def _flash_fwd(q, k, v, scale, causal, interpret):
    out = _flash_forward(q, k, v, scale, causal, interpret=interpret)
    return out, (q, k, v)


def _flash_bwd(scale, causal, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, scale, causal), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention over `(B, H, N, D)` tensors (self-attention shapes)."""
    b, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    fold = lambda t: t.reshape(b * h, t.shape[2], d)
    out = _flash(fold(q), fold(k), fold(v), float(scale), causal, interpret)
    return out.reshape(b, h, n, d)
