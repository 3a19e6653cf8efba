"""Pallas kernel: LFQ batch-average (diversity) entropy over 2^d codewords.

The MagViT-2 LFQ diversity term needs `H(mean_b softmax(2*beta*<x_b, c>))`
over all `2^d` sign codewords -- the reference materializes a `(B*N, 2^18)`
logit matrix in HBM (`/root/reference/genie/module/quantization.py:116-125`),
its hottest non-conv op. This kernel streams over (token-block, code-chunk)
tiles: codewords are generated in-register from the chunk index (bit tricks,
never stored), the per-sample normalizer is the closed form
`logZ_b = sum_i log(2 cosh(2 beta x_bi))` (no first pass), and only the
`(2^d,)` average-probability vector ever exists in memory.

Backward is a second kernel using the exact gradient
  dH/dx_bi = (2*beta/n) * (tanh(2*beta*x_bi) * S_b - T_bi)
  S_b = sum_j p_bj * w_j,  T_bi = sum_j p_bj * w_j * c_ji,
  w_j = 1 + log(max(q_j, eps))  (0 where q_j < eps, matching the clamp)
so nothing is rematerialized at O(n * 2^d) in HBM either.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TOKEN_BLOCK = 512
DEFAULT_CODE_CHUNK = 1024


def _chunk_codes(j: jnp.ndarray, chunk: int, d: int) -> jnp.ndarray:
    """Generate the `(chunk, d)` {-1,+1} codewords of code-chunk `j`."""
    idxs = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, d), 0)
    shifts = (d - 1) - jax.lax.broadcasted_iota(jnp.int32, (chunk, d), 1)
    bits = (idxs >> shifts) & 1
    return (2 * bits - 1).astype(jnp.float32)


def _fwd_kernel(x_ref, logz_ref, q_ref, q_acc, *, beta, chunk, d, n_total):
    i = pl.program_id(1)  # token block
    j = pl.program_id(0)  # code chunk
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        q_acc[:] = jnp.zeros_like(q_acc)

    x = x_ref[:].astype(jnp.float32)  # (bn, d)
    logz = logz_ref[:].astype(jnp.float32)  # (bn, 1)
    codes = _chunk_codes(j, chunk, d)  # (chunk, d)

    # HIGHEST precision is load-bearing: `2*beta*<x,c>` and `logZ` are both
    # O(beta * sum|x|) (thousands at trained |x|~1) and the TRUE logit is
    # their near-total cancellation. The TPU default matmul precision
    # (single bf16 pass) leaves ~0.4% relative error in <x,c>, i.e. O(10)
    # absolute error in the exponent -- e^10 inflation of p, negative
    # "entropies" (measured -32k on-chip at scale 3), and anti-correlated
    # gradients (cos -0.95) that collapsed the round-4 flagship codebook at
    # step ~2300.
    logits = 2.0 * beta * jax.lax.dot_general(
        x, codes, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ) - logz  # (bn, chunk)
    q_acc[:] += jnp.sum(jnp.exp(logits), axis=0, keepdims=True).T  # (chunk,1)

    @pl.when(i == n_i - 1)
    def _emit():
        q_ref[:] = q_acc[:] / n_total


def _bwd_kernel(x_ref, logz_ref, w_ref, dx_ref, st_acc, *, beta, chunk, d):
    i = pl.program_id(0)  # token block
    j = pl.program_id(1)  # code chunk
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        st_acc[:] = jnp.zeros_like(st_acc)

    x = x_ref[:].astype(jnp.float32)  # (bn, d)
    logz = logz_ref[:].astype(jnp.float32)  # (bn, 1)
    w = w_ref[:].astype(jnp.float32)  # (chunk, 1)
    codes = _chunk_codes(j, chunk, d)  # (chunk, d)

    # HIGHEST precision: see _fwd_kernel -- the logit is a near-total
    # cancellation of two O(beta*sum|x|) terms.
    logits = 2.0 * beta * jax.lax.dot_general(
        x, codes, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ) - logz
    p = jnp.exp(logits)  # (bn, chunk)
    pw = p * w.T  # (bn, chunk)

    # st_acc[:, :d] accumulates T, st_acc[:, d:d+1] accumulates S.
    st_acc[:, :d] += jax.lax.dot_general(
        pw, codes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    st_acc[:, d : d + 1] += jnp.sum(pw, axis=1, keepdims=True)

    @pl.when(j == n_j - 1)
    def _emit():
        s = st_acc[:, d : d + 1]
        t = st_acc[:, :d]
        m = jnp.tanh(2.0 * beta * x)
        dx_ref[:] = 2.0 * beta * (m * s - t)


def _log_normalizer(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    a = 2.0 * beta * x
    return jnp.sum(jnp.abs(a) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(a))), axis=-1)


def _pad_tokens(x: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        # Padded rows get q-contribution ~uniform; we zero them out by
        # giving them +inf logZ (=> exp(-inf) = 0 contribution).
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    return x, pad


def _avg_probs_fwd(x, beta, token_block, code_chunk, interpret):
    n, d = x.shape
    num_codes = 2 ** d
    code_chunk = min(code_chunk, num_codes)
    xp, pad = _pad_tokens(x.astype(jnp.float32), token_block)
    np_ = xp.shape[0]
    logz = _log_normalizer(x.astype(jnp.float32), beta)
    if pad:
        logz = jnp.concatenate([logz, jnp.full((pad,), jnp.inf)], 0)
    logz = logz[:, None]

    grid = (num_codes // code_chunk, np_ // token_block)
    q = pl.pallas_call(
        functools.partial(
            _fwd_kernel, beta=float(beta), chunk=code_chunk, d=d, n_total=float(n)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((token_block, d), lambda j, i: (i, 0)),
            pl.BlockSpec((token_block, 1), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((code_chunk, 1), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((num_codes, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((code_chunk, 1), jnp.float32)],
        interpret=interpret,
    )(xp, logz)
    return q[:, 0]


def _grad_x(x, w, beta, token_block, code_chunk, interpret):
    n, d = x.shape
    num_codes = 2 ** d
    code_chunk = min(code_chunk, num_codes)
    xp, pad = _pad_tokens(x.astype(jnp.float32), token_block)
    np_ = xp.shape[0]
    logz = _log_normalizer(x.astype(jnp.float32), beta)
    if pad:
        logz = jnp.concatenate([logz, jnp.full((pad,), jnp.inf)], 0)
    logz = logz[:, None]

    grid = (np_ // token_block, num_codes // code_chunk)
    dx = pl.pallas_call(
        functools.partial(
            _bwd_kernel, beta=float(beta), chunk=code_chunk, d=d
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((token_block, d), lambda i, j: (i, 0)),
            pl.BlockSpec((token_block, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((code_chunk, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((token_block, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((token_block, d + 1), jnp.float32)],
        interpret=interpret,
    )(xp, logz, w[:, None])
    return dx[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def lfq_avg_entropy_pallas(
    x: jnp.ndarray,
    beta: float = 100.0,
    eps: float = 1e-6,
    token_block: int = DEFAULT_TOKEN_BLOCK,
    code_chunk: int = DEFAULT_CODE_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Entropy of the batch-averaged LFQ codeword distribution (scalar).

    `x` is `(n, d)` pre-quantization features. Matches
    `ops.lfq.lfq_avg_entropy` numerically; use on TPU for large `2^d`.
    """
    q = _avg_probs_fwd(x, beta, token_block, code_chunk, interpret)
    return -jnp.sum(q * jnp.log(jnp.maximum(q, eps)))


def _fwd(x, beta, eps, token_block, code_chunk, interpret):
    q = _avg_probs_fwd(x, beta, token_block, code_chunk, interpret)
    ent = -jnp.sum(q * jnp.log(jnp.maximum(q, eps)))
    return ent, (x, q)


def _bwd(beta, eps, token_block, code_chunk, interpret, res, g):
    x, q = res
    n = x.shape[0]
    # H = -sum_j q_j log(max(q_j, eps)); dH/dq_j = -w_j with
    # w_j = 1 + log(q_j) above the clamp, log(eps) below it (the clamped
    # log contributes no gradient, matching jnp.maximum's subgradient).
    w = jnp.where(q > eps, 1.0 + jnp.log(jnp.maximum(q, eps)), jnp.log(eps))
    # dH/dx = (2*beta/n) * (tanh(2*beta*x) * S - T); the kernel returns the
    # parenthesized quantity scaled by 2*beta.
    dx = _grad_x(x, w, beta, token_block, code_chunk, interpret) / n
    return ((g * dx).astype(x.dtype),)


lfq_avg_entropy_pallas.defvjp(_fwd, _bwd)
