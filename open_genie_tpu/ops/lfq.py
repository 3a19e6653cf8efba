"""Lookup-Free Quantization (LFQ) ops, TPU-first.

Re-implements the math of the reference `LookupFreeQuantization`
(`/root/reference/genie/module/quantization.py:32-133`, MagViT-2 Eq. 3) with
a key algorithmic upgrade: the reference materializes a `(B*N, 2^d)` logit
matrix against the full codebook to compute its entropy losses -- at the
default `d=18` that is a 262144-way softmax per token, the hottest non-conv
op in tokenizer training. Here:

  * The **per-sample entropy** is computed in closed form: the softmax over
    all `2^d` sign codewords factorizes into `d` independent Bernoullis with
    `p_i = sigmoid(4 * beta * x_i)`, so the entropy is the sum of `d` binary
    entropies -- O(d) instead of O(2^d) per token, exact.
  * The **batch-average (diversity) entropy** does not factorize (a mixture
    of products is not a product), so it is computed blockwise over codebook
    chunks with rematerialization: the per-sample log-normalizer also has a
    closed form `logZ = sum_i log(2 cosh(2 beta x_i))`, so each chunk is a
    single matmul + exp, and the full `(B*N, 2^d)` matrix never exists in
    HBM.

Sign convention matches the reference: bit i of the code index is 1 iff
`x_i > 0`, with `bit_mask = 2^(d-1..0)` (MSB = first feature).

Note on intended-vs-reference semantics: the reference *adds* the average
entropy to the loss (`quantization.py:125`), which would penalize codebook
diversity; MagViT-2 and the survey's intended semantics subtract it. This
implementation returns both terms separately and the module layer combines
them as `sample_entropy - diversity_weight * avg_entropy`.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Codebook sizes up to this bound use the direct (single-matmul) path; above
# it the chunked path streams over the codebook.
_DIRECT_MAX_CODES = 4096
_CHUNK = 4096


def bit_mask(codebook_dim: int) -> jnp.ndarray:
    """`(d,)` powers of two, MSB-first: `[2^(d-1), ..., 2, 1]`."""
    return jnp.asarray(2 ** jnp.arange(codebook_dim - 1, -1, -1), dtype=jnp.int32)


def codebook_entries(idxs: jnp.ndarray, codebook_dim: int) -> jnp.ndarray:
    """Map integer code indices to their `{-1, +1}^d` codewords."""
    bits = (idxs[..., None] & bit_mask(codebook_dim)) != 0
    return 2.0 * bits.astype(jnp.float32) - 1.0


def lfq_quantize(
    x: jnp.ndarray, codebook_dim: int, training: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sign-quantize `(..., d)` features; return (code, indices).

    When `training`, the straight-through estimator routes gradients around
    the sign: `code = x + stop_grad(sign(x) - x)`.
    """
    # NOT jnp.sign: sign(0) = 0 would emit a codeword outside {-1,+1}^d
    # that the commit loss then actively pins at 0 (a zero-attractor), and
    # it would disagree with the `x > 0` bit convention of `idxs`. Exact
    # zeros do occur under bf16 activations.
    quant = jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)
    idxs = jnp.sum(
        (x > 0).astype(jnp.int32) * bit_mask(codebook_dim), axis=-1
    )
    if training:
        code = x + lax.stop_gradient(quant - x)
    else:
        code = quant
    return code, idxs


def lfq_sample_entropy(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """Exact per-sample codeword entropy, closed form, O(d).

    `p(c) ∝ exp(2 beta <x, c>)` over `c ∈ {-1,+1}^d` factorizes per bit with
    `p_i(+1) = sigmoid(4 beta x_i)`; the entropy is the sum of binary
    entropies. Returns the mean over all leading axes (scalar).
    """
    a = 4.0 * beta * x.astype(jnp.float32)
    # Binary entropy of sigmoid(a): softplus(-a)*sigmoid(a) + softplus(a)*sigmoid(-a)
    # written stably as softplus(a) - a * sigmoid(a).
    ent_bits = jax.nn.softplus(a) - a * jax.nn.sigmoid(a)
    return jnp.mean(jnp.sum(ent_bits, axis=-1))


def _log_normalizer(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """`logZ = sum_i log(2 cosh(2 beta x_i))`, numerically stable."""
    a = 2.0 * beta * x
    return jnp.sum(jnp.abs(a) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(a))), axis=-1)


def lfq_avg_probs_direct(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """Batch-averaged codeword distribution `(2^d,)` -- direct path.

    `x` is `(n, d)`. Materializes the full `(n, 2^d)` softmax; only used for
    small codebooks (e.g. the d=8 action codebook) and as the test oracle.
    """
    n, d = x.shape
    codes = codebook_entries(jnp.arange(2 ** d), d)  # (2^d, d)
    # HIGHEST: the softmax subtracts a same-magnitude max from O(beta*d)
    # logits; at the TPU default (one bf16 pass) the cancellation error
    # reaches the exponent and fabricates probability mass (see
    # ops/pallas/lfq_entropy.py for the measured failure).
    logits = 2.0 * beta * jnp.matmul(
        x.astype(jnp.float32), codes.T, precision=lax.Precision.HIGHEST
    )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.mean(probs, axis=0)


def lfq_avg_entropy(
    x: jnp.ndarray, beta: float = 100.0, eps: float = 1e-6
) -> jnp.ndarray:
    """Entropy of the batch-averaged codeword distribution (scalar).

    `x` is `(n, d)` (flatten leading axes first). Small codebooks use one
    direct matmul; large codebooks stream over codebook chunks -- via the
    Pallas kernel (with its exact custom gradient) on TPU, or a rematerial-
    ized `lax.map` elsewhere.
    """
    n, d = x.shape
    num_codes = 2 ** d
    if num_codes <= _DIRECT_MAX_CODES:
        q = lfq_avg_probs_direct(x, beta)
        return -jnp.sum(q * jnp.log(jnp.maximum(q, eps)))
    from open_genie_tpu.utils import is_tpu_backend

    if is_tpu_backend():
        from open_genie_tpu.ops.pallas.lfq_entropy import lfq_avg_entropy_pallas

        return lfq_avg_entropy_pallas(x, beta, eps)
    return _lfq_avg_entropy_chunked(x, beta, eps)


def _lfq_avg_entropy_chunked(
    x: jnp.ndarray, beta: float, eps: float
) -> jnp.ndarray:
    """Streaming avg-distribution entropy for large codebooks.

    Two facts make this cheap: the per-sample normalizer is closed-form (no
    first pass over the codebook needed), and the entropy is a sum over
    codewords, so we accumulate `-q_j log q_j` chunk by chunk. Each chunk is
    one `(n, chunk)` matmul; `jax.checkpoint` keeps backward memory at one
    chunk as well.
    """
    n, d = x.shape
    num_codes = 2 ** d
    chunk = min(_CHUNK, num_codes)
    num_chunks = num_codes // chunk
    xf = x.astype(jnp.float32)
    log_z = _log_normalizer(xf, beta)  # (n,)
    mask = bit_mask(d)

    @jax.checkpoint
    def chunk_entropy(start):
        idxs = start + jnp.arange(chunk)
        codes = 2.0 * ((idxs[:, None] & mask) != 0).astype(jnp.float32) - 1.0
        # HIGHEST: log_p is the near-total cancellation of two
        # O(beta*sum|x|) terms (see ops/pallas/lfq_entropy.py).
        log_p = 2.0 * beta * jnp.matmul(
            xf, codes.T, precision=lax.Precision.HIGHEST
        ) - log_z[:, None]  # (n, chunk)
        q = jnp.mean(jnp.exp(log_p), axis=0)  # (chunk,)
        return -jnp.sum(q * jnp.log(jnp.maximum(q, eps)))

    starts = jnp.arange(num_chunks) * chunk
    ents = lax.map(chunk_entropy, starts)
    return jnp.sum(ents)


def lfq_bit_entropy(x: jnp.ndarray) -> jnp.ndarray:
    """Factorized codebook-usage monitor: `sum_b H(mean(x_b > 0))` in nats.

    The hard positive-bit rates give an O(d) *upper bound* on the entropy of
    the empirical code distribution (equality iff bits are independent).
    Max = d*ln2. A collapsed codebook reads ~0. Metric only (no gradient:
    the rates are step functions of `x`). With multiple codebooks, call per
    sub-codebook and average (see `lfq_loss`): pooling codebooks as samples
    hides opposite per-codebook collapses that cancel in the pooled rates.
    """
    p = jnp.mean((x.reshape(-1, x.shape[-1]) > 0).astype(jnp.float32), axis=0)
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    return -jnp.sum(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))


def lfq_bit_balance_loss(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Scale-adaptive per-bit balance + decorrelation regularizer (scalar).

    The round-4 flagship anti-collapse objective. The reference's entropy
    objective (`quantization.py:113-125`) is computed at `beta=100`, where
    every sample's codeword softmax is one-hot: its gradient is numerically
    zero at the trained feature scale, so it can neither prevent nor undo a
    codebook collapse -- measured three times on-chip (PARITY.md round 4):
    healthy diversity for thousands of steps, then every token flips to one
    code within ~200 steps and the state is absorbing.

    This term replaces it with two always-live penalties on `y = tanh(x /
    rms(x))` (the global-RMS normalization makes it invariant to the feature
    scale, so it never saturates no matter where training drives `|x|`):

      * balance: `mean_b (mean_n y)^2` -- every bit 50/50 across the batch.
      * decorrelation: mean squared off-diagonal correlation of `y` --
        balanced bits that co-flip span 2 codes, not 2^d; pushing pairwise
        correlations to 0 pushes the factorized usage bound
        (`lfq_bit_entropy`) toward tightness.

    Balanced + pairwise-decorrelated bits give empirical code entropy close
    to `d*ln2`; in a collapsed state the balance gradient is large and
    restoring (tanh of an RMS-normalized constant pattern is +-0.76 per bit,
    nowhere near the flat tails).
    """
    d = x.shape[-1]
    flat = x.reshape(-1, d).astype(jnp.float32)
    n = flat.shape[0]
    rms = jnp.sqrt(jnp.mean(flat * flat) + eps)
    y = jnp.tanh(flat / rms)
    mean_b = jnp.mean(y, axis=0)  # (d,)
    balance = jnp.mean(mean_b**2)
    yc = y - mean_b
    cov = jnp.matmul(yc.T, yc, precision=lax.Precision.HIGHEST) / n
    var = jnp.diagonal(cov)
    corr = cov / jnp.sqrt(var[:, None] * var[None, :] + eps)
    off = corr - jnp.diag(jnp.diagonal(corr))
    decorr = jnp.sum(off**2) / (d * max(d - 1, 1))
    return balance + decorr


def lfq_loss(
    x: jnp.ndarray,
    quant: jnp.ndarray,
    beta: float = 100.0,
    commit_weight: float = 0.25,
    entropy_weight: float = 0.1,
    diversity_weight: float = 1.0,
    frac_sample: float = 1.0,
    num_codebooks: int = 1,
    entropy_scale=1.0,
    bit_balance_scale=1.0,
    bit_balance_weight: float = 0.0,
) -> Tuple[jnp.ndarray, dict]:
    """Full LFQ training loss on `(..., [c,] d)` pre-quantization features.

    Returns `(loss, aux)` where aux holds the individual terms. `quant` is
    the sign-quantized target for the commitment MSE (gradients blocked).

    With `num_codebooks > 1` the diversity entropy is computed per
    sub-codebook and averaged, matching the reference's per-codebook
    averaging (`quantization.py:119-123`).

    `frac_sample < 1` subsamples (strided) the tokens entering the
    *diversity* entropy -- the O(n * 2^d) term -- which the reference
    declares but never implements (`quantization.py:60`, SURVEY 2.11.7).
    The closed-form per-sample entropy is O(n * d) and always exact.

    `entropy_scale` (python float or traced scalar) multiplies the whole
    entropy objective: the anneal-to-zero lever. The entropy terms exist
    to ESTABLISH a diverse codebook; once established, usage is held up by
    the reconstruction gradient, while the diversity reward keeps pushing
    the encoder toward the saturation cliff where flagship training
    collapsed to a single code (measured twice on-chip, round 4 -- healthy
    to ~step 13k, then entropy -> exact 0 within 200 steps). Annealing to
    0 removes the hazard and frees late training to optimize pure
    reconstruction. The aux metrics stay UNSCALED so collapse remains
    visible in logs after the objective is off.
    """
    d = x.shape[-1]
    flat = x.reshape(-1, d)

    def per_codebook_mean(fn):
        # With num_codebooks > 1, pooling codebooks as samples is blind to
        # opposite per-codebook imbalances (codebook A stuck at +1 and B at
        # -1 on the same bit reads as balanced); mirror the diversity-entropy
        # branch and average the statistic over sub-codebooks instead.
        if num_codebooks <= 1:
            return fn(flat)
        per_cb = x.reshape(-1, num_codebooks, d)
        return jnp.mean(
            jnp.stack([fn(per_cb[:, c]) for c in range(num_codebooks)])
        )

    sample_ent = lfq_sample_entropy(flat, beta)

    def subsample(v):
        if frac_sample >= 1.0:
            return v
        n = v.shape[0]
        k = max(1, int(n * frac_sample))
        stride = max(1, n // k)
        return v[::stride][:k]

    commit_loss = jnp.mean(
        (x.astype(jnp.float32) - lax.stop_gradient(quant.astype(jnp.float32)))
        ** 2
    )
    loss = commit_weight * commit_loss
    aux = {
        "sample_entropy": sample_ent,
        "commit_loss": commit_loss,
        # Always-on O(d) collapse monitor (factorized usage bound, nats).
        "bit_entropy": per_codebook_mean(lfq_bit_entropy),
    }

    # `entropy_weight == 0.0` (a static python float in every config path)
    # skips the diversity-entropy sweep entirely -- at d=18 that is a
    # 262144-codeword pass per step, the hottest non-conv op in tokenizer
    # training, and its gradient is numerically dead at beta=100 anyway
    # (see lfq_bit_balance_loss).
    if entropy_weight != 0.0:
        if num_codebooks > 1:
            per_cb = x.reshape(-1, num_codebooks, d)
            avg_ent = jnp.mean(
                jnp.stack([
                    lfq_avg_entropy(subsample(per_cb[:, c]), beta)
                    for c in range(num_codebooks)
                ])
            )
        else:
            avg_ent = lfq_avg_entropy(subsample(flat), beta)
        entropy_loss = (sample_ent - diversity_weight * avg_ent) * entropy_scale
        loss = loss + entropy_weight * entropy_loss
        aux["avg_entropy"] = avg_ent

    if bit_balance_weight != 0.0:
        bal = per_codebook_mean(lfq_bit_balance_loss)
        # `bit_balance_scale` (python float or traced scalar) multiplies
        # the objective only -- the anneal-to-floor lever. At convergence
        # the balance term sits 2-3x above the rec loss (measured r05
        # flagship: bal~0.02-0.03 vs rec~0.011), competing with
        # reconstruction once the codebook is established; annealing to a
        # small floor keeps a weak restoring force while freeing late
        # training to optimize reconstruction. The static ==1.0 fast path
        # keeps the default jaxpr (and compile-cache keys) byte-identical.
        if isinstance(bit_balance_scale, (int, float)) and bit_balance_scale == 1.0:
            loss = loss + bit_balance_weight * bal
        else:
            loss = loss + bit_balance_weight * bal * bit_balance_scale
        aux["bit_balance"] = bal  # unscaled: collapse stays visible

    return loss, aux
