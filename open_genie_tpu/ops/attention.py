"""Scaled dot-product attention: XLA reference path + Pallas dispatch.

TPU-native replacement for the reference's torch SDPA call
(`/root/reference/genie/module/attention.py:229-234`). The XLA path is a
plain einsum-softmax-einsum which XLA fuses well at the sequence lengths this
framework runs (spatial attention over <= 4096 tokens, temporal over <= 64);
for long sequences a Pallas flash-attention kernel
(`open_genie_tpu.ops.pallas.flash_attention`) is selected automatically.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Sequence length above which the Pallas flash kernel is used. Measured on
# v5e: XLA's attention fwd is ~15% faster at 4096, but under `grad` it
# stores the (N, N) probability matrix as a residual (8.6 GB for the
# latent-action model's 4096-token spatial attention -> HBM OOM); the flash
# kernel's residuals are O(N), so it wins where training memory matters.
# 1024 covers the stock 64x64-at-f8 spatial grid; non-block-multiple
# lengths are handled by the kernel's pad+key-mask path.
_FLASH_MIN_SEQ = 1024


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention over `(B, H, N, D)` tensors.

    Args:
      q: queries `(B, H, Nq, D)`.
      k/v: keys/values `(B, H, Nk, D)`.
      scale: softmax scale; defaults to `D ** -0.5`.
      causal: apply a lower-triangular causal mask (Nq == Nk required).
      mask: optional boolean mask broadcastable to `(B, H, Nq, Nk)`; True
        means "attend".
      use_flash: force (True) / forbid (False) the Pallas kernel; None picks
        automatically based on sequence length and platform.
    """
    d = q.shape[-1]
    nq, nk = q.shape[-2], k.shape[-2]
    if scale is None:
        scale = d ** -0.5

    if use_flash is None:
        from open_genie_tpu.utils import is_tpu_backend

        use_flash = (
            mask is None
            and nq >= _FLASH_MIN_SEQ
            and nq == nk
            and is_tpu_backend()
        )
    if use_flash:
        from open_genie_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, causal=causal)

    return _xla_attention(q, k, v, scale=scale, causal=causal, mask=mask)


def _xla_attention(q, k, v, scale, causal=False, mask=None):
    orig_dtype = q.dtype
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale

    if causal:
        nq, nk = logits.shape[-2], logits.shape[-1]
        # Align the causal diagonal to the *end* of the key sequence so that
        # queries may attend to earlier keys when nk > nq (decode-style).
        row = jnp.arange(nq)[:, None] + (nk - nq)
        col = jnp.arange(nk)[None, :]
        causal_mask = col <= row
        logits = jnp.where(causal_mask, logits, -jnp.inf)

    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...qk,...kd->...qd",
        probs.astype(orig_dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
