"""Attention stack (Flax): core, spatial, temporal, factorized space-time.

TPU-native equivalents of `/root/reference/genie/module/attention.py`.
Factorized space-time attention keeps cost at `O(T * (HW)^2 + HW * T^2)`
instead of `O((THW)^2)` -- the reference's (and Genie paper's) architectural
sequence-scaling mechanism -- and both factors map onto large batched
matmuls: spatial attention batches over (B*T), temporal over (B*H*W).

Divergences from the reference (intended semantics, see SURVEY.md 2.11):
  * QKV/out projections are always learned `Dense` layers. The reference
    silently replaces them with `Identity` when dims already match
    (`attention.py:127-129`), which leaves its default transformer blueprints
    with *no* learned attention parameters at all.
  * softmax scale defaults to the standard `d_head ** -0.5` (the reference's
    `n_head * d_head ** -0.5` is a precedence bug, `attention.py:195`).
  * `n_embd` is accepted as an alias for `d_inp`/`d_out` on
    `SpaceTimeAttention` (stale-API fix, SURVEY 2.11.5).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from open_genie_tpu.ops.attention import dot_product_attention
from open_genie_tpu.ops.rope import apply_rope, rope_frequencies
from open_genie_tpu.utils import default


class Attention(nn.Module):
    """Pre-LayerNorm multi-head attention over `(B, N, C)` sequences.

    Optional RoPE (`rope_kind` in {'1d', '2d'}) is applied to the *input*
    sequence before the norm and QKV projection, matching the reference's
    `self.embed(qry)` placement (`attention.py:219-220`). For cross-attention
    (a `key` is given) the key/value inputs are used raw, also matching the
    reference.
    """

    n_head: int
    d_head: int
    d_inp: Optional[int] = None
    d_out: Optional[int] = None
    key_dim: Optional[int] = None
    val_dim: Optional[int] = None
    bias: bool = False
    scale: Optional[float] = None
    causal: bool = False
    dropout: float = 0.0
    rope_kind: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        qry: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        val: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        hid = self.n_head * self.d_head
        d_inp = default(self.d_inp, hid)
        d_out = default(self.d_out, d_inp)

        if self.rope_kind is not None:
            freq = rope_frequencies(d_inp, kind=self.rope_kind)
            qry = apply_rope(qry, freq)

        qry = nn.LayerNorm(name="norm")(qry)
        key = default(key, qry)
        val = default(val, key)

        q = nn.Dense(hid, use_bias=self.bias, name="to_q")(qry)
        k = nn.Dense(hid, use_bias=self.bias, name="to_k")(key)
        v = nn.Dense(hid, use_bias=self.bias, name="to_v")(val)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.n_head, self.d_head).transpose(0, 2, 1, 3)

        attn = dot_product_attention(
            split(q),
            split(k),
            split(v),
            scale=default(self.scale, self.d_head ** -0.5),
            causal=self.causal,
            mask=mask,
        )
        b, h, n, d = attn.shape
        out = attn.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(d_out, use_bias=self.bias, name="to_out")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out


class SpatialAttention(nn.Module):
    """Self-attention over the `(H * W)` spatial grid, batched over (B, T).

    Accepts videos `(B, T, H, W, C)` or images `(B, H, W, C)`. An optional
    space-wise condition `(B, H*W, Ck)` cross-attends as keys/values,
    broadcast over time. Matches `genie/module/attention.py:241-307` in
    channels-last form (the reference's `transpose` flag selects layouts; this
    framework is uniformly channels-last so the flag is accepted by the
    blueprint registry and ignored).
    """

    n_head: int
    d_head: int
    d_inp: Optional[int] = None
    d_out: Optional[int] = None
    key_dim: Optional[int] = None
    bias: bool = False
    embed: bool = True
    scale: Optional[float] = None
    causal: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, video, cond=None, mask=None, train: bool = False):
        is_image = video.ndim == 4
        if is_image:
            b, h, w, c = video.shape
            t = 1
            x = video.reshape(b, 1, h, w, c)
        else:
            b, t, h, w, c = video.shape
            x = video

        seq = x.reshape(b * t, h * w, c)
        if cond is not None:
            # (B, HW, Ck) -> broadcast over time -> (B*T, HW, Ck)
            cond = jnp.repeat(cond, t, axis=0)

        out = Attention(
            n_head=self.n_head,
            d_head=self.d_head,
            d_inp=default(self.d_inp, c),
            d_out=self.d_out,
            key_dim=self.key_dim,
            bias=self.bias,
            scale=self.scale,
            causal=self.causal,
            dropout=self.dropout,
            rope_kind="2d" if self.embed else None,
            name="attn",
        )(seq, key=cond, mask=mask, train=train)

        c_out = out.shape[-1]
        out = out.reshape(b, t, h, w, c_out)
        return out.reshape(b, h, w, c_out) if is_image else out


class TemporalAttention(nn.Module):
    """Causal-capable self-attention over time, batched over (B, H, W).

    Accepts `(B, T, H, W, C)`. An optional time-wise condition `(B, T, Ck)`
    cross-attends as keys/values (this is how latent actions condition the
    LatentAction decoder, `genie/action.py:131-149`), broadcast over space.
    Matches `genie/module/attention.py:309-371`.
    """

    n_head: int
    d_head: int
    d_inp: Optional[int] = None
    d_out: Optional[int] = None
    key_dim: Optional[int] = None
    bias: bool = False
    embed: bool = True
    scale: Optional[float] = None
    causal: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, video, cond=None, mask=None, train: bool = False):
        b, t, h, w, c = video.shape
        # (B, T, H, W, C) -> (B*H*W, T, C) pixel tubes.
        seq = video.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        if cond is not None:
            # (B, T, Ck) -> (B*H*W, T, Ck)
            cond = jnp.repeat(cond, h * w, axis=0)

        out = Attention(
            n_head=self.n_head,
            d_head=self.d_head,
            d_inp=default(self.d_inp, c),
            d_out=self.d_out,
            key_dim=self.key_dim,
            bias=self.bias,
            scale=self.scale,
            causal=self.causal,
            dropout=self.dropout,
            rope_kind="1d" if self.embed else None,
            name="attn",
        )(seq, key=cond, mask=mask, train=train)

        c_out = out.shape[-1]
        return out.reshape(b, h, w, t, c_out).transpose(0, 3, 1, 2, 4)


class SpaceTimeAttention(nn.Module):
    """Factorized ST-transformer block: spatial attn -> causal temporal attn
    -> Conv3d FFN, each with a (dim-adapting) skip.

    Matches `genie/module/attention.py:373-473`. `cond` may be a single array
    or a `(space_cond, time_cond)` tuple; temporal attention is always causal.
    """

    n_head: Union[int, Tuple[int, int]] = 8
    d_head: Union[int, Tuple[int, int]] = 64
    d_inp: Optional[int] = None
    d_out: Optional[int] = None
    n_embd: Optional[int] = None  # alias: sets both d_inp and d_out
    hid_dim: Optional[Union[int, Tuple[int, ...]]] = None
    bias: bool = False
    embed: Union[bool, Tuple[bool, bool]] = True
    scale: Optional[float] = None
    dropout: float = 0.0
    kernel_size: int = 3
    transpose: bool = False  # accepted for blueprint compat; layout is fixed
    time_attn_kw: Optional[Dict[str, Any]] = None
    space_attn_kw: Optional[Dict[str, Any]] = None

    @property
    def inp_dim(self) -> int:
        n_head = self.n_head if isinstance(self.n_head, tuple) else (self.n_head,) * 2
        d_head = self.d_head if isinstance(self.d_head, tuple) else (self.d_head,) * 2
        return default(
            default(self.d_inp, self.n_embd), n_head[0] * d_head[0]
        )

    @property
    def out_dim(self) -> int:
        n_head = self.n_head if isinstance(self.n_head, tuple) else (self.n_head,) * 2
        d_head = self.d_head if isinstance(self.d_head, tuple) else (self.d_head,) * 2
        return default(
            default(self.d_out, self.n_embd), n_head[1] * d_head[1]
        )

    @nn.compact
    def __call__(self, video, cond=None, mask=None, train: bool = False):
        n_head = self.n_head if isinstance(self.n_head, tuple) else (self.n_head,) * 2
        d_head = self.d_head if isinstance(self.d_head, tuple) else (self.d_head,) * 2
        embed = self.embed if isinstance(self.embed, tuple) else (self.embed,) * 2
        d_inp = default(default(self.d_inp, self.n_embd), n_head[0] * d_head[0])
        d_out = default(default(self.d_out, self.n_embd), n_head[1] * d_head[1])
        space_hid = n_head[0] * d_head[0]
        time_hid = n_head[1] * d_head[1]

        if not isinstance(cond, tuple):
            cond = (cond, cond)
        space_cond, time_cond = cond

        space_kw = dict(self.space_attn_kw or {})
        time_kw = dict(self.time_attn_kw or {})

        # Spatial attention + 1x1-conv skip when dims change.
        sa = SpatialAttention(
            n_head=n_head[0],
            d_head=d_head[0],
            d_inp=d_inp,
            d_out=space_hid,
            bias=self.bias,
            embed=embed[0],
            scale=self.scale,
            causal=False,
            dropout=self.dropout,
            name="space_attn",
            **space_kw,
        )(video, cond=space_cond, mask=mask, train=train)
        if d_inp != space_hid:
            skip = nn.Conv(space_hid, kernel_size=(1, 1, 1), name="space_skip")(video)
        else:
            skip = video
        video = sa + skip

        # Temporal attention (always causal) + identity skip (dim-adapting
        # conv when the spatial and temporal widths differ).
        ta = TemporalAttention(
            n_head=n_head[1],
            d_head=d_head[1],
            d_inp=space_hid,
            d_out=time_hid,
            bias=self.bias,
            embed=embed[1],
            scale=self.scale,
            causal=True,
            dropout=self.dropout,
            name="temp_attn",
            **time_kw,
        )(video, cond=time_cond, mask=mask, train=train)
        if space_hid != time_hid:
            video = ta + nn.Conv(time_hid, kernel_size=(1, 1, 1), name="time_skip")(video)
        else:
            video = ta + video

        # Conv3d FFN + 1x1-conv skip when dims change.
        from open_genie_tpu.modules.misc import ForwardBlock

        ffn = ForwardBlock(
            in_dim=time_hid,
            out_dim=d_out,
            hid_dim=self.hid_dim,
            num_groups=n_head[1],
            use_bias=self.bias,
            block="conv3d",
            kernel_size=self.kernel_size,
            name="ffn",
        )(video, train=train)
        if time_hid != d_out:
            skip = nn.Conv(d_out, kernel_size=(1, 1, 1), name="ffn_skip")(video)
        else:
            skip = video
        return ffn + skip
