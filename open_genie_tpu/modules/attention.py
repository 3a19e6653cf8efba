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
import jax
import jax.numpy as jnp

from open_genie_tpu.ops.attention import dot_product_attention
from open_genie_tpu.ops.rope import apply_rope, rope_frequencies
from open_genie_tpu.utils import default


class _Proj(nn.Module):
    """Parameters of one QKV projection, exposed for horizontal fusion.

    Same param tree as the `nn.Dense` it replaces (`kernel` + optional
    `bias` under the module name, lecun-normal/zeros init), but returns
    the raw arrays so the caller can concatenate the three projections
    into ONE matmul for self-attention: XLA does not horizontally fuse
    separate dots, and at decode shapes (256 tokens) the per-op pipeline
    overhead of three 512-wide matmuls dominates their FLOPs."""

    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, d_in: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d_in, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


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
    # Declared key/value input widths for cross-attention (the reference
    # Adapter's `key_dim`/`val_dim`, `attention.py:105-149`, e.g. action
    # conditioning with `key_dim=8`, `genie/__init__.py:38`). The Dense
    # projections infer their input width, so these are validated as a
    # shape contract: a mismatch raises (like the reference's fixed-shape
    # projection would) instead of being silently ignored.
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
        kv_cache=None,
        cache_pos=None,
        cache_write: bool = True,
    ):
        """Self/cross attention; optionally KV-cached single-position decode.

        Decode mode (`kv_cache=(k_buf, v_buf)` of shape `(B, heads, N, Dh)`
        plus integer `cache_pos`): `qry` is a single position `(B, 1, C)`
        placed at `cache_pos`; its K/V are written into the buffers and
        attention runs over positions `<= cache_pos`. Returns
        `(out, (k_buf', v_buf'))`. Parameters are identical to the full
        path (same compact submodules trace in both modes).

        `cache_write=False` computes the SAME attention without touching
        the buffers: history logits come from reading `k_buf`/`v_buf`
        masked to `< cache_pos`, the current position's logit from the
        live K/V -- the identical logit set, so softmax matches the write
        path to fp tolerance. This matters inside MaskGIT refinement
        loops: a written-then-discarded cache forces XLA to materialize a
        full buffer copy per refine step (the loop-carried original must
        survive), which made the rollout HBM-bound in B.
        """
        hid = self.n_head * self.d_head
        # Unspecified input width is inferred from the traced input (the
        # reference's fixed-size Adapter would crash on any input narrower
        # than n_head*d_head, which its own stock configs feed it --
        # SURVEY 2.11 stale-blueprint family; shape inference is the JAX-
        # native fix). RoPE must match the actual qry width either way.
        d_inp = default(self.d_inp, qry.shape[-1])
        d_out = default(self.d_out, d_inp)
        decode = kv_cache is not None

        if self.rope_kind is not None:
            freq = rope_frequencies(d_inp, kind=self.rope_kind)
            qry = apply_rope(qry, freq, offset=cache_pos if decode else 0)

        qry = nn.LayerNorm(name="norm")(qry)
        key = default(key, qry)
        val = default(val, key)
        if self.key_dim is not None and key.shape[-1] != self.key_dim:
            raise ValueError(
                f"declared key_dim={self.key_dim} but the key input has "
                f"width {key.shape[-1]}"
            )
        if self.val_dim is not None and val.shape[-1] != self.val_dim:
            raise ValueError(
                f"declared val_dim={self.val_dim} but the value input has "
                f"width {val.shape[-1]}"
            )

        wq, bq = _Proj(hid, self.bias, name="to_q")(qry.shape[-1])
        wk, bk = _Proj(hid, self.bias, name="to_k")(key.shape[-1])
        wv, bv = _Proj(hid, self.bias, name="to_v")(val.shape[-1])
        if key is qry and val is qry:
            # Self-attention: one (C, 3*hid) matmul instead of three.
            w = jnp.concatenate([wq, wk, wv], axis=1)
            qkv = qry @ w
            if self.bias:
                qkv = qkv + jnp.concatenate([bq, bk, bv])
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = qry @ wq + (bq if self.bias else 0)
            k = key @ wk + (bk if self.bias else 0)
            v = val @ wv + (bv if self.bias else 0)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.n_head, self.d_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)

        if decode and not cache_write:
            k_buf, v_buf = kv_cache
            scale = default(self.scale, self.d_head ** -0.5)
            n_max = k_buf.shape[2]
            # Cast live K/V to the buffer dtype first: the write path
            # stores (and reads back) buffer-dtype values, and read-only
            # refinement must see bit-identical logits.
            k_cur = k.astype(k_buf.dtype)
            v_cur = v.astype(v_buf.dtype)
            logits_h = jnp.einsum(
                "...qd,...kd->...qk", q, k_buf,
                preferred_element_type=jnp.float32,
            ) * scale
            hist = jnp.arange(n_max)[None, None, None, :] < cache_pos
            logits_h = jnp.where(hist, logits_h, -jnp.inf)
            logits_s = jnp.einsum(
                "...qd,...kd->...qk", q, k_cur,
                preferred_element_type=jnp.float32,
            ) * scale
            probs = jax.nn.softmax(
                jnp.concatenate([logits_h, logits_s], axis=-1), axis=-1
            )
            attn = jnp.einsum(
                "...qk,...kd->...qd", probs[..., :n_max].astype(q.dtype),
                v_buf, preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "...qk,...kd->...qd", probs[..., n_max:].astype(q.dtype),
                v_cur, preferred_element_type=jnp.float32,
            )
            attn = attn.astype(q.dtype)
            k_buf, v_buf = kv_cache  # unchanged
        elif decode:
            k_buf, v_buf = kv_cache
            k_buf = jax.lax.dynamic_update_slice_in_dim(
                k_buf, k.astype(k_buf.dtype), cache_pos, axis=2
            )
            v_buf = jax.lax.dynamic_update_slice_in_dim(
                v_buf, v.astype(v_buf.dtype), cache_pos, axis=2
            )
            n_max = k_buf.shape[2]
            valid = jnp.arange(n_max)[None, None, None, :] <= cache_pos
            attn = dot_product_attention(
                q, k_buf, v_buf,
                scale=default(self.scale, self.d_head ** -0.5),
                causal=False,
                mask=valid,
                use_flash=False,
            )
        else:
            attn = dot_product_attention(
                q, k, v,
                scale=default(self.scale, self.d_head ** -0.5),
                causal=self.causal,
                mask=mask,
            )

        b, h, n, d = attn.shape
        out = attn.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(d_out, use_bias=self.bias, name="to_out")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        if decode:
            return out, (k_buf, v_buf)
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
    def __call__(
        self,
        video,
        cond=None,
        mask=None,
        train: bool = False,
        kv_cache=None,
        cache_pos=None,
        cache_write: bool = True,
    ):
        b, t, h, w, c = video.shape
        # (B, T, H, W, C) -> (B*H*W, T, C) pixel tubes.
        seq = video.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        if cond is not None:
            # (B, T, Ck) -> (B*H*W, T, Ck)
            cond = jnp.repeat(cond, h * w, axis=0)

        attn = Attention(
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
        )
        out = attn(
            seq, key=cond, mask=mask, train=train,
            kv_cache=kv_cache, cache_pos=cache_pos, cache_write=cache_write,
        )
        if kv_cache is not None:
            out, new_cache = out
            c_out = out.shape[-1]
            out = out.reshape(b, h, w, t, c_out).transpose(0, 3, 1, 2, 4)
            return out, new_cache

        c_out = out.shape[-1]
        return out.reshape(b, h, w, t, c_out).transpose(0, 3, 1, 2, 4)


def st_attn_cache(kwargs: dict, batch: int, h: int, w: int, t_max: int,
                  dtype) -> dict:
    """Zeroed `{k, v, ffn, fh}` decode-cache entry for ONE
    `space-time_attn` layer, with dims read from its blueprint kwargs --
    the single source of truth for the cache layout, shared by
    `DynamicsModel.init_cache` and `VideoTokenizer.init_stream_cache`.
    `t_max` is rounded up to a multiple of 8 (attention masks by position
    so slack slots are inert; the fused Pallas decode kernels need a
    chunk-aligned time axis)."""
    t_max = -(-t_max // 8) * 8
    n_head = kwargs.get("n_head", 8)
    d_head = kwargs.get("d_head", 64)
    heads = n_head[1] if isinstance(n_head, (tuple, list)) else n_head
    dh = d_head[1] if isinstance(d_head, (tuple, list)) else d_head
    kt = kwargs.get("kernel_size", 3)
    time_hid = heads * dh
    d_out = kwargs.get("d_out") or kwargs.get("n_embd") or time_hid
    return {
        "k": jnp.zeros((batch * h * w, heads, t_max, dh), dtype),
        "v": jnp.zeros((batch * h * w, heads, t_max, dh), dtype),
        "ffn": jnp.zeros((batch, kt - 1, h, w, time_hid), dtype),
        "fh": jnp.zeros((batch, 1, h, w, d_out), dtype),
    }


def _per_frame_group_norm(x, scale, bias, groups, eps=1e-6):
    """GroupNorm with per-frame statistics on `(B, T, H, W, C)` video --
    the functional twin of ForwardBlock's per-frame `nn.GroupNorm` (stats
    over (H, W, C/g) within each frame), used by the cached decode path
    so history frames' normalization can be cached instead of recomputed
    every MaskGIT refine step."""
    b, t, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b * t, h * w, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xg - mean).mean(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _time_valid_conv(x, kernel, bias):
    """Channels-last conv3d, VALID in time, SAME (symmetric) in space --
    the exact windowed form of ForwardBlock's causal conv, applied to a
    subset of its time taps (`kernel` may be a time-slice of the full
    `(kt, kh, kw, Cin, Cout)` kernel)."""
    kh, kw = kernel.shape[1], kernel.shape[2]
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=((0, 0), ((kh - 1) // 2, (kh - 1) // 2),
                 ((kw - 1) // 2, (kw - 1) // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


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

    @property
    def time_hid(self) -> int:
        n_head = self.n_head if isinstance(self.n_head, tuple) else (self.n_head,) * 2
        d_head = self.d_head if isinstance(self.d_head, tuple) else (self.d_head,) * 2
        return n_head[1] * d_head[1]

    @property
    def time_heads(self) -> Tuple[int, int]:
        n_head = self.n_head if isinstance(self.n_head, tuple) else (self.n_head,) * 2
        d_head = self.d_head if isinstance(self.d_head, tuple) else (self.d_head,) * 2
        return n_head[1], d_head[1]

    @nn.compact
    def __call__(
        self,
        video,
        cond=None,
        mask=None,
        train: bool = False,
        cache=None,
        cache_pos=None,
        cache_write: bool = True,
    ):
        """Full forward, or cached single-frame decode.

        Decode mode (`cache={'k','v','ffn'}`, `cache_pos=t`): `video` is one
        frame `(B, 1, H, W, C)` at time `t`. 'k'/'v' are `(B*H*W, heads,
        T_max, Dh)` temporal KV buffers; 'ffn' is `(B, k_t - 1, H, W,
        time_hid)` holding the previous frames' pre-FFN features (the causal
        FFN conv's temporal receptive field). Returns `(out, new_cache)`.
        """
        n_head = self.n_head if isinstance(self.n_head, tuple) else (self.n_head,) * 2
        d_head = self.d_head if isinstance(self.d_head, tuple) else (self.d_head,) * 2
        embed = self.embed if isinstance(self.embed, tuple) else (self.embed,) * 2
        # d_inp falls back to the TRACED input width (not n_head*d_head):
        # the reference's stock configs instantiate this block with no dims
        # on inputs narrower than the hidden width (config/tokenize.yaml
        # enc: 64-wide input into an 8x64-head block), which its fixed-size
        # projections could never run; inference is the fix-by-design.
        d_inp = default(default(self.d_inp, self.n_embd), video.shape[-1])
        d_out = default(default(self.d_out, self.n_embd), n_head[1] * d_head[1])
        space_hid = n_head[0] * d_head[0]
        time_hid = n_head[1] * d_head[1]
        decode = cache is not None

        if not isinstance(cond, tuple):
            cond = (cond, cond)
        space_cond, time_cond = cond
        if decode:
            assert space_cond is None and time_cond is None, (
                "cached decode does not support external conditioning"
            )

        space_kw = dict(self.space_attn_kw or {})
        time_kw = dict(self.time_attn_kw or {})

        # (Removed in round 4: a fused-Pallas decode-step fast path lived
        # here for two rounds, gated off because the on-chip A/B measured
        # every kernel mode 0.4-4% SLOWER than this XLA path -- the
        # read-only refine + FFN time-tap split + fused QKV already
        # removed the dispatch latency the kernels targeted. Decision and
        # numbers: PARITY.md "Fused decode kernels: tried, measured,
        # removed".)

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
        ta_mod = TemporalAttention(
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
        )
        if decode:
            ta, new_kv = ta_mod(
                video, cond=None, train=train,
                kv_cache=(cache["k"], cache["v"]), cache_pos=cache_pos,
                cache_write=cache_write,
            )
        else:
            ta = ta_mod(video, cond=time_cond, mask=mask, train=train)
        if space_hid != time_hid:
            video = ta + nn.Conv(time_hid, kernel_size=(1, 1, 1), name="time_skip")(video)
        else:
            video = ta + video

        # Causal Conv3d FFN + 1x1-conv skip when dims change.
        from open_genie_tpu.modules.misc import ForwardBlock

        ffn_mod = ForwardBlock(
            in_dim=time_hid,
            out_dim=d_out,
            hid_dim=self.hid_dim,
            num_groups=n_head[1],
            use_bias=self.bias,
            block="conv3d",
            kernel_size=self.kernel_size,
            causal_time=True,
            name="ffn",
        )
        if decode:
            # Decode-mode FFN, split at the conv's time taps. The cache
            # holds the (k_t - 1)-frame POST-GroupNorm feature window
            # (per-frame GN is frame-local, so history normalization never
            # changes -- and sequence-start zero padding is then EXACTLY
            # the full forward's post-GN zero padding) plus 'fh', the
            # history taps' precomputed contribution to this position's
            # output. A refine step (cache_write=False) therefore runs GN
            # + a SINGLE-time-tap conv on the current frame and adds 'fh'
            # -- k_t x less conv FLOPs than re-convolving the window,
            # which profiling showed was the rollout's dominant compute.
            # The commit pass runs the full windowed conv and precomputes
            # the next position's 'fh' from the new trailing window.
            assert self.hid_dim is None, (
                "cached decode requires a single-conv FFN (hid_dim=None): "
                "stacked time convs widen the temporal receptive field "
                "past the cached window"
            )
            p = self.variables["params"]["ffn"]
            kernel = p["block_0"]["kernel"]  # (kt, kh, kw, Cin, Cout)
            cbias = p["block_0"].get("bias")
            kt = kernel.shape[0]
            xn = _per_frame_group_norm(
                video, p["norm"]["scale"], p["norm"]["bias"], n_head[1]
            )
            if cache_write:
                window = jnp.concatenate(
                    [cache["ffn"].astype(xn.dtype), xn], axis=1
                )
                ffn = _time_valid_conv(window, kernel, cbias)
                # Keep cache dtypes stable across steps: the rollout scan
                # carries them, and a bf16 compute dtype must not silently
                # narrow (or widen) an f32 (or bf16) cache.
                new_ffn = window[:, 1:].astype(cache["ffn"].dtype)
                fh_next = _time_valid_conv(window[:, 1:], kernel[: kt - 1], None)
                new_fh = fh_next.astype(cache["fh"].dtype)
            else:
                ffn = cache["fh"].astype(xn.dtype) + _time_valid_conv(
                    xn, kernel[kt - 1 :], cbias
                )
                new_ffn, new_fh = cache["ffn"], cache["fh"]
        else:
            ffn = ffn_mod(video, train=train)
        if time_hid != d_out:
            skip = nn.Conv(d_out, kernel_size=(1, 1, 1), name="ffn_skip")(video)
        else:
            skip = video
        out = ffn + skip
        if decode:
            return out, {
                "k": new_kv[0], "v": new_kv[1], "ffn": new_ffn, "fh": new_fh,
            }
        return out
