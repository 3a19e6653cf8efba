"""MagViT2-style VideoTokenizer (Flax, channels-last).

TPU-native re-implementation of the reference `VideoTokenizer`
(`/root/reference/genie/tokenizer.py:225-442`). Pure model: encode ->
LFQ-quantize -> decode. The training-only loss stack (reconstruction + GAN +
perceptual + quantization, reference `tokenizer.py:352-387`) lives in
`open_genie_tpu.train.losses` so the model stays a clean function of its
inputs (the reference conflates model and Lightning train module; SURVEY.md
section 1 calls for the split).

Layout: `(B, T, H, W, C)` channels-last. The reference's channels-first
public convention is available via `open_genie_tpu.utils.to_channels_last`.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from open_genie_tpu.modules import parse_blueprint
from open_genie_tpu.modules.quantization import LookupFreeQuantization
from open_genie_tpu.utils import Blueprint, default


def _last_out_channels(blueprint: Blueprint) -> Optional[int]:
    """Last explicit `out_channels` in a blueprint (enc output width)."""
    out = None
    for desc in blueprint:
        if isinstance(desc, str):
            continue
        _, kwargs = desc
        for key in ("out_channels", "n_embd", "d_out"):
            if kwargs.get(key) is not None:
                out = kwargs[key]
    return out


def _first_in_channels(blueprint: Blueprint) -> Optional[int]:
    for desc in blueprint:
        if isinstance(desc, str):
            continue
        _, kwargs = desc
        for key in ("in_channels", "n_embd", "d_inp"):
            if kwargs.get(key) is not None:
                return kwargs[key]
    return None


class VideoTokenizer(nn.Module):
    """Blueprint-assembled video tokenizer with lookup-free quantization.

    Fields mirror the reference constructor (`tokenizer.py:233-259`); loss
    weights live in the training config instead of the model.
    """

    enc_desc: Any  # Blueprint
    dec_desc: Any  # Blueprint
    d_codebook: int = 18
    n_codebook: int = 1
    lfq_bias: bool = True
    lfq_frac_sample: float = 1.0
    lfq_commit_weight: float = 0.25
    lfq_entropy_weight: float = 0.1
    lfq_diversity_weight: float = 1.0
    lfq_bit_balance_weight: float = 0.0
    # Activation checkpointing for the conv/attention stacks (memory lever
    # for full-resolution training; no effect outside `grad`). True/'full'
    # recomputes everything; 'dots' keeps dot_general (attention/dense)
    # outputs resident -- convs are still recomputed (the XLA policy only
    # matches dot_general); False disables.
    remat: Any = True

    def setup(self):
        self.enc_layers, self.enc_ext = parse_blueprint(
            self.enc_desc, remat=self.remat
        )
        self.dec_layers, self.dec_ext = parse_blueprint(
            self.dec_desc, remat=self.remat
        )

        last_enc = _last_out_channels(self.enc_desc)
        first_dec = _first_in_channels(self.dec_desc)
        assert last_enc == first_dec, (
            f"Inconsistent encoder/decoder dimensions: {last_enc} vs {first_dec}"
        )

        self.quant = LookupFreeQuantization(
            codebook_dim=self.d_codebook,
            num_codebook=self.n_codebook,
            input_dim=last_enc,
            use_bias=self.lfq_bias,
            frac_sample=self.lfq_frac_sample,
            commit_weight=self.lfq_commit_weight,
            entropy_weight=self.lfq_entropy_weight,
            diversity_weight=self.lfq_diversity_weight,
            bit_balance_weight=self.lfq_bit_balance_weight,
        )

    def encode(self, video, cond=None, train: bool = False):
        """Run the encoder stack (`tokenizer.py:307-317`)."""
        x = video
        for layer, has_ext in zip(self.enc_layers, self.enc_ext):
            x = layer(x, cond if has_ext else None, None, train)
        return x

    def decode(self, quant, cond=None, train: bool = False):
        """Run the decoder stack; `cond` defaults to the quantized latents
        themselves -- this is how AdaptiveGroupNorm conditioning is wired
        (`tokenizer.py:319-330`)."""
        cond = default(cond, quant)
        x = quant
        for layer, has_ext in zip(self.dec_layers, self.dec_ext):
            x = layer(x, cond if has_ext else None, None, train)
        return x

    def quantize(self, enc_video, beta: float = 100.0, training: bool = False):
        return self.quant(enc_video, beta=beta, training=training)

    @property
    def temporal_downsampling(self) -> int:
        """Input frames consumed per token frame (e.g. 4 for MAGVIT2's two
        time_factor=2 stages). The minimum prompt length that tokenizes to
        at least one token frame; `Genie.tokenize_prompt` edge-pads shorter
        prompts (image prompts especially) up to this."""
        from open_genie_tpu.modules import blueprint_time_factor

        return max(1, int(round(1.0 / blueprint_time_factor(self.enc_desc))))

    def head_fusable(self) -> bool:
        """Static check for the fused tokenize head: the encoder must end
        in a pure 1x1x1 stride-1 `causal-conv3d` (a matmul -- causality is
        trivial at kernel 1) projecting straight to the codebook width with
        no LFQ input projection. Then the final conv + LFQ sign/index fuse
        into one Pallas VMEM pass (SURVEY.md section 7 kernel priority #1;
        reference path `tokenizer.py:79-84` + `quantization.py:97-98`).
        """
        if self.n_codebook != 1 or not self.enc_desc:
            return False
        last = self.enc_desc[-1]
        if isinstance(last, str):
            return False
        name, kw = last
        if name != "causal-conv3d" or int(kw.get("n_rep", 1)) != 1:
            return False
        ks = kw.get("kernel_size", 3)
        ks = (ks,) * 3 if isinstance(ks, int) else tuple(ks)
        st = kw.get("stride", 1)
        st = (st,) * 3 if isinstance(st, int) else tuple(st)
        if ks != (1, 1, 1) or st != (1, 1, 1):
            return False
        return kw.get("out_channels") == self.d_codebook

    def tokenize(self, video, beta: float = 100.0, fused: Optional[bool] = None):
        """Video -> (quantized latents, integer token grid). Eval mode, no
        loss; callers that must not backprop wrap in `lax.stop_gradient`
        (`tokenizer.py:332-350` uses `no_grad`).

        `fused=True` routes the final 1x1 conv + LFQ sign/index through
        the fused Pallas head (requires `head_fusable()`); the default is
        the unfused XLA path everywhere -- measured on v5e, the fusion is
        ~4% slower on the conv-dominated MAGVIT2 encoder (XLA already
        fuses the 1x1 projection; see `ops/pallas/lfq_head.py`), so it is
        demoted to an explicit opt-in.
        """
        # Never fuse while params are being created: the fused path READS
        # the head conv's params instead of calling the layer, so during
        # `init` they don't exist yet (and the layer must be traced so
        # Flax creates them) -- the unfused path is the init path.
        if self.is_initializing():
            fused = False
        if fused is None:
            fused = False
        if fused:
            assert self.head_fusable(), (
                "fused tokenize requires a 1x1x1 causal-conv3d encoder head "
                "projecting to d_codebook with n_codebook == 1"
            )
            from open_genie_tpu.ops.pallas.lfq_head import lfq_head

            x = video
            for layer, has_ext in zip(self.enc_layers[:-1], self.enc_ext[:-1]):
                x = layer(x, None, None, False)
            head = self.enc_layers[-1].variables["params"]["conv3d"]
            w = head["kernel"].reshape(head["kernel"].shape[-2:])
            b = head.get("bias")
            if b is None:
                b = jnp.zeros((w.shape[-1],), w.dtype)
            return lfq_head(x, w, b)
        enc = self.encode(video, train=False)
        (quant, idxs), _, _ = self.quant(enc, beta=beta, training=False)
        return quant, idxs

    def decode_tokens(self, idxs, beta: float = 100.0):
        """Integer token grid -> video, via the LFQ codebook.

        Goes through `quant.decode_entries` so the LFQ output projection
        is applied when the encoder width differs from the codebook width
        -- feeding raw codewords to the decoder is only valid in the
        projection-free configuration (`tokenizer.py:319-330`)."""
        quant = self.quant.decode_entries(idxs)
        return self.decode(quant)

    # ------------------------------------------------------------------ #
    # Streaming decode: O(1)-per-frame pixel decode for serving.
    # ------------------------------------------------------------------ #

    @staticmethod
    def _expand_blueprint(blueprint):
        """`(name, kwargs)` per instantiated layer, honoring `n_rep` --
        parallel to `parse_blueprint`'s expansion, so entry `i` describes
        `self.dec_layers[i]`."""
        out = []
        for desc in blueprint:
            if isinstance(desc, str):
                desc = (desc, {})
            name, kwargs = desc
            kwargs = dict(kwargs)
            kwargs.pop("has_ext", None)
            n_rep = int(kwargs.pop("n_rep", 1))
            out.extend([(name, kwargs)] * n_rep)
        return out

    @nn.nowrap
    def stream_decodable(self) -> bool:
        """Static check for the streaming decode path (`decode_stream`).

        Streamable decoder stacks are strictly time-causal with
        finite temporal state, so a session can decode each new token
        frame in O(1) work with EXACT equality to the batch decode:
          * `causal-conv3d` (time stride 1, constant pad) -- carries its
            causal left-pad window;
          * `video-residual` (`use_causal` + `per_frame_norm`, no
            downsample) -- carries its two main-branch conv windows;
          * `space-time_attn` (single-conv FFN) -- carries temporal KV +
            FFN windows (the dynamics decode machinery);
          * `depth2spacetime_upsample` -- carries its conv window;
          * `depth2space_upsample` -- per-frame, stateless;
          * `group_norm` / `adaptive_group_norm` with `per_frame=True`
            (frame-local statistics; the adaptive layer's quant-latent
            conditioning is per-frame too, so `has_ext` is allowed);
          * parameter-free activations.
        Attention layers must sit before any `time_factor > 1` upsample
        (single-position KV decode). Stacks with time-pooled GroupNorm
        (the STOCK MAGVIT2 decoder) are NOT streamable -- serving falls
        back to sliding-window decode for those; `magvit2_stream`
        (`models/blueprints.py`) is the serving-grade flagship variant.
        """
        for d in self.dec_desc:
            if isinstance(d, str) or not d[1].get("has_ext"):
                continue
            # Frame-local conditioning only: per-frame adaptive GN reads
            # the CURRENT token frame's quant latents, which streaming has.
            if not (d[0] == "adaptive_group_norm" and d[1].get("per_frame")):
                return False
        frames_per_step = 1
        for name, kw in self._expand_blueprint(self.dec_desc):
            if name == "causal-conv3d":
                st = kw.get("stride", 1)
                st = st if isinstance(st, int) else st[0]
                if st != 1 or kw.get("pad_mode", "constant") not in (
                    "constant", "zeros",
                ):
                    return False
            elif name == "video-residual":
                if not kw.get("use_causal"):
                    return False
                if kw.get("downsample") is not None:
                    return False
                if kw.get("use_norm", True) and not kw.get("per_frame_norm"):
                    return False
                if kw.get("pad_mode", "constant") not in ("constant", "zeros"):
                    return False
            elif name == "space-time_attn":
                if kw.get("hid_dim") is not None or frames_per_step != 1:
                    return False
            elif name == "depth2spacetime_upsample":
                frames_per_step *= int(kw.get("time_factor", 2))
            elif name == "depth2time_upsample":
                frames_per_step *= int(kw.get("factor", 2))
            elif name == "depth2space_upsample":
                pass
            elif name in ("group_norm", "adaptive_group_norm"):
                if not kw.get("per_frame"):
                    return False
            elif name in ("silu", "gelu", "relu", "leaky_relu"):
                pass
            else:
                return False
        return True

    @nn.nowrap
    def init_stream_cache(
        self, batch: int, h: int, w: int, t_max: int, dtype=jnp.float32
    ):
        """Zeroed per-layer streaming-decode states for a `t_max`-token-
        frame session at token grid `(h, w)`. One entry per decoder layer:
        conv layers carry their `(B, time_pad, H, W, C_in)` trailing input
        window (zeros = the causal zero padding at sequence start, so the
        stream is exact from frame 0), `space-time_attn` layers carry the
        dynamics-style `{k, v, ffn, fh}` caches, stateless layers carry
        `None`. Layer dims are read from the blueprint descriptors (like
        `DynamicsModel.init_cache`)."""
        assert self.stream_decodable(), (
            "decoder blueprint is not streamable (see stream_decodable)"
        )
        from open_genie_tpu.utils import cast_tuple

        caches = []
        for name, kw in self._expand_blueprint(self.dec_desc):
            if name == "causal-conv3d":
                kt = cast_tuple(kw.get("kernel_size", 3), 3)[0]
                dt = cast_tuple(kw.get("dilation", 1), 3)[0]
                tp = (kt - 1) * dt
                caches.append(
                    jnp.zeros((batch, tp, h, w, kw["in_channels"]), dtype)
                )
            elif name == "video-residual":
                kt = cast_tuple(kw.get("kernel_size", 3), 3)[0]
                in_ch = kw["in_channels"]
                out_ch = kw.get("out_channels") or in_ch
                caches.append({
                    "conv1": jnp.zeros((batch, kt - 1, h, w, in_ch), dtype),
                    "conv2": jnp.zeros((batch, kt - 1, h, w, out_ch), dtype),
                })
            elif name == "space-time_attn":
                from open_genie_tpu.modules.attention import st_attn_cache

                caches.append(st_attn_cache(kw, batch, h, w, t_max, dtype))
            elif name == "depth2spacetime_upsample":
                kt = cast_tuple(kw.get("kernel_size", 1), 3)[0]
                caches.append(
                    jnp.zeros((batch, kt - 1, h, w, kw["in_channels"]), dtype)
                )
                h *= int(kw.get("space_factor", 2))
                w *= int(kw.get("space_factor", 2))
            elif name == "depth2time_upsample":
                caches.append(None)
            elif name == "depth2space_upsample":
                caches.append(None)
                h *= int(kw.get("factor", 2))
                w *= int(kw.get("factor", 2))
            else:
                # Stateless frame-local layers (per-frame norms,
                # activations); `stream_decodable` already vetted the set.
                caches.append(None)
        return caches

    def stream_dtype(self):
        """Dtype for streaming-decode states: follows the TOKENIZER's own
        params (a bf16-cast tokenizer streams bf16 windows/KV; an f32 one
        stays exact in f32) -- NOT the dynamics trunk's dtype, which can
        differ in mixed-precision staged checkpoints."""
        try:
            import jax

            for leaf in jax.tree_util.tree_leaves(self.variables["params"]):
                if hasattr(leaf, "dtype") and jnp.issubdtype(
                    leaf.dtype, jnp.floating
                ):
                    return leaf.dtype
        except Exception:
            pass
        return jnp.float32

    def decode_stream(self, idxs, cache, pos):
        """Streaming decode of ONE token frame against cached history.

        Args:
          idxs: `(B, H, W)` (or `(B, 1, H, W)`) integer tokens of the frame
            at position `pos`.
          cache/pos: streaming states (see `init_stream_cache`) and the
            token-frame index.

        Returns `(pixels, new_cache)` with `pixels` of shape
        `(B, time_factor_total, H', W', C)` -- time-expanding decoders emit
        several pixel frames per token frame. EXACT vs the batch
        `decode_tokens` (causal convs see the identical windows, attention
        the identical KV prefix; pinned by tests/test_stream_decode.py), in
        O(1) work per frame instead of re-decoding a window -- the serving
        fast path (reference has no serving at all; its closest path
        re-runs the full decoder per frame, `genie.py:95-105`)."""
        if idxs.ndim == 3:
            idxs = idxs[:, None]
        x = self.quant.decode_entries(idxs)
        # Frame-local conditioning for `has_ext` layers (per-frame adaptive
        # GroupNorm): the batch decode conditions on the quant latents
        # (`decode`'s cond default); the streaming step holds exactly the
        # current token frame's latents, which is all a per-frame layer reads.
        cond = x
        new_cache = []
        for (name, _), layer, has_ext, lc in zip(
            self._expand_blueprint(self.dec_desc), self.dec_layers,
            self.dec_ext, cache,
        ):
            layer_cond = cond if has_ext else None
            if name == "space-time_attn":
                x, c = layer(x, layer_cond, None, False, cache=lc, cache_pos=pos)
            elif lc is not None:
                x, c = layer(x, layer_cond, None, False, cache=lc)
            else:
                x, c = layer(x, layer_cond, None, False), None
            new_cache.append(c)
        return x, new_cache

    def __call__(
        self,
        video,
        beta: float = 100.0,
        train: bool = False,
        entropy_scale=1.0,
        bit_balance_scale=1.0,
    ) -> Tuple[jnp.ndarray, dict]:
        """Full forward: encode -> quantize -> decode.

        Returns `(rec_video, out)` with `out` carrying `quant`, `idxs`,
        `quant_loss` (None in eval) and LFQ aux metrics. The combined
        training loss (incl. the `tokenizer.py:375` precedence-bug fix) is
        assembled in `train/losses.py`. `entropy_scale` (traced scalar ok)
        multiplies the LFQ entropy objective -- the anneal-to-zero lever
        (see `ops/lfq.py::lfq_loss`).
        """
        enc = self.encode(video, train=train)
        (quant, idxs), quant_loss, aux = self.quant(
            enc, beta=beta, training=train, entropy_scale=entropy_scale,
            bit_balance_scale=bit_balance_scale,
        )
        rec = self.decode(quant, train=train)
        return rec, {
            "quant": quant,
            "idxs": idxs,
            "quant_loss": quant_loss,
            "lfq_aux": aux,
        }
