"""Genie: composed generative interactive world model (Flax).

TPU-native re-implementation of the *intended* semantics of the reference
`Genie` (`/root/reference/genie/genie.py` -- non-functional as written, see
SURVEY.md 2.11.1): a frozen pre-trained VideoTokenizer + jointly trained
LatentAction VQ-VAE and MaskGIT DynamicsModel.

Training (`compute_loss`, reference `genie.py:107-125`):
  video -> tokenizer.tokenize (stop-gradient) -> token grid
  video -> latent_action      -> per-frame action ids + VQ-VAE loss
  dynamics.compute_loss(tokens, actions)      -> masked-token CE
  loss = act_loss + dyn_loss

Rollout (`__call__`, reference `genie.py:65-105`): a fixed-shape compiled
loop -- the token buffer is pre-allocated at `T_prompt + num_frames` and
each frame runs `steps_per_frame` MaskGIT refinement steps, all inside one
jitted program (no per-frame recompilation, no host round-trips).

Time-resolution note: the MAGVIT2 tokenizer compresses time by 4x while
latent actions are per input frame; actions are subsampled to the token
time axis (`act[:, ::ratio]`). The reference ignores this mismatch (it only
ran with time-preserving tokenizers).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from open_genie_tpu.models.action import LatentAction
from open_genie_tpu.models.dynamics import DynamicsModel, maskgit_commit
from open_genie_tpu.models.tokenizer import VideoTokenizer


class Genie(nn.Module):
    """Composition model. Construct with nested kwargs dicts:

      Genie(tokenizer=dict(enc_desc=..., dec_desc=..., d_codebook=10),
            latent_action=dict(enc_desc=..., dec_desc=..., d_codebook=8),
            dynamics=dict(desc=..., embed_dim=512))

    `tok_vocab`/`act_vocab` are derived from the codebook dims.
    """

    tokenizer: Dict[str, Any]
    latent_action: Dict[str, Any]
    dynamics: Dict[str, Any]

    def setup(self):
        self.tokenizer_ = VideoTokenizer(**self.tokenizer)
        self.latent_action_ = LatentAction(**self.latent_action)
        dyn = dict(self.dynamics)
        dyn.setdefault("tok_vocab", 2 ** self.tokenizer_.d_codebook)
        dyn.setdefault("act_vocab", 2 ** self.latent_action_.d_codebook)
        self.dynamics_ = DynamicsModel(**dyn)

    # ------------------------------------------------------------------ #
    # Training
    # ------------------------------------------------------------------ #

    def compute_loss(
        self,
        video: jnp.ndarray,
        key: jax.Array,
        training: bool = True,
        return_act_idxs: bool = False,
    ) -> Tuple[jnp.ndarray, dict]:
        """Joint latent-action + dynamics loss on raw video (B, T, H, W, C).

        The tokenizer is used frozen: its outputs are stop-gradient'd (and
        the train loop additionally masks its params out of the optimizer).
        `return_act_idxs` adds the per-input-frame action ids to the aux
        dict (an int array -- eval consumers only; the train loop expects
        scalar metrics).
        """
        _, tok_idxs = self.tokenizer_.tokenize(video)
        tok_idxs = lax.stop_gradient(tok_idxs)  # (B, T', H', W')

        act_idxs, act_loss, act_aux = self.latent_action_(
            video, training=training
        )  # (B, T)
        act_idxs_full = act_idxs
        act_idxs = self.align_actions(act_idxs, tok_idxs.shape[1])

        dyn_loss, dyn_aux = self.dynamics_.compute_loss(
            tok_idxs, lax.stop_gradient(act_idxs), key, train=training
        )

        loss = act_loss + dyn_loss
        aux = {
            "act_loss": act_loss,
            "dyn_loss": dyn_loss,
            **{f"act_{k}": v for k, v in act_aux.items()},
            **{f"dyn_{k}": v for k, v in dyn_aux.items()},
        }
        if return_act_idxs:
            aux["act_idxs"] = act_idxs_full
        return loss, aux

    @staticmethod
    def align_actions(act_idxs: jnp.ndarray, t_tok: int) -> jnp.ndarray:
        """Subsample per-input-frame action ids to the token time axis
        (time-compressing tokenizers yield fewer token frames). The single
        source of the alignment rule, shared by `compute_loss` and the
        `tokenize-data` shard writer -- cached shards must carry exactly
        the actions joint training would see."""
        t_act = act_idxs.shape[1]
        if t_act != t_tok:
            ratio = t_act // t_tok
            act_idxs = act_idxs[:, ::ratio][:, :t_tok]
        return act_idxs

    def tokenize_with_actions(self, video: jnp.ndarray):
        """Frozen-model inference for shard caching: `(B,T,H,W,C)` video ->
        `(B,T',H',W')` tokens + `(B,T')` token-time-aligned action ids."""
        tokens = self.tokenize_prompt(video)
        act_idxs, _, _ = self.latent_action_(video, training=False)
        return tokens, self.align_actions(act_idxs, tokens.shape[1])

    def init_full(self, video: jnp.ndarray, key: jax.Array):
        """Initialization-only path touching every parameter: the joint
        loss (tokenizer encoder + LFQ + latent action + dynamics) plus the
        tokenizer decoder. Flax creates params only along traced paths, so
        `module.init(..., method=Genie.init_full)` is the way to build a
        complete tree (training never needs the pixel decoder, inference
        never needs the loss stack)."""
        loss, _ = self.compute_loss(video, key, training=True)
        _, idxs = self.tokenizer_.tokenize(video)
        rec = self.tokenizer_.decode_tokens(idxs)
        return loss + 0.0 * rec.mean()

    # ------------------------------------------------------------------ #
    # Inference
    # ------------------------------------------------------------------ #

    def tokenize_prompt(self, prompt: jnp.ndarray) -> jnp.ndarray:
        """Prompt (image `(B,H,W,C)` or video `(B,T,H,W,C)`) -> token grid.

        Prompts shorter than the tokenizer's temporal downsampling factor
        (a 1-frame image prompt into the 4x time-compressing MAGVIT2
        especially) are edge-padded at the FRONT by repeating the first
        frame -- the natural lift of an image prompt to a static clip; the
        newest real frames keep their positions next to the causal
        boundary. The reference never hits this (it only ran
        time-preserving tokenizers, `genie.py:65-105`)."""
        if prompt.ndim == 4:
            prompt = prompt[:, None]
        t_down = self.tokenizer_.temporal_downsampling
        if prompt.shape[1] < t_down:
            pad = jnp.repeat(
                prompt[:, :1], t_down - prompt.shape[1], axis=1
            )
            prompt = jnp.concatenate([pad, prompt], axis=1)
        _, idxs = self.tokenizer_.tokenize(prompt)
        assert idxs.shape[1] >= 1, (
            f"prompt of {prompt.shape[1]} frame(s) tokenizes to zero token "
            "frames -- time-compressing tokenizers need prompts of at least "
            "their temporal downsampling factor"
        )
        return idxs

    def rollout_tokens(
        self,
        tokens: jnp.ndarray,
        actions: jnp.ndarray,
        key: jax.Array,
        num_frames: int,
        steps_per_frame: int = 25,
        temp: float = 1.0,
        which: str = "linear",
        top_k=None,
    ) -> jnp.ndarray:
        """KV-cached autoregressive MaskGIT rollout (the fast path).

        Per generated frame: `steps_per_frame` refinement passes over ONLY
        the new frame (temporal attention reads history K/V from per-layer
        caches; the causal FFN conv reads a cached 2-frame window), then one
        commit pass appends the frame's K/V. Compute per step is O(1) in
        history length, vs O(T) for the full re-forward
        (`rollout_tokens_full`, which also serves non-ST-attention trunks).
        The whole rollout is a single compiled program: one scan over
        frames whose body inlines the `steps_per_frame` refinement passes
        (`_refine_frame(unroll=True)` -- a nested refine loop reading the
        scan-carried KV cache costs ~40% extra per step on v5e; see
        `_refine_frame`).

        Args:
          tokens: `(B, T0, H, W)` prompt token grid.
          actions: `(B, T0 + num_frames)` action ids.
        Returns `(B, T0 + num_frames, H, W)` tokens.
        """
        from open_genie_tpu.models.dynamics import get_schedule

        b, t0, h, w = tokens.shape
        total = t0 + num_frames
        schedule = jnp.asarray(get_schedule(steps_per_frame, (h, w), which))
        cache = self.dynamics_.init_cache(
            b, h, w, total, dtype=self._decode_dtype()
        )

        # Prefill: commit each prompt frame into the caches.
        def prefill(cache, inp):
            pos, frame, act = inp
            _, cache = self.dynamics_.decode_frame(frame, act, cache, pos)
            return cache, None

        cache, _ = lax.scan(
            prefill,
            cache,
            (
                jnp.arange(t0),
                jnp.moveaxis(tokens, 1, 0),
                jnp.moveaxis(actions[:, :t0], 1, 0),
            ),
        )

        buf = jnp.concatenate(
            [tokens, jnp.zeros((b, num_frames, h, w), tokens.dtype)], axis=1
        )
        frame_keys = jax.random.split(key, num_frames)

        def gen_frame(carry, inp):
            buf, cache = carry
            f_idx, k = inp
            tgt = t0 + f_idx
            act_t = jnp.take_along_axis(
                actions, tgt[None, None], axis=1
            )[:, 0]
            frame, cache = self._refine_frame(
                cache, tgt, act_t, k, schedule, temp, (b, h, w), buf.dtype,
                top_k=top_k, unroll=True,
            )
            buf = lax.dynamic_update_slice_in_dim(
                buf, frame[:, None], tgt, axis=1
            )
            return (buf, cache), None

        (buf, _), _ = lax.scan(
            gen_frame, (buf, cache), (jnp.arange(num_frames), frame_keys)
        )
        return buf

    def _decode_dtype(self):
        """Decode-cache dtype follows the dynamics params' dtype: bf16-cast
        inference params mean bf16 activations, so bf16 caches halve the
        KV HBM traffic; f32 params keep f32 caches."""
        try:
            return self.dynamics_.variables["params"]["tok_emb"]["embedding"].dtype
        except Exception:  # during init the param tree may not exist yet
            return jnp.float32

    def _refine_frame(
        self, cache, tgt, act_t, key, schedule, temp, bhw, dtype, top_k=None,
        unroll=False,
    ):
        """One cached MaskGIT frame generation: `len(schedule)` refinement
        passes over the new frame, then a commit pass that appends the
        finished frame's K/V + FFN window to the caches. Shared by the
        batch rollout (`rollout_tokens`) and the interactive session
        (`session_step`); token-exact between the two given the same key.

        `unroll=True` inlines the refinement scan into the caller's trace
        instead of emitting a nested `while` loop. When the caller is
        itself a scan carrying the KV cache (the batch rollout), a nested
        inner loop reading that carry costs ~+0.18 ms per refinement step
        on v5e (measured `tools/scratch_refine_ab.py`: 0.44 -> 0.65-0.70
        ms/step for every nested form -- closure capture vs dual-carry
        makes no difference, and `lax.cond` bodies or outer-loop unrolling
        are 2x worse); unrolling the INNER loop removes the nesting and
        restores the flat-loop rate. Semantically identical either way
        (same schedule, same key splits), so rollout/serve token parity is
        unaffected. Single-dispatch callers (`session_step`) keep the
        compact nested form: their cache is a plain program argument, which
        pays no nesting penalty.
        """
        b, h, w = bhw
        step_keys = jax.random.split(key, len(schedule))
        mask0 = jnp.ones((b, h * w), dtype=bool)
        code0 = jnp.zeros((b, h * w), dtype=dtype)

        def refine(carry, step_inp):
            mask, code = carry
            num_tokens, sk = step_inp
            frame = jnp.where(mask, 0, code).reshape(b, h, w)
            logits, _ = self.dynamics_.decode_frame(
                frame, act_t, cache, tgt, commit=False
            )
            mask, code = maskgit_commit(
                sk, logits.reshape(b, h * w, -1), mask, code, num_tokens,
                temp, top_k=top_k,
            )
            return (mask, code), None

        (mask, code), _ = lax.scan(
            refine, (mask0, code0), (schedule, step_keys),
            unroll=len(schedule) if unroll else 1,
        )
        frame = code.reshape(b, h, w)
        _, cache = self.dynamics_.decode_frame(frame, act_t, cache, tgt)
        return frame, cache

    # ------------------------------------------------------------------ #
    # Interactive session (streaming serving surface; see serve.py)
    # ------------------------------------------------------------------ #

    def session_prefill(
        self, prompt: jnp.ndarray, max_frames: int,
        actions: jnp.ndarray = None,
    ):
        """Start an interactive session: tokenize the prompt, allocate the
        KV caches for `t0 + max_frames` frames, and commit the prompt
        frames. Returns `(buf, cache, t0)` with `buf` zero-padded to the
        session horizon. `actions` optionally provides the prompt frames'
        action ids (defaults to zeros, like an idle controller).
        """
        tokens = self.tokenize_prompt(prompt)
        b, t0, _, _ = tokens.shape
        if actions is None:
            actions = jnp.zeros((b, t0), jnp.int32)
        buf, cache = self.session_rebase(tokens, actions[:, :t0], max_frames)
        return buf, cache, t0

    def session_rebase(
        self, tokens: jnp.ndarray, actions: jnp.ndarray, max_frames: int
    ):
        """Fresh decode caches prefilled from a trailing token window.

        The unbounded-session primitive: when a session's horizon fills,
        keep the most recent `(B, W, H, W)` token frames (with their
        `(B, W)` action ids), re-prefill, and keep playing. Restarting
        positions at zero is EXACT for attention among the kept frames --
        RoPE'd attention scores depend only on position differences -- and
        the causal FFN conv sees sequence-start padding at the window's
        left edge instead of the dropped frames' features (the standard
        sliding-window approximation; it touches only the oldest kept
        frames). Returns `(buf, cache)` with `buf` zero-padded to
        `W + max_frames`.
        """
        b, t0, h, w = tokens.shape
        cache = self.dynamics_.init_cache(
            b, h, w, t0 + max_frames, dtype=self._decode_dtype()
        )

        def prefill(cache, inp):
            pos, frame, act = inp
            _, cache = self.dynamics_.decode_frame(frame, act, cache, pos)
            return cache, None

        cache, _ = lax.scan(
            prefill,
            cache,
            (
                jnp.arange(t0),
                jnp.moveaxis(tokens, 1, 0),
                jnp.moveaxis(actions, 1, 0),
            ),
        )
        buf = jnp.concatenate(
            [tokens, jnp.zeros((b, max_frames, h, w), tokens.dtype)], axis=1
        )
        return buf, cache

    def session_step(
        self,
        buf: jnp.ndarray,
        cache,
        t,
        action: jnp.ndarray,
        key: jax.Array,
        steps_per_frame: int = 8,
        temp: float = 1.0,
        which: str = "linear",
        top_k=None,
    ):
        """Generate the frame at position `t` of the session buffer from a
        live `(B,)` action (the "press a button, get a frame" path).
        Returns `(buf, cache)`; token-exact with `rollout_tokens` given
        the per-frame key. `t` may be traced (no recompile per step).
        """
        from open_genie_tpu.models.dynamics import get_schedule

        b, _, h, w = buf.shape
        schedule = jnp.asarray(get_schedule(steps_per_frame, (h, w), which))
        frame, cache = self._refine_frame(
            cache, t, action, key, schedule, temp, (b, h, w), buf.dtype,
            top_k=top_k,
        )
        buf = lax.dynamic_update_slice_in_dim(buf, frame[:, None], t, axis=1)
        return buf, cache

    def rollout_tokens_full(
        self,
        tokens: jnp.ndarray,
        actions: jnp.ndarray,
        key: jax.Array,
        num_frames: int,
        steps_per_frame: int = 25,
        temp: float = 1.0,
        which: str = "linear",
        top_k=None,
    ) -> jnp.ndarray:
        """Autoregressive MaskGIT rollout in token space.

        Args:
          tokens: `(B, T0, H, W)` prompt token grid.
          actions: `(B, T0 + num_frames)` action ids; `actions[:, t]` drives
            the transition out of frame t.
          num_frames: frames to append (static).

        Returns `(B, T0 + num_frames, H, W)` tokens. The buffer is fixed
        shape; frame f is generated by running the dynamics over the full
        buffer with causal temporal attention (future all-masked frames
        cannot influence earlier ones), so the whole rollout compiles to one
        XLA program.
        """
        b, t0, h, w = tokens.shape
        total = t0 + num_frames
        buf = jnp.concatenate(
            [tokens, jnp.zeros((b, num_frames, h, w), tokens.dtype)], axis=1
        )
        keys = jax.random.split(key, num_frames)
        from open_genie_tpu.models.dynamics import get_schedule

        schedule = jnp.asarray(get_schedule(steps_per_frame, (h, w), which))

        def gen_frame(buf, inp):
            f_idx, k = inp  # generating frame t0 + f_idx
            tgt = t0 + f_idx
            step_keys = jax.random.split(k, steps_per_frame)

            mask0 = jnp.ones((b, h * w), dtype=bool)
            code0 = jnp.zeros((b, h * w), dtype=buf.dtype)

            # Valid-frame mask: positions > tgt are future (all-masked);
            # causal temporal attention keeps them from affecting <= tgt.
            def refine(carry, step_inp):
                mask, code = carry
                num_tokens, sk = step_inp
                frame = jnp.where(mask, 0, code).reshape(b, h, w)
                grid = lax.dynamic_update_slice_in_dim(
                    buf, frame[:, None], tgt, axis=1
                )
                logits = self.dynamics_(grid, actions[:, :total])
                logits = lax.dynamic_slice_in_dim(logits, tgt, 1, axis=1)[:, 0]
                mask, code = maskgit_commit(
                    sk, logits.reshape(b, h * w, -1), mask, code,
                    num_tokens, temp, top_k=top_k,
                )
                return (mask, code), None

            (mask, code), _ = lax.scan(
                refine, (mask0, code0), (schedule, step_keys)
            )
            buf = lax.dynamic_update_slice_in_dim(
                buf, code.reshape(b, 1, h, w), tgt, axis=1
            )
            return buf, None

        buf, _ = lax.scan(
            gen_frame, buf, (jnp.arange(num_frames), keys)
        )
        return buf

    def decode_window(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Decode a token-frame window to pixels (serving helper)."""
        return self.tokenizer_.decode_tokens(tokens)

    def init_pixel_stream(self, batch: int, h: int, w: int, t_max: int):
        """Streaming pixel-decoder states for a `t_max`-frame session
        (serving helper; see `VideoTokenizer.init_stream_cache`). State
        dtype follows the TOKENIZER's params so mixed-precision staged
        checkpoints (bf16 dynamics + f32 tokenizer) keep the streaming
        decode exactly equal to the batch decode."""
        return self.tokenizer_.init_stream_cache(
            batch, h, w, t_max, dtype=self.tokenizer_.stream_dtype()
        )

    def decode_stream_frame(self, idxs, dcache, pos):
        """Stream-decode one token frame to pixels (serving helper; exact
        vs `decode_window`, O(1) per frame -- see
        `VideoTokenizer.decode_stream`)."""
        return self.tokenizer_.decode_stream(idxs, dcache, pos)

    def __call__(
        self,
        prompt: jnp.ndarray,
        actions: jnp.ndarray,
        key: jax.Array,
        num_frames: int = 16,
        steps_per_frame: int = 25,
        temp: float = 1.0,
        top_k=None,
    ) -> jnp.ndarray:
        """Generate video from an image/video prompt and an action sequence.

        Mirrors the intended reference inference path (`genie.py:65-105`):
        tokenize prompt -> per-frame MaskGIT generation -> decode to pixels.
        Returns `(B, T0 + num_frames, H, W, C)` channels-last video.
        """
        tokens = self.tokenize_prompt(prompt)
        t0 = tokens.shape[1]
        total = t0 + num_frames
        if actions.shape[1] < total:
            pad = jnp.zeros((actions.shape[0], total - actions.shape[1]), actions.dtype)
            actions = jnp.concatenate([actions, pad], axis=1)

        tokens = self.rollout_tokens(
            tokens, actions, key, num_frames, steps_per_frame, temp,
            top_k=top_k,
        )
        return self.tokenizer_.decode_tokens(tokens)
