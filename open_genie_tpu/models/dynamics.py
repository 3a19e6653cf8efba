"""MaskGIT DynamicsModel (Flax): masked token training + iterative decode.

TPU-native re-implementation of the reference `DynamicsModel`
(`/root/reference/genie/dynamics.py`). The trunk is a blueprint-assembled
factorized ST-transformer over token embeddings with additive per-frame
action embeddings (`dynamics.py:44-64`).

Key differences vs the reference (intended semantics, SURVEY.md 2.11.2):
  * `compute_loss` computes cross-entropy against the ORIGINAL tokens (the
    reference overwrites its targets with the masked fill, `dynamics.py:83,94`).
  * `generate` feeds committed tokens back into the conditioning grid each
    step (the reference conditions every step on the all-masked frame,
    `dynamics.py:136`), and runs as a single compiled `lax.scan` over a
    static schedule -- one XLA program per (T, steps) shape instead of 25
    eager dispatches per frame.
  * All randomness (Bernoulli mask rate/draws, categorical sampling) flows
    through explicit PRNG keys.
"""
from __future__ import annotations

from math import pi
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from open_genie_tpu.modules import parse_blueprint


def get_schedule(steps: int, shape: Tuple[int, int], which: str = "linear") -> np.ndarray:
    """Tokens-per-step schedule summing exactly to `h * w`.

    Matches the reference (`dynamics.py:167-195`): linear / cosine / arccos
    ramps, min 1 token per step, remainder on the last step. Computed with
    numpy -- the schedule is static under jit.
    """
    n = int(np.prod(shape))
    t = np.linspace(1, 0, steps)
    if which == "linear":
        s = 1 - t
    elif which == "cosine":
        s = np.cos(t * pi * 0.5)
    elif which == "arccos":
        s = np.arccos(t) / (pi * 0.5)
    else:
        raise ValueError(f"Unknown schedule type: {which}")
    total = s.sum()
    if steps == 1 or total <= 0:
        # Degenerate ramps (e.g. steps=1 makes a single zero weight):
        # uniform split.
        s = np.ones(steps)
        total = float(steps)
    schedule = (s / total) * n
    schedule = np.clip(np.round(schedule).astype(np.int32), 1, None)
    schedule[-1] += n - schedule.sum()
    return schedule


def maskgit_commit(
    key: jax.Array,
    logits: jnp.ndarray,
    mask: jnp.ndarray,
    code: jnp.ndarray,
    num_tokens,
    temp: float = 1.0,
    top_k: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One MaskGIT refinement commit, shared by every decode path.

    Args:
      key: PRNG key for the categorical draw.
      logits: `(B, HW, V)` raw vocab logits (any float dtype).
      mask: `(B, HW)` bool, True = still masked.
      code: `(B, HW)` committed token ids so far.
      num_tokens: tokens to commit this step (traced scalar ok).
      temp: sampling temperature.
      top_k: restrict sampling to each position's `top_k` highest logits
        (None = full vocab). The reference declares a `topk` parameter but
        never uses it (`dynamics.py:109`, SURVEY 2.11.2); this implements
        the intended knob. `top_k=1` is greedy decoding.

    Returns `(new_mask, new_code)`. Confidence is the sampled token's
    log-probability (monotone in the reference's softmax probability,
    `dynamics.py:139-148`) -- computed as `logit - logsumexp` so the
    `(B, HW, V)` softmax tensor is never materialized. The top-
    `num_tokens` selection is a descending value-sort + threshold
    compare, NOT argsort + scatter: TPU scatter serializes per update
    (B*HW of them), and in-scan profiling showed it was most of the
    sampling block's wall clock and its only batch-scaling term (the
    KV-cached model forward itself runs B=8 at B=1 latency). On an exact
    confidence tie at the threshold both positions commit (measure-zero
    for float log-probs; a step then just commits one extra token and
    later steps have fewer left).

    Sampling uses the Gumbel-argmax trick rather than an inverse-CDF
    walk: inverse-CDF draws one uniform per position (V-fold fewer PRNG
    bits) but decides by thresholding a float cumsum, and the ~1e-4
    cross-backend logit differences flip boundary draws often enough to
    break CPU<->TPU rollout parity (one flipped token cascades through
    every later MaskGIT step). Gumbel-argmax decides by an argmax whose
    margins are O(1), which held bit-exact token parity across backends
    in the PARITY_r02/r03 artifacts.

    The Gumbel noise is drawn in bf16 (then upcast for the argmax):
    in-scan profiling showed the `(B, HW, V)` noise generation is the
    rollout's only term that scales with batch (threefry bit generation;
    the KV-cached model forward is latency-bound and B=8 rides free), and
    16-bit draws need half the threefry words. Threefry is deterministic
    across backends and bf16 rounding is too, so parity is unaffected;
    the ~1e-2 noise quantization is far below the O(1) Gumbel scale and
    invisible next to the model's own bf16 logits.
    """
    b, hw, v = logits.shape
    logits = logits.astype(jnp.float32) / temp
    if top_k is not None:
        assert top_k >= 1, f"top_k must be >= 1, got {top_k}"
        if top_k < v:
            kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
    # Gumbel-argmax with bf16 noise (see docstring); equivalent to
    # `jax.random.categorical` up to noise dtype.
    gumbel = jax.random.gumbel(key, logits.shape, jnp.bfloat16)
    pred = jnp.argmax(logits + gumbel.astype(jnp.float32), axis=-1)  # (B, HW)
    logp = jnp.take_along_axis(logits, pred[..., None], axis=-1)[..., 0]
    conf = logp - jax.scipy.special.logsumexp(logits, axis=-1)
    conf = jnp.where(mask, conf, -jnp.inf)

    sorted_conf = -jnp.sort(-conf, axis=-1)  # (B, HW) descending
    idx = jnp.clip(num_tokens - 1, 0, hw - 1)
    thr = jnp.take_along_axis(
        sorted_conf, jnp.broadcast_to(jnp.reshape(idx, (1, 1)), (b, 1)), axis=1
    )  # (B, 1): the num_tokens-th best confidence per row
    commit = (conf >= thr) & mask

    code = jnp.where(commit, pred.astype(code.dtype), code)
    return mask & ~commit, code


class DynamicsModel(nn.Module):
    """MaskGIT over `(B, T, H, W)` token grids with `(B, T)` action ids."""

    desc: Any  # Blueprint
    tok_vocab: int
    act_vocab: int
    embed_dim: int
    # remat is opt-in here: token grids are small (memory is not the
    # constraint) and the KV-cached decode path calls layers with kwargs,
    # which lifted remat does not support.
    remat: Any = False

    def setup(self):
        self.layers, self.ext_kw = parse_blueprint(self.desc, remat=self.remat)
        self.tok_emb = nn.Embed(self.tok_vocab, self.embed_dim)
        self.act_emb = nn.Embed(self.act_vocab, self.embed_dim)
        self.head = nn.Dense(self.tok_vocab)

    def __call__(
        self,
        tokens: jnp.ndarray,
        act_id: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        """Token/action grids -> per-position vocab logits `(B, T, H, W, V)`.

        Actions are embedded per frame and broadcast-added over the spatial
        grid (`dynamics.py:34-38,55`).
        """
        x = self.tok_emb(tokens) + self.act_emb(act_id)[:, :, None, None, :]
        for layer, has_ext in zip(self.layers, self.ext_kw):
            x = layer(x, None, None, train)
        return self.head(x)

    # ------------------------------------------------------------------ #
    # Cached frame-decode path (TPU rollout fast path)
    # ------------------------------------------------------------------ #

    @nn.nowrap
    def supports_cached_decode(self) -> bool:
        """Static capability check: the KV-cached decode path requires an
        all-`space-time_attn` trunk (the stock dynamics blueprints). Other
        trunks fall back to full re-forwards in `generate` -- explicitly,
        so a genuine assertion failure inside the cached path is never
        silently swallowed into the 6x slower fallback."""
        for desc in self.desc:
            name = desc if isinstance(desc, str) else desc[0]
            if name != "space-time_attn":
                return False
        return True

    @nn.nowrap
    def init_cache(self, batch: int, h: int, w: int, t_max: int, dtype=jnp.float32):
        """Zeroed per-layer decode caches for a `t_max`-frame rollout.

        Requires an all-`space-time_attn` trunk (the stock dynamics
        blueprints). Each layer carries temporal KV buffers
        `(B*H*W, heads, t_max, d_head)`, a `(B, k_t - 1, H, W, time_hid)`
        window of POST-GroupNorm pre-conv features for the causal FFN
        (per-frame GN is frame-local, so zeros here are exactly the full
        forward's causal zero padding), and `fh` `(B, 1, H, W, d_out)` --
        the window's precomputed contribution to the next position's FFN
        output, so refine steps run a single-time-tap conv. Layer dims
        are read from the blueprint descriptors directly (constructing
        Flax modules inside a bound method is forbidden).
        """
        from open_genie_tpu.modules.attention import st_attn_cache

        caches = []
        for desc in self.desc:
            if isinstance(desc, str):
                desc = (desc, {})
            name, kwargs = desc
            assert name == "space-time_attn", (
                "cached decode requires an all-space-time_attn dynamics trunk"
            )
            for _ in range(int(kwargs.get("n_rep", 1))):
                caches.append(
                    st_attn_cache(kwargs, batch, h, w, t_max, dtype)
                )
        return caches

    def decode_frame(
        self,
        frame_tok: jnp.ndarray,
        act_id: jnp.ndarray,
        cache,
        pos,
        train: bool = False,
        commit: bool = True,
    ):
        """One-frame forward against cached history.

        Args:
          frame_tok: `(B, H, W)` tokens of the frame at time `pos`.
          act_id: `(B,)` action ids for this frame.
          cache/pos: decode caches (see `init_cache`) and the frame index.
          commit: True writes this frame's K/V + FFN window into the
            returned cache (prefill / final frame commit). False computes
            the same logits READ-ONLY and returns the cache unchanged --
            MaskGIT refinement steps drop the cache anyway, and a
            written-then-discarded buffer forces XLA to materialize a full
            cache copy per refine step (the dominant HBM traffic of the
            rollout at batch > 1).

        Returns `(logits (B, H, W, V), new_cache)`. Compute is O(1) in
        history length (keys are read from the cache), vs the reference's
        full re-forward per MaskGIT step (`dynamics.py:136`).
        """
        x = self.tok_emb(frame_tok[:, None]) + self.act_emb(act_id[:, None])[
            :, :, None, None, :
        ]
        new_cache = []
        for layer, layer_cache in zip(self.layers, cache):
            x, c = layer(
                x, cache=layer_cache, cache_pos=pos, train=train,
                cache_write=commit,
            )
            new_cache.append(c)
        logits = self.head(x[:, 0])
        return logits, new_cache

    def compute_loss(
        self,
        tokens: jnp.ndarray,
        act_id: jnp.ndarray,
        key: jax.Array,
        mask: Optional[jnp.ndarray] = None,
        fill: int = 0,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, dict]:
        """Bernoulli-masked token cross-entropy (`dynamics.py:66-99`).

        Mask rate ~ U(0.5, 1); loss only on masked positions, against the
        original (pre-fill) tokens. Gradients do not flow into `act_id`
        (int indices carry none anyway; the reference's `.detach()` guards
        the same boundary).
        """
        b, t, h, w = tokens.shape
        if mask is None:
            key_rate, key_mask = jax.random.split(key)
            rate = jax.random.uniform(key_rate, (), minval=0.5, maxval=1.0)
            mask = jax.random.bernoulli(key_mask, rate, (b, t, h, w))

        inp = jnp.where(mask, jnp.asarray(fill, tokens.dtype), tokens)
        logits = self(inp, act_id, train=train)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_logp = jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
        masked = mask.astype(jnp.float32)
        loss = -(tok_logp * masked).sum() / jnp.maximum(masked.sum(), 1.0)

        acc = (
            (jnp.argmax(logits, axis=-1) == tokens).astype(jnp.float32) * masked
        ).sum() / jnp.maximum(masked.sum(), 1.0)
        return loss, {"masked_frac": masked.mean(), "masked_acc": acc}

    def generate(
        self,
        tokens: jnp.ndarray,
        act_id: jnp.ndarray,
        key: jax.Array,
        steps: int = 10,
        which: str = "linear",
        temp: float = 1.0,
        masked_tok: int = 0,
        use_cache: bool = True,
        top_k: Optional[int] = None,
    ) -> jnp.ndarray:
        """Append one frame via iterative confidence-based masked decoding.

        Args:
          tokens: history `(B, T, H, W)` int token grid.
          act_id: `(B, T)` actions; `act_id[:, -1]` is the action driving the
            new frame. The appended (all-masked) frame carries a zero action
            slot, matching the reference's `mock` (`dynamics.py:126`).
          key: PRNG key for the per-step categorical sampling.
          steps/which/temp: schedule config (static under jit).
          use_cache: run refinement through the KV-cached single-frame
            decode (O(1) in history per step); falls back to full
            re-forwards for trunks without decode support.

        Returns `(B, T+1, H, W)` tokens with the generated frame appended.
        """
        if use_cache and self.supports_cached_decode():
            return self._generate_cached(
                tokens, act_id, key, steps, which, temp, masked_tok,
                top_k,
            )
        b, t, h, w = tokens.shape
        schedule = jnp.asarray(get_schedule(steps, (h, w), which))
        keys = jax.random.split(key, steps)

        new_frame = jnp.full((b, 1, h, w), masked_tok, dtype=tokens.dtype)
        buf = jnp.concatenate([tokens, new_frame], axis=1)
        acts = jnp.concatenate(
            [act_id, jnp.zeros((b, 1), act_id.dtype)], axis=1
        )

        mask0 = jnp.ones((b, h * w), dtype=bool)
        code0 = jnp.full((b, h * w), masked_tok, dtype=tokens.dtype)

        def step(carry, inp):
            mask, code = carry
            num_tokens, k = inp

            # Condition on the committed-so-far frame (bug fix vs reference).
            frame = jnp.where(mask, masked_tok, code).reshape(b, h, w)
            grid = buf.at[:, -1].set(frame)
            logits = self(grid, acts)[:, -1]  # (B, H, W, V)
            mask, code = maskgit_commit(
                k, logits.reshape(b, h * w, -1), mask, code, num_tokens,
                temp, top_k=top_k,
            )
            return (mask, code), None

        (mask, code), _ = lax.scan(step, (mask0, code0), (schedule, keys))
        return buf.at[:, -1].set(code.reshape(b, h, w))

    def _generate_cached(
        self, tokens, act_id, key, steps, which, temp, masked_tok,
        top_k=None,
    ) -> jnp.ndarray:
        """Cache-backed `generate`: prefill the history once, then refine
        only the new frame (the reference re-forwards the full sequence
        every step, `dynamics.py:136`)."""
        b, t, h, w = tokens.shape
        cache = self.init_cache(b, h, w, t + 1)
        schedule = jnp.asarray(get_schedule(steps, (h, w), which))
        keys = jax.random.split(key, steps)

        def prefill(cache, inp):
            pos, frame, act = inp
            _, cache = self.decode_frame(frame, act, cache, pos)
            return cache, None

        cache, _ = lax.scan(
            prefill,
            cache,
            (jnp.arange(t), jnp.moveaxis(tokens, 1, 0),
             jnp.moveaxis(act_id, 1, 0)),
        )

        act_new = jnp.zeros((b,), act_id.dtype)  # reference's `mock` action
        mask0 = jnp.ones((b, h * w), dtype=bool)
        code0 = jnp.full((b, h * w), masked_tok, dtype=tokens.dtype)

        def step(carry, inp):
            mask, code = carry
            num_tokens, k = inp
            frame = jnp.where(mask, masked_tok, code).reshape(b, h, w)
            logits, _ = self.decode_frame(frame, act_new, cache, t,
                                          commit=False)
            mask, code = maskgit_commit(
                k, logits.reshape(b, h * w, -1), mask, code, num_tokens,
                temp, top_k=top_k,
            )
            return (mask, code), None

        (mask, code), _ = lax.scan(step, (mask0, code0), (schedule, keys))
        return jnp.concatenate(
            [tokens, code.reshape(b, 1, h, w)], axis=1
        )
