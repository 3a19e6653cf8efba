"""Interactive serving: a stateful streaming session over a trained Genie.

The reference has no serving path at all (its `Genie` class is
non-functional, SURVEY.md 2.11.1); this is the "playable world model"
surface Genie-style systems exist for: press an action, get the next
frame. TPU-shaped design:

  * ONE compiled step program for the whole session: the dynamics KV
    caches are fixed-size (allocated for the session horizon at reset)
    and the frame position is a traced scalar, so stepping never
    recompiles and per-step compute is O(1) in history length.
  * Sessions are UNBOUNDED in length: when the horizon fills, the session
    rebases onto the trailing half of the token window (fresh caches, one
    prefill scan, positions restart at zero -- exact for RoPE attention)
    and keeps playing.
  * Pixel decode runs over a fixed-length sliding window of token frames
    (static shape -> one compiled decode). The window is needed for
    exactness-in-practice: the MAGVIT2-style decoder's GroupNorm pools
    statistics over time, so it is not strictly time-causal; `pixel_window`
    trades context for latency (the dynamics side IS exactly causal and
    token-exact vs the batch rollout, pinned by tests/test_serve.py).
  * All stochasticity keyed: `reset(seed)` derives one key per future
    frame, matching `Genie.rollout_tokens`' key split so an interactive
    session replays a batch rollout bit-for-bit when fed the same actions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from open_genie_tpu.models.genie import Genie
from open_genie_tpu.models.tokenizer import VideoTokenizer


class InteractiveSession:
    """Stateful action->frame loop over a trained Genie.

    Usage:
        sess = InteractiveSession(genie, params, max_frames=64)
        first = sess.reset(prompt_video, seed=0)   # (B, T0*, H, W, C)
        frame = sess.step(action_id)               # (B, H, W, C) each call
    """

    def __init__(
        self,
        genie: Genie,
        params,
        max_frames: int = 64,
        steps_per_frame: int = 8,
        temp: float = 1.0,
        which: str = "linear",
        pixel_window: int = 4,
        top_k=None,
        stream: bool = None,
    ) -> None:
        self.genie = genie
        self.params = params if "params" in params else {"params": params}
        self.max_frames = max_frames
        self.pixel_window = pixel_window
        # Streaming pixel decode: when the decoder blueprint is strictly
        # time-causal with finite state (`VideoTokenizer.stream_decodable`),
        # each step decodes ONLY the new token frame against cached decoder
        # state -- EXACT vs the batch decode and O(1) per frame, vs the
        # sliding-window fallback's `pixel_window` x redundant re-decode
        # (needed for stacks with time-pooled GroupNorm, e.g. stock
        # MAGVIT2). `stream=None` auto-detects; False forces the window.
        if stream is None:
            stream = VideoTokenizer(**genie.tokenizer).stream_decodable()
        self.stream = bool(stream)

        self._prefill = jax.jit(
            lambda p, prompt, acts: genie.apply(
                p, prompt, max_frames, actions=acts,
                method=genie.session_prefill,
            )
        )
        self._rebase = jax.jit(
            lambda p, toks, acts: genie.apply(
                p, toks, acts, max_frames, method=genie.session_rebase,
            )
        )
        # Sliding-window decode with a TRACED window start: one compile,
        # no per-step recompilation. For the first few steps (t < window)
        # the clamped window can include not-yet-generated zero frames;
        # the causal convs keep them from leaking into earlier frames and
        # only the (time-pooled) GroupNorm statistics see them.
        def _decode_last(p, buf, t):
            w = min(pixel_window, buf.shape[1])  # short-horizon sessions
            window = jax.lax.dynamic_slice_in_dim(
                buf, jnp.maximum(t - w, 0), w, axis=1
            )
            pixels = genie.apply(p, window, method=genie.decode_window)
            # The newest generated TOKEN frame sits at min(t, w) - 1 inside
            # the clamped window: for t < w the window starts at 0 and
            # extends PAST t into not-yet-generated zero frames, so the
            # last window slot is not the new frame. Time-expanding
            # decoders emit `tf` pixel frames per token frame (tf static
            # from the traced shapes); the step's display frame is the
            # newest token frame's LAST pixel sub-frame.
            tf = pixels.shape[1] // w
            return jax.lax.dynamic_index_in_dim(
                pixels, jnp.minimum(t, w) * tf - 1, axis=1, keepdims=False
            )

        # Token step + newest-frame decode FUSED into one compiled program:
        # an interactive step is then exactly ONE device dispatch plus the
        # (B, H', W', C) frame transfer. Over remote/tunneled backends each
        # dispatch is a synchronous RPC (~10-30 ms), so halving the
        # dispatches per frame is the dominant serving-latency lever; on a
        # local chip it also lets XLA overlap the decode's first convs with
        # the refine scan's tail. The carry buffers (token window + KV
        # caches, the big one) are donated: the step updates them in place
        # instead of allocating a fresh ~50 MB cache copy every frame.
        # The frame counter `t` rides in the donated on-device carry too:
        # uploading it per step would cost one extra host->device RPC per
        # frame over a tunneled backend (the action id is then the ONLY
        # per-step upload).
        def _step_decode(p, buf, cache, t, act, key):
            buf, cache = genie.apply(
                p, buf, cache, t, act, key,
                steps_per_frame=steps_per_frame, temp=temp, which=which,
                top_k=top_k, method=genie.session_step,
            )
            return buf, cache, t + 1, _decode_last(p, buf, t + 1)

        self._step_decode = jax.jit(_step_decode, donate_argnums=(1, 2, 3))

        # ---- streaming-decode variants (self.stream) ------------------ #
        # Decoder states live on-device beside the dynamics KV caches; a
        # step decodes ONLY the new token frame (exact, O(1) work) inside
        # the same single dispatch as the token step.

        def _stream_prefill_decode(p, buf, t0):
            """Fresh decoder stream states prefilled over `buf[:, :t0]`
            (`t0` static); returns `(dcache, pixels (B, t0*tf, H', W', C))`."""
            b, horizon, h, w = buf.shape
            dcache = genie.apply(
                p, b, h, w, horizon, method=genie.init_pixel_stream
            )

            def body(dc, inp):
                pos, frame = inp
                pix, dc = genie.apply(
                    p, frame, dc, pos, method=genie.decode_stream_frame
                )
                return dc, pix

            dcache, pix = lax.scan(
                body, dcache,
                (jnp.arange(t0), jnp.moveaxis(buf[:, :t0], 1, 0)),
            )
            pix = jnp.moveaxis(pix, 0, 1)  # (B, t0, tf, H', W', C)
            pixels = pix.reshape(pix.shape[0], -1, *pix.shape[3:])
            return dcache, pixels

        def _reset_stream(p, prompt, acts):
            buf, cache, t0 = genie.apply(
                p, prompt, max_frames, actions=acts,
                method=genie.session_prefill,
            )
            dcache, pixels = _stream_prefill_decode(p, buf, t0)
            return buf, cache, dcache, t0, pixels

        self._reset_stream = jax.jit(_reset_stream)

        def _rebase_stream(p, toks, acts):
            buf, cache = genie.apply(
                p, toks, acts, max_frames, method=genie.session_rebase,
            )
            dcache, _ = _stream_prefill_decode(p, buf, toks.shape[1])
            return buf, cache, dcache

        self._rebase_stream = jax.jit(_rebase_stream)

        def _step_decode_stream(p, buf, cache, dcache, t, act, key):
            buf, cache = genie.apply(
                p, buf, cache, t, act, key,
                steps_per_frame=steps_per_frame, temp=temp, which=which,
                top_k=top_k, method=genie.session_step,
            )
            frame_tok = lax.dynamic_index_in_dim(buf, t, axis=1, keepdims=False)
            pix, dcache = genie.apply(
                p, frame_tok, dcache, t, method=genie.decode_stream_frame
            )
            # Time-expanding decoders emit tf pixel frames per token frame;
            # the step's display frame is the newest one.
            return buf, cache, dcache, t + 1, pix[:, -1]

        self._step_decode_stream = jax.jit(
            _step_decode_stream, donate_argnums=(1, 2, 3, 4)
        )
        # Exact prompt decode (static prompt length; compiles once per
        # prompt shape).
        self._decode_prefix = jax.jit(
            lambda p, tokens: genie.apply(p, tokens, method=genie.decode_window)
        )
        self._buf = self._cache = self._dcache = self._t_dev = None
        self._t = 0
        self._t0 = 0
        self._keys = None
        self._acts = []
        self._seed = 0
        self._rebases = 0

    # ---------------------------------------------------------------- #

    def reset(self, prompt, seed: int = 0, prompt_actions=None) -> np.ndarray:
        """Start a session from an image/video prompt; returns the prompt's
        decoded pixels. `prompt_actions` optionally supplies the action ids
        of the prompt frames (`(B, T0)`, defaults to zeros). One compile on
        first use per prompt shape."""
        prompt = jnp.asarray(prompt)
        if prompt.ndim == 4:
            prompt = prompt[:, None]
        if prompt_actions is None:
            prompt_actions = jnp.zeros(
                (prompt.shape[0], prompt.shape[1]), jnp.int32
            )
        prompt_actions = jnp.asarray(prompt_actions, jnp.int32)
        if self.stream:
            buf, cache, dcache, t0, pixels = self._reset_stream(
                self.params, prompt, prompt_actions
            )
            self._dcache = dcache
        else:
            buf, cache, t0 = self._prefill(self.params, prompt, prompt_actions)
        self._buf, self._cache = buf, cache
        self._t0 = int(t0)
        self._t = self._t0
        # On-device frame counter (one upload per reset/rebase, none per
        # step); `self._t` stays the host-side mirror for bookkeeping.
        self._t_dev = jnp.asarray(self._t, jnp.int32)
        self._seed = seed
        self._rebases = 0
        # Constant rebase width, fixed at reset: every rebase keeps the
        # same number of trailing frames, so buffer/cache shapes change at
        # most ONCE (first rebase) and later rebases reuse the compiled
        # programs (cold compiles dominate on tunneled TPUs).
        self._keep = max(1, (self._t0 + self.max_frames) // 2)
        # Per-frame action history (trimmed to the live window on rebase);
        # prompt frames take the same `actions[:, :t0]` slice the prefill
        # committed into the caches.
        self._acts = [prompt_actions[:, i] for i in range(self._t0)]
        self._keys = list(
            jax.random.split(jax.random.PRNGKey(seed), self.max_frames)
        )
        if not self.stream:
            pixels = self._decode_prefix(self.params, buf[:, : self._t0])
        return np.asarray(pixels)

    def step(self, action) -> np.ndarray:
        """Advance one frame with `action` (int or `(B,)` array); returns
        the new frame's pixels `(B, H', W', C)`. Sessions are UNBOUNDED:
        when the preallocated horizon fills, the session rebases -- keeps
        the most recent half of the token window, re-prefills fresh
        caches, and keeps playing (sliding-window context)."""
        return np.asarray(self.step_nosync(action))

    def step_nosync(self, action):
        """`step` without the host transfer: returns the new frame as a
        DEVICE array and does not wait for execution. Lets a caller chain
        many steps back-to-back (async dispatch keeps the device busy) and
        sync once at the end -- on remote-tunneled TPUs this is how the
        bench separates device compute time from tunnel round-trip time,
        and it is the right serving loop when the consumer of the pixels
        is itself on-device (e.g. an encoder for agent observations)."""
        assert self._buf is not None, "call reset() first"
        if self._t - self._t0 >= self.max_frames:
            self._renew()
        b = self._buf.shape[0]
        act = jnp.broadcast_to(jnp.asarray(action, jnp.int32), (b,))
        key = self._keys[self._t - self._t0]
        try:
            if self.stream:
                self._buf, self._cache, self._dcache, self._t_dev, frame = (
                    self._step_decode_stream(
                        self.params, self._buf, self._cache, self._dcache,
                        self._t_dev, act, key,
                    )
                )
            else:
                self._buf, self._cache, self._t_dev, frame = self._step_decode(
                    self.params, self._buf, self._cache, self._t_dev, act, key,
                )
        except Exception as exc:
            # The step donates the session carries (buffer + KV caches) to
            # run in place; a dispatch that dies mid-execution may have
            # consumed them. Invalidate the session explicitly so the
            # failure mode is a clear contract, not a later cryptic
            # "Array has been deleted".
            self._buf = self._cache = self._dcache = self._t_dev = None
            raise RuntimeError(
                "InteractiveSession.step failed mid-dispatch; the donated "
                "session state may be lost -- call reset() to start a new "
                "session"
            ) from exc
        self._t += 1
        self._acts.append(act)
        return frame

    def _renew(self) -> None:
        """Rebase onto the trailing `self._keep` token frames: positions
        restart at zero (exact for RoPE attention -- scores depend only on
        position differences), a fresh cache is prefilled from the kept
        frames, and a new per-horizon key schedule is derived. Costs one
        prefill scan (~one frame's decode work per kept frame) every
        `max_frames` steps; the constant keep width means only the FIRST
        rebase introduces a new buffer shape (one compile), later rebases
        reuse the compiled programs."""
        keep = self._keep
        toks = self._buf[:, self._t - keep : self._t]
        acts = jnp.stack(self._acts[-keep:], axis=1)
        if self.stream:
            self._buf, self._cache, self._dcache = self._rebase_stream(
                self.params, toks, acts
            )
        else:
            self._buf, self._cache = self._rebase(self.params, toks, acts)
        self._acts = self._acts[-keep:]
        self._t0 = keep
        self._t = keep
        self._t_dev = jnp.asarray(self._t, jnp.int32)
        self._rebases += 1
        self._keys = list(jax.random.split(
            jax.random.fold_in(
                jax.random.PRNGKey(self._seed), self._rebases
            ),
            self.max_frames,
        ))

    @property
    def tokens(self) -> np.ndarray:
        """Token buffer so far `(B, t, H, W)` (generated prefix only)."""
        return np.asarray(self._buf[:, : self._t])
