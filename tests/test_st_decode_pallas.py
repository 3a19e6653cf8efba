"""Parity: fused Pallas decode kernels vs the XLA decode path.

`ops/pallas/st_decode.py` must reproduce `SpaceTimeAttention.__call__`'s
read-only decode branch (`cache_write=False`) -- same RoPE placement, LN,
fused QKV, history-masked temporal attention over the KV buffers plus the
live position, per-frame GroupNorm and single-tap FFN conv. Run in
interpreter mode on CPU; the on-chip speed A/B lives in
`tools/scratch_refine_ab.py` / PARITY.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_genie_tpu.ops.pallas.st_decode as st
from open_genie_tpu.modules.attention import SpaceTimeAttention

st._INTERPRET = True

B, H, W, C, HEADS = 2, 4, 4, 16, 2
DH = C // HEADS
T_MAX, T_CHUNK = 8, 4
KT = 3


@pytest.fixture(scope="module")
def layer_and_state():
    mod = SpaceTimeAttention(
        n_embd=C, n_head=HEADS, d_head=DH, kernel_size=KT
    )
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, 3, H, W, C), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x0, None, None, False)

    cache = {
        "k": jnp.zeros((B * H * W, HEADS, T_MAX, DH)),
        "v": jnp.zeros((B * H * W, HEADS, T_MAX, DH)),
        "ffn": jnp.zeros((B, KT - 1, H, W, C)),
        "fh": jnp.zeros((B, 1, H, W, C)),
    }
    # Commit frames past one chunk so the double-buffered multi-chunk
    # history stream is exercised (T_CHUNK=4, pos=7 -> 2 chunks).
    for pos in range(7):
        frame = jax.random.normal(
            jax.random.PRNGKey(10 + pos), (B, 1, H, W, C), jnp.float32
        )
        _, cache = mod.apply(
            params, frame, None, None, False,
            cache=cache, cache_pos=jnp.asarray(pos), cache_write=True,
        )
    return mod, params, cache


@pytest.mark.parametrize("merge", [False, True], ids=["split", "merged"])
@pytest.mark.parametrize("pos", [0, 3, 7])
def test_refine_block_matches_xla_decode(layer_and_state, pos, merge):
    mod, params, cache = layer_and_state
    x = jax.random.normal(jax.random.PRNGKey(77), (B, 1, H, W, C))
    want, _ = mod.apply(
        params, x, None, None, False,
        cache=cache, cache_pos=jnp.asarray(pos), cache_write=False,
    )
    got = st.refine_block(
        x, cache, jnp.asarray(pos), params["params"],
        heads=HEADS, t_chunk=T_CHUNK, merge_attn=merge,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5
    )


def test_dynamics_decode_dispatch_matches(monkeypatch):
    """End-to-end: DynamicsModel.decode_frame (refine, commit=False) with
    the fused-kernel dispatch enabled must match the XLA path bit-for-fp."""
    from open_genie_tpu.models.dynamics import DynamicsModel

    mod = DynamicsModel(
        desc=(("space-time_attn", {"n_embd": 128, "n_head": 2,
                                   "d_head": 64}),),
        embed_dim=128, tok_vocab=32, act_vocab=4,
    )
    b, h, w = 1, 4, 4
    toks = jax.random.randint(jax.random.PRNGKey(0), (b, 2, h, w), 0, 32)
    acts = jnp.zeros((b, 2), jnp.int32)
    params = mod.init(jax.random.PRNGKey(1), toks, acts)

    cache = mod.init_cache(b, h, w, t_max=8)
    frame = toks[:, 0]
    _, cache = mod.apply(
        params, frame, acts[:, 0], cache, jnp.asarray(0),
        method=DynamicsModel.decode_frame,
    )

    def refine(pos):
        logits, _ = mod.apply(
            params, toks[:, 1], acts[:, 1], cache, jnp.asarray(pos),
            commit=False, method=DynamicsModel.decode_frame,
        )
        return np.asarray(logits)

    want = refine(1)
    for m in ("interpret", "interpret:attn", "interpret:fuse",
              "interpret:fuse-attn"):
        monkeypatch.setenv("OGT_PALLAS_DECODE", m)
        np.testing.assert_allclose(
            refine(1), want, atol=3e-5, rtol=3e-5, err_msg=m
        )


def test_refine_block_bf16_matches_xla_decode(layer_and_state):
    """bf16 params + bf16 caches (the serving configuration): the kernel
    must track the XLA read-only branch within bf16 tolerance -- in
    particular the live position's K/V must round through the cache dtype
    like the XLA path does."""
    mod, params, cache = layer_and_state
    params16 = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params,
    )
    cache16 = {k: v.astype(jnp.bfloat16) for k, v in cache.items()}
    x = jax.random.normal(
        jax.random.PRNGKey(77), (B, 1, H, W, C)
    ).astype(jnp.bfloat16)
    want, _ = mod.apply(
        params16, x, None, None, False,
        cache=cache16, cache_pos=jnp.asarray(3), cache_write=False,
    )
    got = st.refine_block(
        x, cache16, jnp.asarray(3), params16["params"],
        heads=HEADS, t_chunk=T_CHUNK,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.1, rtol=0.05,
    )


def test_refine_block_supported_gate():
    assert st.refine_block_supported(
        512, 512, 512, 512, 8, 8, bias=False, t_max=64, hid_dim=None
    )
    assert not st.refine_block_supported(
        512, 512, 512, 512, 8, 8, bias=True, t_max=64, hid_dim=None
    )
    assert not st.refine_block_supported(
        512, 512, 512, 256, 8, 8, bias=False, t_max=64, hid_dim=None
    )
    assert not st.refine_block_supported(
        512, 512, 512, 512, 8, 8, bias=False, t_max=63, hid_dim=None
    )
