"""Mesh/sharding tests on the virtual 8-device CPU platform."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from open_genie_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_mesh_subset_and_oversubscribe():
    # Fewer devices than available: leading subset.
    mesh = make_mesh(n_data=3, n_model=2)
    assert mesh.shape == {"data": 3, "model": 2}
    # More than available: error.
    with pytest.raises(AssertionError):
        make_mesh(n_data=5, n_model=2)


def test_batch_sharding_places_shards():
    mesh = make_mesh()
    x = jnp.zeros((16, 4, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 4, 4)


def test_param_shardings_tp_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "attn": {
            "to_q": {"kernel": jnp.zeros((32, 64))},
            "to_out": {"kernel": jnp.zeros((64, 32))},
        },
        "other": {"kernel": jnp.zeros((32, 32))},
    }
    sh = param_shardings(params, mesh)
    assert sh["attn"]["to_q"]["kernel"].spec == P(None, "model")
    assert sh["attn"]["to_out"]["kernel"].spec == P("model", None)
    assert sh["other"]["kernel"].spec == P()


def test_param_shardings_skips_indivisible():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {"to_q": {"kernel": jnp.zeros((32, 63))}}  # 63 % 2 != 0
    sh = param_shardings(params, mesh)
    assert sh["to_q"]["kernel"].spec == P()


def test_data_parallel_rollout():
    """Batched MaskGIT rollout with the batch sharded over the data axis:
    GSPMD partitions the whole compiled rollout (serving-style scaling)."""
    import jax.numpy as jnp

    from open_genie_tpu.models.genie import Genie
    from open_genie_tpu.parallel.mesh import batch_sharding
    from tests.test_genie import CFG

    model = Genie(**CFG)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, 16, 16, 3))
    params = model.init(key, video, key, method=model.init_full)

    mesh = make_mesh()
    tokens = jax.device_put(
        jax.random.randint(key, (8, 2, 4, 4), 0, 2 ** 6),
        batch_sharding(mesh),
    )
    actions = jax.device_put(
        jnp.zeros((8, 4), jnp.int32), batch_sharding(mesh)
    )

    fn = jax.jit(
        lambda p, t, a, k: model.apply(
            p, t, a, k, num_frames=2, steps_per_frame=2,
            method=model.rollout_tokens,
        ),
        in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh), None),
    )
    out = fn(params, tokens, actions, jax.random.PRNGKey(1))
    assert out.shape == (8, 4, 4, 4)
    np.testing.assert_array_equal(
        np.asarray(out[:, :2]), np.asarray(jax.device_get(tokens))
    )


def test_psum_over_data_axis():
    """Collectives ride the mesh: manual shard_map reduction sanity check."""
    from jax import shard_map

    mesh = make_mesh()
    x = jnp.arange(8.0)

    f = shard_map(
        lambda v: jax.lax.psum(v, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), x.sum())


def test_sequence_parallel_temporal_attention():
    """Sequence parallelism as the factorized attention realizes it: shard
    the spatial (tube) axis of temporal attention over the mesh -- tubes
    are independent, so GSPMD partitions with no cross-device collectives
    and results match the replicated run (SURVEY.md section 5)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from open_genie_tpu.modules.attention import TemporalAttention

    mesh = make_mesh()
    mod = TemporalAttention(n_head=2, d_head=8, causal=True)
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 8, 16))
    params = mod.init(jax.random.PRNGKey(1), video)

    ref = mod.apply(params, video)

    shard = NamedSharding(mesh, P(None, None, "data", None, None))  # H axis
    fn = jax.jit(
        lambda p, v: mod.apply(p, v),
        in_shardings=(None, shard),
        out_shardings=shard,
    )
    out = fn(params, jax.device_put(video, shard))
    assert len(out.addressable_shards) == 8
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
