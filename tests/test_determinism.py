"""Determinism tests: identical seeds -> identical outputs.

Underpins the driver's CPU-vs-TPU parity checks (BASELINE.md): every
stochastic site takes an explicit PRNG key, so repeated runs must be
bit-identical on a given backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_genie_tpu.models.genie import Genie
from tests.test_genie import CFG

KEY = jax.random.PRNGKey(42)
T, H, W = 4, 16, 16


@pytest.fixture(scope="module")
def genie_and_params():
    model = Genie(**CFG)
    video = jnp.zeros((1, T, H, W, 3))
    params = model.init(KEY, video, KEY, method=model.init_full)
    return model, params


def test_rollout_deterministic(genie_and_params):
    model, params = genie_and_params
    tokens = jax.random.randint(KEY, (1, 2, 4, 4), 0, 2 ** 6)
    actions = jnp.zeros((1, 5), jnp.int32)
    k = jax.random.PRNGKey(7)
    a = model.apply(params, tokens, actions, k, num_frames=3,
                    steps_per_frame=3, method=model.rollout_tokens)
    b = model.apply(params, tokens, actions, k, num_frames=3,
                    steps_per_frame=3, method=model.rollout_tokens)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rollout_key_sensitivity(genie_and_params):
    model, params = genie_and_params
    tokens = jax.random.randint(KEY, (1, 2, 4, 4), 0, 2 ** 6)
    actions = jnp.zeros((1, 5), jnp.int32)
    a = model.apply(params, tokens, actions, jax.random.PRNGKey(1),
                    num_frames=2, steps_per_frame=3, method=model.rollout_tokens)
    b = model.apply(params, tokens, actions, jax.random.PRNGKey(2),
                    num_frames=2, steps_per_frame=3, method=model.rollout_tokens)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_compute_loss_deterministic(genie_and_params):
    model, params = genie_and_params
    video = jax.random.uniform(KEY, (1, T, H, W, 3))
    k = jax.random.PRNGKey(3)
    l1, _ = model.apply(params, video, k, method=model.compute_loss)
    l2, _ = model.apply(params, video, k, method=model.compute_loss)
    assert float(l1) == float(l2)


def test_train_step_deterministic():
    """Two fresh train states from the same seed take identical steps."""
    from open_genie_tpu.train.loop import (
        create_train_state, make_optimizer, make_train_step,
    )
    from tests.test_train import TOK, make_module

    module = make_module()
    sample = jnp.zeros((2, T, H, W, 3))
    batch = jax.random.uniform(KEY, (2, T, H, W, 3))
    opt = make_optimizer(lr=1e-3)

    losses = []
    for _ in range(2):
        state = create_train_state(module, sample, jax.random.PRNGKey(5), opt)
        step = make_train_step(module, opt)
        _, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[0] == losses[1]
