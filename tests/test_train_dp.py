"""Training-step tests incl. data-parallel correctness on the fake 8-device
CPU mesh (SURVEY.md section 4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.models.unet28 import UNet28
from tinydiffusion_tpu.parallel.mesh import make_mesh, shard_batch
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

BATCH = 16


def _clone(tree):
    """Deep-copy a pytree of arrays — the train step donates its input state,
    so tests sharing the module-scoped fixture must hand it a private copy."""
    return jax.tree_util.tree_map(jnp.copy, tree)


@pytest.fixture(scope="module")
def setup():
    model = UNet28(time_dim=32, base_width=8)
    schedule = DiffusionSchedule.linear(100)
    tx = optax.adam(1e-3)
    example = (jnp.zeros((BATCH, 28, 28, 1)), jnp.zeros((BATCH,), jnp.int32))
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 28, 28, 1)), jnp.float32
    )
    return model, schedule, tx, state, x0


@pytest.mark.slow
def test_loss_decreases(setup):
    model, schedule, tx, state, x0 = setup
    step = make_train_step(model, tx, schedule)
    state = _clone(state)
    losses = []
    for _ in range(30):
        state, loss = step(state, x0)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


@pytest.mark.slow
def test_dp_equals_single_device(setup):
    """DP-sharded step == unsharded step on the same global batch: SPMD
    semantics guarantee it; this asserts the mesh plumbing preserves it."""
    model, schedule, _, state, x0 = setup
    assert len(jax.devices()) == 8, "conftest must provide 8 fake devices"

    # SGD, not Adam: Adam's first-step update is ~lr*sign(g), so fp32
    # reduction-order noise on near-zero grads flips signs and the params
    # differ by 2*lr — not a sharding bug. SGD keeps the comparison linear
    # in the gradient, so any real DP semantics bug shows up loudly.
    tx = optax.sgd(1e-2)
    state = create_train_state(
        model, tx,
        (jnp.zeros((BATCH, 28, 28, 1)), jnp.zeros((BATCH,), jnp.int32)),
        jax.random.PRNGKey(0),
    )

    step_single = make_train_step(model, tx, schedule)
    mesh = make_mesh(("data",))
    step_dp = make_train_step(model, tx, schedule, mesh=mesh)

    s1, loss1 = step_single(_clone(state), x0)
    s2, loss2 = step_dp(_clone(state), shard_batch(mesh, x0))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_batch_actually_sharded(setup):
    model, schedule, tx, state, x0 = setup
    mesh = make_mesh(("data",))
    sharded = shard_batch(mesh, x0)
    # Each device holds BATCH/8 rows.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(BATCH // 8, 28, 28, 1)}


def test_eval_step_deterministic(setup):
    model, schedule, tx, state, x0 = setup
    eval_step = make_eval_step(model, schedule)
    key = jax.random.PRNGKey(3)
    l1 = eval_step(state.params, state.batch_stats, x0, key)
    l2 = eval_step(state.params, state.batch_stats, x0, key)
    assert float(l1) == float(l2)


@pytest.mark.heavy  # ~15s — re-tiered r5
def test_conditional_train_step(setup):
    _, schedule, tx, _, x0 = setup
    model = UNet28(time_dim=32, base_width=8, num_classes=10)
    y = jnp.zeros((BATCH,), jnp.int32)
    example = (x0, jnp.zeros((BATCH,), jnp.int32), y)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, schedule, conditional=True)
    state, loss = step(_clone(state), x0, y)
    assert np.isfinite(float(loss))
