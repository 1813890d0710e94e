"""Tensor-parallel (model-axis) sharding on the fake 8-device mesh:
dp x tp step equals the single-device step, and params are actually
sharded across devices."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.models.unet28 import UNet28
from tinydiffusion_tpu.parallel.mesh import (
    apply_sharding,
    infer_state_sharding,
    make_mesh,
    shard_batch,
)
from tinydiffusion_tpu.train.trainer import create_train_state, make_train_step

BATCH = 16


def _setup():
    model = UNet28(time_dim=32, base_width=8)
    schedule = DiffusionSchedule.linear(50)
    tx = optax.sgd(1e-2)  # linear in grads: see test_train_dp rationale
    example = (jnp.zeros((BATCH, 28, 28, 1)), jnp.zeros((BATCH,), jnp.int32))
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 28, 28, 1)), jnp.float32
    )
    return model, schedule, tx, state, x0


def _clone(tree):
    return jax.tree_util.tree_map(jnp.copy, tree)


@pytest.mark.heavy  # ~16s — re-tiered r5
def test_infer_state_sharding_rules():
    model, schedule, tx, state, x0 = _setup()
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    shardings = infer_state_sharding(state, mesh, "model")
    # A 16-channel conv kernel (base_width 8 -> enc1 has 16 feats): sharded.
    enc1_kernel = shardings.params["enc1"]["block1"]["conv"]["kernel"]
    assert enc1_kernel.spec == P(None, None, None, "model")
    # The 1-channel head kernel: replicated (1 % 4 != 0).
    assert shardings.params["final_conv"]["kernel"].spec == P()
    # Scalars / step / rng: replicated.
    assert shardings.step.spec == P()
    # Optimizer moments unused under SGD; params themselves suffice here.


@pytest.mark.slow
def test_dp_tp_step_equals_single_device():
    model, schedule, tx, state, x0 = _setup()
    step_single = make_train_step(model, tx, schedule)
    s1, loss1 = step_single(_clone(state), x0)

    mesh = make_mesh(("data", "model"), shape=(2, 4))
    shardings = infer_state_sharding(state, mesh, "model")
    step_tp = make_train_step(
        model, tx, schedule, mesh=mesh, state_sharding=shardings
    )
    state_tp = apply_sharding(_clone(state), shardings)
    s2, loss2 = step_tp(state_tp, shard_batch(mesh, x0))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_params_physically_sharded():
    model, schedule, tx, state, x0 = _setup()
    mesh = make_mesh(("data", "model"), shape=(1, 8))
    shardings = infer_state_sharding(state, mesh, "model")
    state_tp = apply_sharding(state, shardings)
    kernel = state_tp.params["enc3"]["block1"]["conv"]["kernel"]  # (3,3,*,64)
    shard_shapes = {s.data.shape for s in kernel.addressable_shards}
    assert all(shape[-1] == kernel.shape[-1] // 8 for shape in shard_shapes)


@pytest.mark.heavy
def test_tp_multi_step_stays_finite():
    model, schedule, tx, state, x0 = _setup()
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    shardings = infer_state_sharding(state, mesh, "model")
    step_tp = make_train_step(model, tx, schedule, mesh=mesh, state_sharding=shardings)
    state_tp = apply_sharding(state, shardings)
    xb = shard_batch(mesh, x0)
    for _ in range(3):
        state_tp, loss = step_tp(state_tp, xb)
        assert np.isfinite(float(loss))
