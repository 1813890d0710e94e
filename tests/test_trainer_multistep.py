"""make_multi_step: K scanned steps per dispatch == K sequential single steps.

The multi-step program threads the SAME carried state (params, opt state,
PRNG) through ``lax.scan`` as the single-step program does through repeated
dispatches, so losses and final params must match bitwise-ish (fp32 CPU:
tight tolerance)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
from tinydiffusion_tpu.parallel.mesh import make_mesh
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_multi_step,
    make_train_step,
)

K, B, D = 4, 8, 20


def _setup(conditional, opt="adam"):
    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    # Mesh-vs-single comparisons must use SGD: Adam's step-1 update is
    # ~sign(g), which amplifies the reduction-order noise of the sharded
    # all-reduce into visible divergence (same rule as tests/test_train_dp.py).
    tx = optax.adam(1e-3) if opt == "adam" else optax.sgd(1e-2)
    y = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y, y)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.standard_normal((K, B, D)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (K, B)), jnp.int32)
    return schedule, model, tx, state, x0s, ys


def test_multi_step_matches_sequential_single_steps():
    schedule, model, tx, state, x0s, ys = _setup(conditional=True)

    single = make_train_step(model, tx, schedule, conditional=True)
    s1 = state  # donated — rebuild a fresh state for the multi-step run
    losses1 = []
    for i in range(K):
        s1, loss = single(s1, x0s[i], ys[i])
        losses1.append(float(loss))

    _, _, _, state_b, _, _ = _setup(conditional=True)
    multi = make_multi_step(model, tx, schedule, k=K, conditional=True)
    s2, losses2 = multi(state_b, x0s, ys)

    np.testing.assert_allclose(np.asarray(losses2), np.asarray(losses1),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(s2.step) == K


@pytest.mark.heavy  # ~14s; the single-device bitwise test keeps quick coverage — r5
def test_multi_step_on_mesh_matches_single_device():
    schedule, model, tx, state, x0s, ys = _setup(conditional=True, opt="sgd")

    multi_1dev = make_multi_step(model, tx, schedule, k=K, conditional=True)
    _, losses_ref = multi_1dev(state, x0s, ys)

    mesh = make_mesh(("data",))
    schedule2, model2, tx2, state2, _, _ = _setup(conditional=True, opt="sgd")
    multi_mesh = make_multi_step(model2, tx2, schedule2, k=K,
                                 conditional=True, mesh=mesh)
    _, losses_mesh = multi_mesh(state2, x0s, ys)

    np.testing.assert_allclose(np.asarray(losses_mesh), np.asarray(losses_ref),
                               rtol=1e-4, atol=1e-5)
