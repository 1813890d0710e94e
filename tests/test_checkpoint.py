"""Checkpoint round-trip tests: full-state save/restore, sidecar config,
best-metric policy (io/checkpoint.py; reference contracts at
vae.py:165-180 and latent_diffusion.py:422-430)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.io.checkpoint import (
    BestKeeper,
    checkpoint_exists,
    load_sidecar,
    restore_checkpoint,
    save_checkpoint,
)
from tinydiffusion_tpu.models.unet28 import UNet28
from tinydiffusion_tpu.train.trainer import create_train_state, make_train_step


def _state():
    model = UNet28(time_dim=16, base_width=8)
    tx = optax.adam(1e-3)
    example = (jnp.zeros((4, 28, 28, 1)), jnp.zeros((4,), jnp.int32))
    return model, tx, create_train_state(model, tx, example, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_full_state_roundtrip(tmp_path):
    model, tx, state = _state()
    schedule = DiffusionSchedule.linear(10)
    step = make_train_step(model, tx, schedule)
    x0 = jnp.ones((4, 28, 28, 1))
    for _ in range(3):
        state, _ = step(state, x0)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, config={"lr": 1e-3}, metadata={"epoch": 3})
    assert checkpoint_exists(path)

    _, tx2, template = _state()
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sidecar = load_sidecar(path)
    assert sidecar["config"]["lr"] == 1e-3
    assert sidecar["metadata"]["epoch"] == 3


@pytest.mark.slow
def test_resume_continues_identically(tmp_path):
    """Exact resume: optimizer + PRNG + step restored => identical next step
    (the capability the reference lacks, SURVEY.md section 5)."""
    model, tx, state = _state()
    schedule = DiffusionSchedule.linear(10)
    step = make_train_step(model, tx, schedule)
    x0 = jnp.ones((4, 28, 28, 1))
    state, _ = step(state, x0)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    # Branch A: continue in-process. Branch B: restore then continue.
    cont_state, loss_a = step(jax.tree_util.tree_map(jnp.copy, state), x0)
    _, _, template = _state()
    restored = restore_checkpoint(path, template)
    res_state, loss_b = step(restored, x0)
    assert float(loss_a) == float(loss_b)
    for a, b in zip(
        jax.tree_util.tree_leaves(cont_state.params),
        jax.tree_util.tree_leaves(res_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
def test_best_keeper_policy(tmp_path):
    _, _, state = _state()
    keeper = BestKeeper(str(tmp_path / "best"))
    assert keeper.update(1.0, state)          # first is best
    assert not keeper.update(1.5, state)      # worse: not saved
    assert keeper.update(0.5, state, epoch=2)  # better: saved
    assert load_sidecar(str(tmp_path / "best"))["metadata"]["metric"] == 0.5
