"""EMA parameter averaging (train/trainer.py _ema_update).

Production-serving feature with no reference counterpart: a shadow copy of
the params updated INSIDE the jitted step (``ema <- d*ema + (1-d)*params``),
so it behaves identically across the single-step, multi-step, and resident
paths and rides the donated state with zero extra dispatches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_multi_step,
    make_train_step,
)

B, D, DECAY = 8, 20, 0.5  # large 1-d decay so drift is visible in few steps


def _setup(ema=True):
    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    tx = optax.sgd(1e-2)
    y = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y, y)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0),
                               ema=ema)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.standard_normal((4, B, D)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (4, B)), jnp.int32)
    return schedule, model, tx, state, x0s, ys


def test_ema_matches_closed_form_recurrence():
    """Running K steps, the shadow equals the host-side recurrence over the
    per-step param snapshots, and never equals the live params."""
    schedule, model, tx, state, x0s, ys = _setup()
    step = make_train_step(model, tx, schedule, conditional=True,
                           ema_decay=DECAY)

    expected = jax.tree_util.tree_map(np.asarray, state.params)
    s = state
    for i in range(4):
        s, _ = step(s, x0s[i], ys[i])
        expected = jax.tree_util.tree_map(
            lambda e, p: e * DECAY + np.asarray(p) * (1 - DECAY),
            expected, s.params,
        )

    for e, got in zip(jax.tree_util.tree_leaves(expected),
                      jax.tree_util.tree_leaves(s.ema_params)):
        np.testing.assert_allclose(np.asarray(got), e, rtol=1e-6, atol=1e-7)
    # the shadow lags the live params (they moved 4 SGD steps)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(s.ema_params),
                        jax.tree_util.tree_leaves(s.params))
    ]
    assert max(diffs) > 0


def test_ema_multi_step_matches_sequential():
    """The lax.scan multi-step path updates the shadow exactly like K
    sequential single-step dispatches."""
    schedule, model, tx, state, x0s, ys = _setup()
    single = make_train_step(model, tx, schedule, conditional=True,
                             ema_decay=DECAY)
    s1 = state
    for i in range(4):
        s1, _ = single(s1, x0s[i], ys[i])

    _, _, _, state_b, _, _ = _setup()
    multi = make_multi_step(model, tx, schedule, k=4, conditional=True,
                            ema_decay=DECAY)
    s2, _ = multi(state_b, x0s, ys)

    for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params),
                    jax.tree_util.tree_leaves(s2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_ema_off_by_default_tree_unchanged():
    """Without the flag the state carries ema_params=None (an empty pytree
    node), so pre-EMA checkpoints restore into default templates unchanged."""
    schedule, model, tx, state, x0s, ys = _setup(ema=False)
    assert state.ema_params is None
    n_plain = len(jax.tree_util.tree_leaves(state))
    n_params = len(jax.tree_util.tree_leaves(state.params))
    step = make_train_step(model, tx, schedule, conditional=True)
    s, _ = step(state, x0s[0], ys[0])
    assert s.ema_params is None

    with_ema = _setup(ema=True)[3]
    assert len(jax.tree_util.tree_leaves(with_ema)) == n_plain + n_params


def test_ema_decay_without_shadow_raises():
    schedule, model, tx, state, x0s, ys = _setup(ema=False)
    step = make_train_step(model, tx, schedule, conditional=True,
                           ema_decay=DECAY)
    with pytest.raises(ValueError, match="ema_params"):
        step(state, x0s[0], ys[0])


def test_ema_checkpoint_roundtrip(tmp_path):
    from tinydiffusion_tpu.io.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    schedule, model, tx, state, x0s, ys = _setup()
    step = make_train_step(model, tx, schedule, conditional=True,
                           ema_decay=DECAY)
    s, _ = step(state, x0s[0], ys[0])
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, s, config={"ema_decay": DECAY})

    template = _setup()[3]
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(s.ema_params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_diffusion_experiment_ema_smoke(tmp_path):
    """--ema-decay in the flagship experiment: shadow trained + checkpointed,
    and generate.py serves from it (sidecar-driven template)."""
    import os

    from tinydiffusion_tpu.experiments.diffusion import DiffusionConfig, run

    cfg = DiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"), compute_dtype="float32",
        max_steps_per_epoch=3, log_every=1, use_mesh=False,
        visualize_denoising=False, ema_decay=0.9,
        checkpoint_path=str(tmp_path / "ckpt" / "final"),
    )
    result = run(cfg)
    assert np.isfinite(result["losses"]).all()
    state = result["state"]
    assert state.ema_params is not None
    # the shadow is a real average, not a copy of the live params
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    eleaf = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert np.abs(np.asarray(leaf) - np.asarray(eleaf)).max() > 0

    import generate

    out = str(tmp_path / "ema_samples.png")
    generate.main([
        "--checkpoint", str(tmp_path / "ckpt" / "final"),
        "--n", "4", "--out", out,
        "--sampler", "ddim", "--sample-steps", "5",
    ])
    assert os.path.exists(out)
