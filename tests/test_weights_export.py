"""Portable .npz weights format: save_weights / restore_weights round-trip
and the transparent restore_checkpoint fallback (round-4 VERDICT #2 — the
committed-zoo path: a fresh clone serves every checkpoint with zero
training, matching the reference's distributable-checkpoint flow,
latent_diffusion.py:422-429)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.io.checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    restore_weights,
    save_weights,
)
from tinydiffusion_tpu.train.trainer import create_train_state


def _small_state():
    from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent

    model = MLPUNetLatent(time_dim=16, num_classes=10, latent_dim=8)
    tx = optax.adam(1e-3)
    example = (
        jnp.zeros((4, 8), jnp.float32),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4,), jnp.int32),
    )
    return model, tx, create_train_state(
        model, tx, example, jax.random.PRNGKey(0), ema=True
    )


@pytest.mark.heavy  # ~16s — re-tiered r5
def test_weights_round_trip_struct(tmp_path):
    """Full train state -> npz (serving subset) -> fresh template."""
    model, tx, state = _small_state()
    # make params distinguishable from a fresh init
    state = state.replace(
        params=jax.tree_util.tree_map(lambda a: a + 0.25, state.params),
        step=jnp.asarray(7, jnp.int32),
    )
    path = str(tmp_path / "ckpt")
    out = save_weights(path, state, config={"latent_dim": 8}, metadata={"m": 1})
    assert os.path.exists(out) and os.path.exists(path + ".json")

    _, _, template = _small_state()
    restored = restore_weights(path, template)
    # params and ema land within bf16 cast error; step exact
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=0.02,
        )
        assert b.dtype == a.dtype  # cast back to the template dtype
    assert int(restored.step) == 7
    # opt_state / rng keep the template's values (not exported)
    for a, b in zip(
        jax.tree_util.tree_leaves(template.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_checkpoint_falls_back_to_npz(tmp_path):
    """restore_checkpoint + checkpoint_exists read the npz when the Orbax
    dir is absent — the fresh-clone serving path."""
    model, tx, state = _small_state()
    path = str(tmp_path / "zoo")
    save_weights(path, state, config={})
    assert not os.path.isdir(path)  # no Orbax dir was ever written
    assert checkpoint_exists(path)
    _, _, template = _small_state()
    restored = restore_checkpoint(path, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=0.02,
        )


def test_bare_params_tree_round_trip(tmp_path):
    """A bare params dict (the FID feature net's format) survives whole."""
    params = {
        "Conv_0": {"kernel": jnp.ones((3, 3, 1, 8)), "bias": jnp.zeros((8,))},
        "Dense_0": {"kernel": jnp.full((8, 4), 0.5)},
    }
    path = str(tmp_path / "clf")
    save_weights(path, params, config={"feature_dim": 4})
    restored = restore_weights(path, jax.tree_util.tree_map(jnp.zeros_like, params))
    np.testing.assert_allclose(
        np.asarray(restored["Dense_0"]["kernel"]), 0.5, atol=0.01
    )


def test_shape_mismatch_raises(tmp_path):
    params = {"w": jnp.zeros((4, 4))}
    path = str(tmp_path / "bad")
    save_weights(path, params)
    with pytest.raises(ValueError, match="shape"):
        restore_weights(path, {"w": jnp.zeros((4, 5))})


def test_template_missing_slot_raises(tmp_path):
    params = {"w": jnp.zeros((4,)), "extra": jnp.zeros((2,))}
    path = str(tmp_path / "extra")
    save_weights(path, params)
    with pytest.raises(ValueError, match="no slot"):
        restore_weights(path, {"w": jnp.zeros((4,))})


def test_step_prefixed_weight_subtree_not_silently_dropped(tmp_path):
    """ADVICE r4: an npz subtree named 'step_embed/...' must raise the
    template-mismatch error when the template lacks it — only the exact
    'step' scalar leaf is exempt from the unused-key check."""
    params = {"w": jnp.zeros((4,)), "step_embed": {"kernel": jnp.ones((2, 2))}}
    path = str(tmp_path / "stepish")
    save_weights(path, params)
    with pytest.raises(ValueError, match="no slot"):
        restore_weights(path, {"w": jnp.zeros((4,))})


def test_normalized_key_collision_raises(tmp_path):
    """ADVICE r4: two distinct leaves that normalize to the same flat key
    (separator characters are stripped) must refuse to save rather than
    silently dropping one."""
    params = {"a/b": jnp.zeros((2,)), "a": {"b": jnp.ones((2,))}}
    with pytest.raises(ValueError, match="collision"):
        save_weights(str(tmp_path / "coll"), params)


def test_npz_fallback_into_resume_template_warns(tmp_path, capsys):
    """ADVICE r4 (medium): restoring the serving-only npz into a template
    that carries opt_state/rng (a training-resume call site) prints the
    degraded-resume warning; a serving template (no opt_state) does not."""
    params = {"w": jnp.full((4,), 2.0)}
    path = str(tmp_path / "serve")
    save_weights(path, {"params": params, "step": jnp.asarray(7)})

    resume_template = {
        "params": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.asarray(0),
        "opt_state": {"mu": jnp.zeros((4,))},
        "rng": jax.random.PRNGKey(0),
    }
    restored = restore_checkpoint(path, resume_template)
    out = capsys.readouterr().out
    assert "optimizer state and RNG are" in out, out
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
    # opt_state untouched (template value kept)
    np.testing.assert_allclose(np.asarray(restored["opt_state"]["mu"]), 0.0)

    serve_template = {
        "params": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.asarray(0),
    }
    restore_checkpoint(path, serve_template)
    assert "optimizer state" not in capsys.readouterr().out
