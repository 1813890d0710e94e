"""Latent denoisers (MLP UNet + DiT) and the latent train/sample path
(reference: latent_diffusion.py:16-128, diffusion_transformer.py:16-109)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.models.dit import DiT
from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
from tinydiffusion_tpu.models.vae_mnist import VAEMnist
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_latent_train_step,
)

B, LATENT = 8, 20


def _latent_args(batch=B):
    return (
        jnp.zeros((batch, LATENT), jnp.float32),
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )


@pytest.mark.parametrize(
    "model_cls",
    [MLPUNetLatent, pytest.param(DiT, marks=pytest.mark.heavy)],
)
def test_latent_model_shapes(model_cls):
    model = model_cls()
    args = _latent_args()
    variables = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(variables, *args, train=False)
    assert out.shape == (B, LATENT)


def test_mlp_unet_param_structure():
    model = MLPUNetLatent()
    variables = model.init(jax.random.PRNGKey(0), *_latent_args())
    expected = {
        "time_embedding", "class_embedding", "initial_fc", "enc1", "enc2", "enc3",
        "bottleneck", "dec3", "dec2", "dec1", "final_fc",
        "time_proj1", "time_proj2", "time_proj3",
    }
    assert set(variables["params"].keys()) == expected
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 0.8e6 < n < 2.5e6, n  # ~1.3M (SURVEY.md section 2)


def test_dit_param_structure_and_size():
    model = DiT()
    variables = model.init(jax.random.PRNGKey(0), *_latent_args())
    params = variables["params"]
    assert "pos_encoding" in params
    assert {"block0", "block1", "block2", "block3"} <= set(params.keys())
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 2e6 < n < 5e6, n  # ~3.2M (SURVEY.md section 2)


def test_dit_dropout_train_vs_eval():
    model = DiT(dropout=0.5)
    args = _latent_args()
    variables = model.init(jax.random.PRNGKey(0), *args)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, LATENT)), jnp.float32)
    t = jnp.full((B,), 10, jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    eval1 = model.apply(variables, x, t, y, train=False)
    eval2 = model.apply(variables, x, t, y, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    tr1 = model.apply(variables, x, t, y, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    tr2 = model.apply(variables, x, t, y, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_dit_conditioning_changes_output():
    model = DiT()
    args = _latent_args()
    variables = model.init(jax.random.PRNGKey(0), *args)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, LATENT)), jnp.float32)
    t = jnp.full((B,), 10, jnp.int32)
    a = model.apply(variables, x, t, jnp.zeros((B,), jnp.int32), train=False)
    b = model.apply(variables, x, t, jnp.full((B,), 3, jnp.int32), train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
@pytest.mark.parametrize("model_cls", [MLPUNetLatent, DiT])
def test_latent_train_step_decreases_loss(model_cls):
    vae = VAEMnist()
    vae_params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 1)), jax.random.PRNGKey(1)
    )["params"]
    model = model_cls()
    schedule = DiffusionSchedule.linear(100)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, _latent_args(), jax.random.PRNGKey(2))
    step = make_latent_train_step(vae, model, tx, schedule)
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, 28, 28, 1)), jnp.float32
    )
    y = jnp.arange(B, dtype=jnp.int32) % 10
    losses = []
    for _ in range(25):
        state, loss = step(state, vae_params, x0, y)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_dit_patchified_tokens():
    """num_tokens > 1: the TPU-first generalization of the reference's
    degenerate seq-len-1 attention (BASELINE.json: patchified latents)."""
    model = DiT(num_tokens=4, latent_dim=LATENT)  # 4 tokens x 5 dims
    args = _latent_args()
    variables = model.init(jax.random.PRNGKey(0), *args)
    assert variables["params"]["pos_encoding"].shape == (1, 4, 256)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, LATENT)), jnp.float32)
    out = model.apply(variables, x, jnp.full((B,), 5, jnp.int32),
                      jnp.zeros((B,), jnp.int32), train=False)
    assert out.shape == (B, LATENT)
    # with 4 tokens, attention is non-degenerate: permuting latent groups
    # changes the output nontrivially
    x_perm = x.reshape(B, 4, 5)[:, [1, 0, 3, 2], :].reshape(B, LATENT)
    out_perm = model.apply(variables, x_perm, jnp.full((B,), 5, jnp.int32),
                           jnp.zeros((B,), jnp.int32), train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out_perm))
