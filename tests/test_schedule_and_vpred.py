"""Cosine noise schedule + v-prediction objective.

Neither exists in the reference (linear betas, eps target only) — both are
standard modern-diffusion framework options (Nichol & Dhariwal 2021;
Salimans & Ho 2022) layered on the same three schedule tables, so every
consumer (q_sample, DDPM/DDIM samplers, trainers) works unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.core.process import (
    eps_from_v,
    q_sample,
    q_sample_with_noise,
    v_from_eps,
)
from tinydiffusion_tpu.core.sampler import ddim_sample, ddpm_sample
from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

B, D = 8, 20


# ---------------------------------------------------------------------------
# Cosine schedule
# ---------------------------------------------------------------------------

def test_cosine_schedule_tables_well_formed():
    """Betas in (0, 0.999], abar strictly decreasing from ~1 to ~0, and the
    three tables mutually consistent (abar == cumprod(1 - betas))."""
    for T in (50, 1000):
        sch = DiffusionSchedule.cosine(T)
        betas = np.asarray(sch.betas)
        abar = np.asarray(sch.alphas_cumprod)
        assert betas.shape == (T,)
        assert (betas > 0).all() and (betas <= 0.999).all()
        assert (np.diff(abar) < 0).all()
        assert abar[0] > 0.99 and abar[-1] < 0.01
        np.testing.assert_allclose(abar, np.cumprod(1.0 - betas), rtol=1e-5)


def test_cosine_less_aggressive_early_noise_than_linear():
    """The cosine schedule's defining property: more signal survives the
    early/middle chain (abar_cosine > abar_linear through mid-chain)."""
    T = 1000
    lin = np.asarray(DiffusionSchedule.linear(T).alphas_cumprod)
    cos = np.asarray(DiffusionSchedule.cosine(T).alphas_cumprod)
    mid = slice(T // 10, T // 2)
    assert (cos[mid] > lin[mid]).all()


def test_schedule_make_dispatch():
    sch = DiffusionSchedule.make("cosine", 100)
    assert sch.num_timesteps == 100
    lin = DiffusionSchedule.make("linear", 100)
    np.testing.assert_array_equal(
        np.asarray(lin.betas),
        np.asarray(DiffusionSchedule.linear(100).betas),
    )
    with pytest.raises(ValueError, match="unknown schedule"):
        DiffusionSchedule.make("quadratic", 100)


def test_cosine_schedule_drives_samplers():
    """q_sample + both samplers run on a cosine schedule (consumers only
    read the tables) and produce finite outputs."""
    sch = DiffusionSchedule.cosine(20)
    x0 = jnp.ones((B, D))
    t = jnp.arange(B, dtype=jnp.int32) % 20
    x_t, noise = q_sample(sch, x0, t, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x_t)).all()

    def apply_fn(x, t_vec):
        return x * 0.1  # arbitrary finite denoiser

    a = ddpm_sample(apply_fn, sch, (B, D), jax.random.PRNGKey(1))
    b = ddim_sample(apply_fn, sch, (B, D), jax.random.PRNGKey(1), num_steps=5)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(b)).all()


# ---------------------------------------------------------------------------
# v-prediction
# ---------------------------------------------------------------------------

def test_v_eps_roundtrip_identity():
    """eps_from_v(q_sample(x0, eps), v_from_eps(x0, eps)) == eps exactly
    (sa^2 + sb^2 = 1): the algebraic seam every sampler relies on."""
    sch = DiffusionSchedule.linear(100)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 100, (B,)), jnp.int32)
    x_t = q_sample_with_noise(sch, x0, t, eps)
    v = v_from_eps(sch, x0, eps, t)
    back = eps_from_v(sch, x_t, v, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(eps),
                               rtol=1e-5, atol=1e-6)


def _setup(prediction="v"):
    sch = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    tx = optax.sgd(1e-2)
    y = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y, y)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (B,)), jnp.int32)
    return sch, model, tx, state, x0, ys


def test_v_prediction_training_step():
    """prediction='v' trains (finite loss, params move) and produces a
    DIFFERENT loss than 'eps' on the same state/batch (different target)."""
    sch, model, tx, state, x0, ys = _setup()
    step_v = make_train_step(model, tx, sch, conditional=True, prediction="v")
    s_v, loss_v = step_v(_setup()[3], x0, ys)
    assert np.isfinite(float(loss_v))

    step_e = make_train_step(model, tx, sch, conditional=True)
    s_e, loss_e = step_e(_setup()[3], x0, ys)
    assert abs(float(loss_v) - float(loss_e)) > 1e-6

    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s_v.params),
                        jax.tree_util.tree_leaves(_setup()[3].params))
    )
    assert moved


def test_v_prediction_eval_matches_target():
    """The eval step with prediction='v' scores against the v target: for a
    model that outputs all-zeros... instead verify eval('v') != eval('eps')
    on the same params/key (they measure different targets)."""
    sch, model, tx, state, x0, ys = _setup()
    ev = make_eval_step(model, sch, conditional=True, prediction="v")
    ee = make_eval_step(model, sch, conditional=True)
    key = jax.random.PRNGKey(7)
    lv = float(ev(state.params, state.batch_stats, x0, key, ys))
    le = float(ee(state.params, state.batch_stats, x0, key, ys))
    assert np.isfinite(lv) and np.isfinite(le)
    assert abs(lv - le) > 1e-6


def test_v_prediction_rejects_unknown():
    sch, model, tx, state, x0, ys = _setup()
    with pytest.raises(ValueError, match="prediction"):
        make_train_step(model, tx, sch, prediction="x0")


def test_v_sampler_matches_eps_sampler_for_equivalent_models():
    """A sampler in prediction='v' mode wrapping a v-oracle equals the eps
    sampler on the eps-oracle when both oracles encode the SAME denoising
    rule (eps = 0.1 * x): conversion-at-the-call-site is exact."""
    from tinydiffusion_tpu.experiments.common import make_sampler

    sch, model, tx, state, x0, ys = _setup()

    # make_sampler needs a flax model; emulate with a module-level lambda via
    # the low-level samplers instead: v-oracle derived from the eps rule.
    def eps_fn(x, t_vec):
        return 0.1 * x

    def v_fn(x, t_vec):
        # v = (eps - sb * x) / sa  (inverse of eps_from_v at state x)
        bshape = (-1,) + (1,) * (x.ndim - 1)
        sa = sch.sqrt_alphas_cumprod[t_vec].reshape(bshape)
        sb = sch.sqrt_one_minus_alphas_cumprod[t_vec].reshape(bshape)
        return (eps_fn(x, t_vec) - sb * x) / sa

    def v_as_eps(x, t_vec):
        return eps_from_v(sch, x, v_fn(x, t_vec), t_vec)

    key = jax.random.PRNGKey(3)
    a = ddpm_sample(eps_fn, sch, (B, D), key)
    b = ddpm_sample(v_as_eps, sch, (B, D), key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_diffusion_experiment_cosine_vpred_smoke(tmp_path):
    """--noise-schedule cosine --prediction v through the flagship
    experiment, then generate.py serving (sidecar-driven sampler math)."""
    import os

    from tinydiffusion_tpu.experiments.diffusion import DiffusionConfig, run

    cfg = DiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"), compute_dtype="float32",
        max_steps_per_epoch=3, log_every=1, use_mesh=False,
        visualize_denoising=False, noise_schedule="cosine", prediction="v",
        checkpoint_path=str(tmp_path / "ckpt" / "final"),
    )
    result = run(cfg)
    assert np.isfinite(result["losses"]).all()

    import generate

    out = str(tmp_path / "vpred_samples.png")
    generate.main([
        "--checkpoint", str(tmp_path / "ckpt" / "final"),
        "--n", "4", "--out", out,
        "--sampler", "ddim", "--sample-steps", "5",
    ])
    assert os.path.exists(out)


@pytest.mark.heavy  # ~16s — re-tiered r5
def test_latent_v_prediction_step():
    """prediction='v' in the latent trainer scores against the LATENT
    z0-based v target (regression: an early draft mistakenly used the pixel
    x0, whose shape doesn't even match): loss finite and != the eps loss."""
    from tinydiffusion_tpu.models.vae_mnist import VAEMnist
    from tinydiffusion_tpu.train.trainer import make_latent_train_step

    sch = DiffusionSchedule.linear(50)
    vae = VAEMnist()
    vae_params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 1)), jax.random.PRNGKey(1)
    )["params"]
    model = MLPUNetLatent(latent_dim=20)
    tx = optax.sgd(1e-2)
    y = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, 20), jnp.float32), y, y)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((B, 28, 28, 1)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (B,)), jnp.int32)

    losses = {}
    for pred in ("eps", "v"):
        state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
        step = make_latent_train_step(vae, model, tx, sch, prediction=pred)
        _, loss = step(state, vae_params, x0, ys)
        losses[pred] = float(loss)
        assert np.isfinite(losses[pred])
    assert abs(losses["v"] - losses["eps"]) > 1e-6
