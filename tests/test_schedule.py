"""Unit tests for the DDPM schedule + q_sample closed form
(reference semantics: diffusion.py:165-190)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusion_tpu.core.process import q_sample, q_sample_with_noise
from tinydiffusion_tpu.core.schedule import DiffusionSchedule


def test_linear_schedule_matches_closed_form():
    sched = DiffusionSchedule.linear(1000, 1e-4, 0.02)
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas), 1 - betas, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
    )


def test_alphas_cumprod_recurrence():
    sched = DiffusionSchedule.linear(100)
    ac = np.asarray(sched.alphas_cumprod)
    al = np.asarray(sched.alphas)
    np.testing.assert_allclose(ac[1:], ac[:-1] * al[1:], rtol=1e-6)


def test_q_sample_deterministic_given_noise():
    sched = DiffusionSchedule.linear(1000)
    x0 = jnp.ones((4, 28, 28, 1))
    noise = jnp.full((4, 28, 28, 1), 0.5)
    t = jnp.array([0, 10, 500, 999])
    x_t = q_sample_with_noise(sched, x0, t, noise)
    ac = np.asarray(sched.alphas_cumprod)
    expected = np.sqrt(ac[np.asarray(t)]) * 1.0 + np.sqrt(1 - ac[np.asarray(t)]) * 0.5
    np.testing.assert_allclose(
        np.asarray(x_t)[:, 0, 0, 0], expected.astype(np.float32), rtol=1e-5
    )


def test_q_sample_statistics():
    """Mean/variance of q(x_t|x_0) over many draws match sqrt(abar)*x0, 1-abar."""
    sched = DiffusionSchedule.linear(1000)
    n = 20000
    x0 = jnp.full((n, 4), 2.0)
    t = jnp.full((n,), 300, jnp.int32)
    x_t, noise = q_sample(sched, x0, t, jax.random.PRNGKey(0))
    abar = float(sched.alphas_cumprod[300])
    assert abs(float(x_t.mean()) - 2.0 * abar**0.5) < 0.02
    assert abs(float(x_t.std()) - (1 - abar) ** 0.5) < 0.02
    assert abs(float(noise.mean())) < 0.02


def test_q_sample_latent_broadcast():
    """2-D latents broadcast like latent_diffusion.py:145-150 view(-1,1)."""
    sched = DiffusionSchedule.linear(10)
    x0 = jnp.zeros((3, 20))
    x_t, noise = q_sample(sched, x0, jnp.array([0, 5, 9]), jax.random.PRNGKey(1))
    assert x_t.shape == (3, 20) and noise.shape == (3, 20)
