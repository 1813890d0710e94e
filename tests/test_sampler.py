"""Sampler tests: scan-based reverse chain matches a step-by-step host loop
with the identical update rule (diffusion.py:254-276 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusion_tpu.core.sampler import ddpm_denoising_trajectory, ddpm_sample
from tinydiffusion_tpu.core.schedule import DiffusionSchedule


def test_sampler_shapes_and_finiteness():
    sched = DiffusionSchedule.linear(50)
    apply_fn = lambda x, t: x * 0.1  # trivially stable "denoiser"
    out = ddpm_sample(apply_fn, sched, (4, 8, 8, 1), jax.random.PRNGKey(0))
    assert out.shape == (4, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_update_rule_matches_manual_loop():
    """Replay the scan with identical keys via a hand-written host loop."""
    T = 10
    sched = DiffusionSchedule.linear(T)
    apply_fn = lambda x, t: 0.5 * x + 0.1

    key = jax.random.PRNGKey(42)
    out = ddpm_sample(apply_fn, sched, (2, 3), key)

    # Manual replay with the same key-splitting discipline.
    key2, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, (2, 3), jnp.float32)
    alphas = np.asarray(sched.alphas)
    abar = np.asarray(sched.alphas_cumprod)
    betas = np.asarray(sched.betas)
    for t in reversed(range(T)):
        key2, step_key = jax.random.split(key2)
        eps_hat = apply_fn(x, None)
        z = jax.random.normal(step_key, x.shape, jnp.float32)
        if t == 0:
            z = jnp.zeros_like(z)
        x = (1 / np.sqrt(alphas[t])) * (
            x - ((1 - alphas[t]) / np.sqrt(1 - abar[t])) * eps_hat
        ) + np.sqrt(betas[t]) * z
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5, rtol=1e-5)


def test_sampler_uses_beta_variance_not_posterior():
    """The reference adds sqrt(beta_t)*z (diffusion.py:274), not sigma-tilde.
    With a zero denoiser and T=2 the final x depends only on those scalars."""
    sched = DiffusionSchedule.linear(2)
    apply_fn = lambda x, t: jnp.zeros_like(x)
    key = jax.random.PRNGKey(1)
    out = ddpm_sample(apply_fn, sched, (1, 4), key)

    key2, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, (1, 4), jnp.float32)
    a = np.asarray(sched.alphas)
    b = np.asarray(sched.betas)
    key2, k1 = jax.random.split(key2)
    z1 = jax.random.normal(k1, (1, 4), jnp.float32)
    x = x / np.sqrt(a[1]) + np.sqrt(b[1]) * z1
    key2, k0 = jax.random.split(key2)
    x = x / np.sqrt(a[0])  # t=0: no noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_trajectory_stride_and_shape():
    sched = DiffusionSchedule.linear(1000)
    apply_fn = lambda x, t: x * 0.0
    traj = ddpm_denoising_trajectory(
        apply_fn, sched, (2, 4, 4, 1), jax.random.PRNGKey(0), stride=100
    )
    assert traj.shape == (10, 2, 4, 4, 1)


def test_x_init_override_is_deterministic():
    sched = DiffusionSchedule.linear(5)
    apply_fn = lambda x, t: jnp.zeros_like(x)
    x_init = jnp.ones((1, 4))
    a = ddpm_sample(apply_fn, sched, (1, 4), jax.random.PRNGKey(0), x_init=x_init)
    b = ddpm_sample(apply_fn, sched, (1, 4), jax.random.PRNGKey(0), x_init=x_init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
