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


# ---------------------------------------------------------------- DDIM ----


def test_ddim_timesteps_endpoints_and_order():
    from tinydiffusion_tpu.core.sampler import ddim_timesteps

    for T, n in [(1000, 50), (1000, 1000), (100, 7), (10, 1), (10, 30)]:
        taus = np.asarray(ddim_timesteps(T, n))
        assert taus[0] == T - 1  # always start at max noise
        if len(taus) > 1:  # n=1 is one forward at T-1 straight to x0_hat
            assert taus[-1] == 0
        assert (np.diff(taus) < 0).all() or len(taus) == 1
        assert len(taus) == max(1, min(n, T))


def test_ddim_eps_oracle_recovers_x0_exactly():
    """With an exact ε-oracle for a fixed x0*, the DDIM (η=0) x0-prediction
    is x0* at EVERY step, so the chain output equals x0* for ANY timestep
    subsequence — the closed-form correctness check of the update rule."""
    from tinydiffusion_tpu.core.sampler import ddim_sample

    T = 100
    sched = DiffusionSchedule.linear(T)
    x0_star = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 5)), jnp.float32
    )
    sac = jnp.sqrt(sched.alphas_cumprod)
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def oracle(x, t_vec):
        t = t_vec[0]
        return (x - sac[t] * x0_star) / s1m[t]

    for n_steps in (5, 13, 50, 100):
        out = ddim_sample(
            oracle, sched, x0_star.shape, jax.random.PRNGKey(1),
            num_steps=n_steps, eta=0.0,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0_star), atol=2e-4, rtol=1e-4,
        )


def test_ddim_eta0_deterministic_in_x_init():
    """η=0 draws no per-step noise: identical x_init => identical output
    under different PRNG keys."""
    from tinydiffusion_tpu.core.sampler import ddim_sample

    sched = DiffusionSchedule.linear(40)
    apply_fn = lambda x, t: 0.3 * x
    x_init = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 4, 4, 1)), jnp.float32
    )
    a = ddim_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(0),
                    num_steps=10, eta=0.0, x_init=x_init)
    b = ddim_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(9),
                    num_steps=10, eta=0.0, x_init=x_init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_ddim_eta_positive_stochastic_and_finite():
    from tinydiffusion_tpu.core.sampler import ddim_sample

    sched = DiffusionSchedule.linear(40)
    apply_fn = lambda x, t: 0.3 * x
    x_init = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 4, 4, 1)), jnp.float32
    )
    a = ddim_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(0),
                    num_steps=10, eta=1.0, x_init=x_init)
    b = ddim_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(9),
                    num_steps=10, eta=1.0, x_init=x_init)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_make_sampler_ddim_wiring():
    """make_sampler(method='ddim') drives the conditional path end-to-end
    (tiny model, tiny chain) and rejects unknown methods."""
    import pytest

    from tinydiffusion_tpu.experiments.common import make_sampler
    from tinydiffusion_tpu.models.unet28 import UNet28

    model = UNet28(time_dim=16, base_width=4, num_classes=10)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 28, 28, 1)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32),
    )
    sched = DiffusionSchedule.linear(10)
    sampler = make_sampler(model, sched, (2, 28, 28, 1), conditional=True,
                           method="ddim", sample_steps=4)
    out = sampler(variables["params"], variables["batch_stats"],
                  jax.random.PRNGKey(1), y=jnp.array([3, 7], jnp.int32))
    assert out.shape == (2, 28, 28, 1)
    assert np.isfinite(np.asarray(out)).all()

    with pytest.raises(ValueError, match="unknown sampler method"):
        make_sampler(model, sched, (2, 28, 28, 1), method="plms")


def test_dpmpp_eps_oracle_recovers_x0_exactly():
    """With an exact ε-oracle for a fixed x0*, every x0-prediction is x0*,
    the 2M difference term (m - m_prev) vanishes, and the chain lands on
    x0* exactly for ANY step count — closed-form check of the update rule,
    including the K=1 and K=2 lower-order edge cases."""
    from tinydiffusion_tpu.core.sampler import dpmpp_sample

    T = 100
    sched = DiffusionSchedule.linear(T)
    x0_star = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 5)), jnp.float32
    )
    sac = jnp.sqrt(sched.alphas_cumprod)
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def oracle(x, t_vec):
        t = t_vec[0]
        return (x - sac[t] * x0_star) / s1m[t]

    for n_steps in (1, 2, 5, 13, 50):
        out = dpmpp_sample(
            oracle, sched, x0_star.shape, jax.random.PRNGKey(1),
            num_steps=n_steps,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0_star), atol=2e-4, rtol=1e-4,
        )


def test_dpmpp_second_order_on_gaussian_field():
    """For x0 ~ N(0, I) the exact ε-field is ε(x, t) = sqrt(1-ᾱ_t)·x and
    the probability-flow map between any two timesteps is the IDENTITY
    (every marginal is N(0, I)). DDIM's error halves per step doubling
    (first order); the 2M error must roughly QUARTER per doubling and beat
    DDIM at equal step count in the asymptotic regime."""
    from tinydiffusion_tpu.core.sampler import ddim_sample, dpmpp_sample

    sched = DiffusionSchedule.linear(1000)
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def exact_field(x, t_vec):
        return s1m[t_vec[0]] * x

    x_init = jnp.asarray(
        np.random.default_rng(4).standard_normal((4, 16)), jnp.float32
    )
    norm = float(jnp.linalg.norm(x_init))
    errs = {}
    for K in (32, 64, 128):
        d = ddim_sample(exact_field, sched, x_init.shape,
                        jax.random.PRNGKey(0), num_steps=K, x_init=x_init)
        p = dpmpp_sample(exact_field, sched, x_init.shape,
                         jax.random.PRNGKey(0), num_steps=K, x_init=x_init)
        errs[K] = (
            float(jnp.linalg.norm(d - x_init)) / norm,
            float(jnp.linalg.norm(p - x_init)) / norm,
        )
    for K, (e_ddim, e_dpmpp) in errs.items():
        assert e_dpmpp < e_ddim, (K, errs)
    # Order check: doubling steps must shrink the 2M error by >3x (second
    # order quarters it; first order would only halve it).
    assert errs[64][1] < errs[32][1] / 3, errs
    assert errs[128][1] < errs[64][1] / 3, errs


def test_dpmpp_converges_to_ddim_dense_limit():
    """Both solvers discretize the SAME probability-flow ODE: on a smooth
    nonlinear field, dpmpp at a modest step count must approach the
    dense-step DDIM solution."""
    from tinydiffusion_tpu.core.sampler import ddim_sample, dpmpp_sample

    sched = DiffusionSchedule.linear(200)
    apply_fn = lambda x, t: 0.4 * jnp.tanh(x)
    x_init = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 8)), jnp.float32
    )
    dense = ddim_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(0),
                        num_steps=200, x_init=x_init)
    p20 = dpmpp_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(0),
                       num_steps=20, x_init=x_init)
    d20 = ddim_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(0),
                      num_steps=20, x_init=x_init)
    err_p = float(jnp.linalg.norm(p20 - dense))
    err_d = float(jnp.linalg.norm(d20 - dense))
    assert err_p < err_d, (err_p, err_d)


def test_dpmpp_deterministic_in_x_init():
    """dpmpp draws no per-step noise: identical x_init => identical output
    under different PRNG keys."""
    from tinydiffusion_tpu.core.sampler import dpmpp_sample

    sched = DiffusionSchedule.linear(40)
    apply_fn = lambda x, t: 0.3 * x
    x_init = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 4, 4, 1)), jnp.float32
    )
    a = dpmpp_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(0),
                     num_steps=10, x_init=x_init)
    b = dpmpp_sample(apply_fn, sched, x_init.shape, jax.random.PRNGKey(9),
                     num_steps=10, x_init=x_init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_make_sampler_dpmpp_wiring():
    """make_sampler(method='dpmpp') runs end-to-end on a tiny conditional
    model and rejects the unsupported inpainting combination."""
    import pytest

    from tinydiffusion_tpu.experiments.common import make_sampler
    from tinydiffusion_tpu.models.unet28 import UNet28

    model = UNet28(time_dim=16, base_width=4, num_classes=10)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 28, 28, 1)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32),
    )
    sched = DiffusionSchedule.linear(10)
    sampler = make_sampler(model, sched, (2, 28, 28, 1), conditional=True,
                           method="dpmpp", sample_steps=4)
    out = sampler(variables["params"], variables["batch_stats"],
                  jax.random.PRNGKey(1), y=jnp.array([3, 7], jnp.int32))
    assert out.shape == (2, 28, 28, 1)
    assert np.isfinite(np.asarray(out)).all()

    with pytest.raises(ValueError, match="inpainting"):
        make_sampler(model, sched, (2, 28, 28, 1), method="dpmpp",
                     mask=np.ones((28, 28, 1)), x_known=np.zeros((28, 28, 1)))
