"""Fused q_sample Pallas kernel: distributional correctness + exact noising
algebra (interpret mode on CPU; same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.ops.qsample import q_sample_fused

# On CPU q_sample_fused falls back to the jax.random path (the TPU PRNG
# primitives have no CPU lowering); the distributional and algebraic
# contracts below hold for BOTH paths, so the suite is meaningful either way.


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.linear(1000)


def test_shapes_and_determinism(sched):
    x0 = jnp.ones((4, 28, 28, 1))
    t = jnp.array([0, 10, 500, 999])
    xt1, n1 = q_sample_fused(sched, x0, t, seed=7)
    xt2, n2 = q_sample_fused(sched, x0, t, seed=7)
    assert xt1.shape == x0.shape and n1.shape == x0.shape
    np.testing.assert_array_equal(np.asarray(xt1), np.asarray(xt2))
    xt3, _ = q_sample_fused(sched, x0, t, seed=8)
    assert not np.allclose(np.asarray(xt1), np.asarray(xt3))


def test_noising_algebra_exact(sched):
    """Given the kernel's own noise, x_t must equal the closed form."""
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((4, 28, 28, 1)),
                     jnp.float32)
    t = jnp.array([3, 123, 700, 999])
    xt, noise = q_sample_fused(sched, x0, t, seed=1)
    ac = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    expected = (
        np.sqrt(ac)[:, None, None, None] * np.asarray(x0)
        + np.sqrt(1 - ac)[:, None, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(xt), expected, atol=1e-5, rtol=1e-5)


def test_noise_is_standard_gaussian(sched):
    x0 = jnp.zeros((8, 32, 128, 1))  # 32k draws
    t = jnp.zeros((8,), jnp.int32)
    _, noise = q_sample_fused(sched, x0, t, seed=3)
    z = np.asarray(noise).ravel()
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02
    assert abs((z < 0).mean() - 0.5) < 0.02
    # tails exist but are sane
    assert 3.5 < np.abs(z).max() < 7.0


def test_rows_independent(sched):
    """Different batch rows get different noise (per-row PRNG streams)."""
    x0 = jnp.zeros((4, 28, 28, 1))
    t = jnp.zeros((4,), jnp.int32)
    _, noise = q_sample_fused(sched, x0, t, seed=5)
    n = np.asarray(noise)
    assert not np.allclose(n[0], n[1])
    corr = np.corrcoef(n[0].ravel(), n[1].ravel())[0, 1]
    assert abs(corr) < 0.05
