"""Closed-form forward (noising) process q(x_t | x_0).

Reference semantics (diffusion.py:177-190): draw eps ~ N(0, I), return
``(sqrt(abar_t) * x_0 + sqrt(1 - abar_t) * eps, eps)`` where the per-sample
scalars broadcast over the trailing dims of ``x_0``.

TPU-native: a pure function of a PRNG key; the per-sample gather + two fused
multiply-adds happen in the same jitted program as the model forward so XLA
fuses them into the input of the first conv. The broadcast shape is computed
from ``x_0.ndim`` which covers both image ``(B, H, W, C)`` and latent
``(B, D)`` tensors (the reference hardcodes ``view(-1,1,1,1)`` vs
``view(-1,1)`` per script — latent_diffusion.py:145-150).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tinydiffusion_tpu.core.schedule import DiffusionSchedule


def q_sample(
    schedule: DiffusionSchedule,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample x_t ~ q(x_t | x_0) and return (x_t, noise)."""
    noise = jax.random.normal(key, x_0.shape, dtype=x_0.dtype)
    return q_sample_with_noise(schedule, x_0, t, noise), noise


def q_sample_with_noise(
    schedule: DiffusionSchedule,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic q_sample given an externally drawn noise tensor.

    The seam used by parity tests to replay reference-recorded eps streams.
    """
    bshape = (-1,) + (1,) * (x_0.ndim - 1)
    sqrt_ac = schedule.sqrt_alphas_cumprod[t].reshape(bshape).astype(x_0.dtype)
    sqrt_1m_ac = (
        schedule.sqrt_one_minus_alphas_cumprod[t].reshape(bshape).astype(x_0.dtype)
    )
    return sqrt_ac * x_0 + sqrt_1m_ac * noise


def v_from_eps(
    schedule: DiffusionSchedule,
    x_0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """The v-prediction training target (Salimans & Ho 2022, eq. 11):
    ``v = sqrt(abar_t) * eps - sqrt(1 - abar_t) * x_0``. No reference
    counterpart (the reference trains eps-prediction only)."""
    bshape = (-1,) + (1,) * (x_0.ndim - 1)
    sa = schedule.sqrt_alphas_cumprod[t].reshape(bshape).astype(x_0.dtype)
    sb = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(bshape).astype(x_0.dtype)
    return sa * noise - sb * x_0


def eps_from_v(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    v: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Recover the eps prediction from a v prediction at state x_t:
    ``eps = sqrt(abar_t) * v + sqrt(1 - abar_t) * x_t`` (the algebraic
    inverse of ``v_from_eps`` given ``x_t = q_sample(x_0, eps, t)``).
    Lets every eps-based sampler (DDPM scan, DDIM) serve v-trained models
    through a one-fma wrapper around ``apply_fn``."""
    bshape = (-1,) + (1,) * (x_t.ndim - 1)
    sa = schedule.sqrt_alphas_cumprod[t].reshape(bshape).astype(x_t.dtype)
    sb = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(bshape).astype(x_t.dtype)
    return sa * v + sb * x_t
