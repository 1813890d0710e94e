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
