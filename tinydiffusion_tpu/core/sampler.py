"""Ancestral DDPM reverse sampler, compiled to a single ``jax.lax.scan``.

Reference semantics (diffusion.py:254-276): start from x ~ N(0, I); for
t = T-1 .. 0 predict eps and update

    x <- 1/sqrt(alpha_t) * (x - (1-alpha_t)/sqrt(1-abar_t) * eps_hat)
         + sqrt(beta_t) * z,        z ~ N(0,I) for t > 0 else 0.

(The reference uses variance beta_t, not the posterior sigma-tilde^2 — we
keep that choice for parity.)

TPU-native: the reference drives 1000 Python-loop steps from the host, each
step indexing host-resident schedule tensors (an implicit host<->device sync
per step). Here the whole chain is one ``lax.scan`` inside one jitted
program: schedule tables are device arrays gathered in the loop body, the
PRNG key is threaded functionally, and only x_0 (plus optionally strided
intermediates) ever leaves the device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tinydiffusion_tpu.core.schedule import DiffusionSchedule

# apply_fn(x, t_vec) -> predicted noise; conditioning (class labels, text
# embeddings) is closed over by the caller so one sampler serves all models.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _reverse_step_with_noise(
    schedule: DiffusionSchedule,
    apply_fn: DenoiseFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    z: jnp.ndarray,
) -> jnp.ndarray:
    """One reverse-diffusion update at (scalar, traced) timestep t, with the
    step noise ``z`` supplied by the caller."""
    batch = x.shape[0]
    t_vec = jnp.full((batch,), t, dtype=jnp.int32)
    eps_hat = apply_fn(x, t_vec).astype(x.dtype)

    alpha = schedule.alphas[t]
    abar = schedule.alphas_cumprod[t]
    beta = schedule.betas[t]

    # t == 0 adds no noise (diffusion.py:267-270); a select keeps the scan
    # body branch-free.
    z = jnp.where(t > 0, z, jnp.zeros_like(z))

    mean = jax.lax.rsqrt(alpha).astype(x.dtype) * (
        x - ((1.0 - alpha) * jax.lax.rsqrt(1.0 - abar)).astype(x.dtype) * eps_hat
    )
    return mean + jnp.sqrt(beta).astype(x.dtype) * z


def _reverse_step(
    schedule: DiffusionSchedule,
    apply_fn: DenoiseFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """One reverse-diffusion update at (scalar, traced) timestep t."""
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return _reverse_step_with_noise(schedule, apply_fn, x, t, z)


def ddpm_sample(
    apply_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    dtype=jnp.float32,
    x_init: jnp.ndarray | None = None,
    noise_stream: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full T-step ancestral sampling chain as one ``lax.scan``.

    Args:
      apply_fn: denoiser, ``(x, t_vec) -> eps_hat``.
      schedule: precomputed DDPM tables.
      shape: output shape including batch, e.g. ``(16, 28, 28, 1)``.
      key: PRNG key; split internally for init noise and every step.
      x_init: optional starting noise (parity-test seam; overrides the
        internally drawn ``N(0, I)`` init).
      noise_stream: optional pre-drawn per-step noise of shape
        ``(T, *shape)``, indexed in scan order (step 0 = timestep T-1).
        The replay seam for the BASELINE acceptance criterion: identical
        weights + identical noise => images match the torch reference.

    Returns:
      x_0 samples of ``shape``.
    """
    key, init_key = jax.random.split(key)
    x = (
        x_init.astype(dtype)
        if x_init is not None
        else jax.random.normal(init_key, shape, dtype=dtype)
    )

    timesteps = jnp.arange(schedule.num_timesteps - 1, -1, -1, dtype=jnp.int32)

    if noise_stream is not None:

        def body_replay(carry, inputs):
            x, = carry
            t, z = inputs
            x = _reverse_step_with_noise(schedule, apply_fn, x, t, z.astype(dtype))
            return (x,), None

        (x,), _ = jax.lax.scan(body_replay, (x,), (timesteps, noise_stream))
        return x

    def body(carry, t):
        x, key = carry
        key, step_key = jax.random.split(key)
        x = _reverse_step(schedule, apply_fn, x, t, step_key)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, key), timesteps)
    return x


def ddpm_denoising_trajectory(
    apply_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    stride: int = 100,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Coarse strided denoising trajectory.

    Replicates ``visualize_denoising_process`` (diffusion.py:321-348), which
    steps t over ``reversed(range(0, T, stride))`` — a deliberately coarse
    T/stride-step trajectory — and records x after every update. Returns an
    array of shape ``(T // stride, *shape)``.
    """
    stride = min(stride, schedule.num_timesteps)
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, dtype=dtype)

    def body(carry, t):
        x, key = carry
        key, step_key = jax.random.split(key)
        x = _reverse_step(schedule, apply_fn, x, t, step_key)
        return (x, key), x

    timesteps = jnp.arange(schedule.num_timesteps - stride, -1, -stride, dtype=jnp.int32)
    (_, _), trajectory = jax.lax.scan(body, (x, key), timesteps)
    return trajectory
