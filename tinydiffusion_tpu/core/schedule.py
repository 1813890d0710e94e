"""Noise schedules for the DDPM forward/reverse processes.

Capability parity with the reference ``ForwardProcess`` (diffusion.py:165-190):
``betas = linspace(beta_start, beta_end, T)``, ``alphas = 1 - betas``,
``alphas_cumprod = cumprod(alphas)``.

TPU-native differences:
- all tables are device arrays created once and kept on device; the sampler
  gathers into them inside a ``lax.scan`` body (the reference indexes host
  tensors per step, forcing a host sync each of the 1000 steps).
- the schedule is a pytree so it can flow through ``jit`` boundaries; the
  timestep count is static aux data so loop lengths stay compile-time
  constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM schedule tables (all shape ``[T]``, float32)."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def linear(
        cls,
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        dtype: Any = jnp.float32,
    ) -> "DiffusionSchedule":
        """Linear beta schedule — the reference's only schedule (diffusion.py:173-175)."""
        betas = jnp.linspace(beta_start, beta_end, num_timesteps, dtype=dtype)
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas)
        return cls(
            betas=betas,
            alphas=alphas,
            alphas_cumprod=alphas_cumprod,
            num_timesteps=num_timesteps,
        )

    @classmethod
    def cosine(
        cls,
        num_timesteps: int = 1000,
        s: float = 0.008,
        max_beta: float = 0.999,
        dtype: Any = jnp.float32,
    ) -> "DiffusionSchedule":
        """Cosine ᾱ schedule (Nichol & Dhariwal 2021, eq. 17) — no reference
        counterpart (the reference is linear-only); a framework option.

        ᾱ_t = f(t)/f(0) with f(t) = cos²(((t/T + s)/(1 + s)) · π/2);
        β_t = 1 - ᾱ_t/ᾱ_{t-1}, clipped to ``max_beta`` to avoid singularities
        at the end of the chain. Tables are rebuilt from the clipped betas so
        ``betas``/``alphas``/``alphas_cumprod`` stay mutually consistent —
        every consumer (q_sample, DDPM/DDIM samplers, trainers) reads only
        these three tables, so the schedule drops in everywhere.
        """
        steps = jnp.arange(num_timesteps + 1, dtype=jnp.float32)
        f = jnp.cos(((steps / num_timesteps + s) / (1.0 + s)) * jnp.pi / 2) ** 2
        abar = f / f[0]
        betas = jnp.clip(1.0 - abar[1:] / abar[:-1], 0.0, max_beta).astype(dtype)
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas)
        return cls(
            betas=betas,
            alphas=alphas,
            alphas_cumprod=alphas_cumprod,
            num_timesteps=num_timesteps,
        )

    @classmethod
    def make(cls, name: str, num_timesteps: int = 1000, **kw) -> "DiffusionSchedule":
        """Build a schedule by name: 'linear' (reference-faithful) | 'cosine'."""
        if name == "linear":
            return cls.linear(num_timesteps, **kw)
        if name == "cosine":
            return cls.cosine(num_timesteps, **kw)
        raise ValueError(f"unknown schedule {name!r}; use 'linear' or 'cosine'")

    # Derived tables used by q_sample and the reverse update. Computed lazily
    # (they are cheap elementwise ops XLA folds into the consumer program).
    @property
    def sqrt_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alphas_cumprod)

    @property
    def reciprocal_sqrt_alphas(self) -> jnp.ndarray:
        return jax.lax.rsqrt(self.alphas)

    @property
    def sqrt_betas(self) -> jnp.ndarray:
        return jnp.sqrt(self.betas)
