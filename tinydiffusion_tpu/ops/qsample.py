"""Fused q(x_t | x_0) Pallas kernel: on-chip noise generation + noising.

The closed-form noising step (diffusion.py:177-190) needs a fresh N(0, I)
tensor the size of the batch every step. The default path draws it with
``jax.random.normal`` (XLA fuses the scale-adds into the consumer but the
noise tensor itself round-trips through HBM twice: once written by the RNG
kernel, once read back by the fused noising op). This kernel generates the
noise INSIDE the kernel with the TPU PRNG (``pltpu.prng_random_bits`` +
Box-Muller) and emits both ``x_t`` and ``noise`` in a single pass over the
batch — the "q_sample fused into the input pipeline" item of the north star.

Semantics: noise ~ N(0, I) exactly, but from the TPU hardware PRNG stream,
NOT bit-identical to ``jax.random.normal`` — so this is an opt-in for
training (any Gaussian works for the DDPM objective); parity tests and
replay paths keep the jax.random path.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from tinydiffusion_tpu.core.schedule import DiffusionSchedule

_TWO_PI = 2.0 * np.pi


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> uniform (0, 1]: use the top 24 bits, never exactly 0.

    Mosaic has no uint32->f32 cast; after >>8 the value fits in int32's
    positive range, so route through int32."""
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    return u + 1.0 / 33554432.0  # offset keeps log() finite


def _qsample_kernel(seed_ref, t_ref, x0_ref, sac_ref, s1m_ref, xt_ref, noise_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)  # independent stream per batch row

    x0 = x0_ref[0]  # (rows, cols) flattened sample
    shape = x0.shape
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    # Box-Muller
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)

    t = t_ref[i]  # full t vector lives in SMEM; index by program id
    # schedule tables live in SMEM: dynamic scalar gathers from VMEM would
    # need 128-aligned indices, SMEM indexes freely
    sac = sac_ref[t]  # sqrt(alphas_cumprod[t])
    s1m = s1m_ref[t]  # sqrt(1 - alphas_cumprod[t])
    noise_ref[0] = z
    xt_ref[0] = sac * x0 + s1m * z


def q_sample_fused(
    schedule: DiffusionSchedule,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    seed: jnp.ndarray | int,
):
    """Fused (x_t, noise) with in-kernel RNG. x_0: (B, ...) float32.

    Off-TPU this falls back to the jax.random path (the TPU PRNG primitives
    have no CPU lowering, even in interpret mode) — same distribution,
    different stream.
    """
    if jax.default_backend() != "tpu":
        from tinydiffusion_tpu.core.process import q_sample

        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
        return q_sample(schedule, x_0.astype(jnp.float32), t, key)

    b = x_0.shape[0]
    feat = int(np.prod(x_0.shape[1:]))
    # Flatten each sample to (rows, 128-ish) for clean VPU tiling.
    cols = 128 if feat % 128 == 0 else feat
    rows = feat // cols
    x2 = x_0.reshape(b, rows, cols).astype(jnp.float32)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    t_arr = t.astype(jnp.int32)
    tables = (
        schedule.sqrt_alphas_cumprod.astype(jnp.float32),
        schedule.sqrt_one_minus_alphas_cumprod.astype(jnp.float32),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full t vector (B,)
            pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sqrt(abar) table (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sqrt(1-abar) table (T,)
        ],
        out_specs=[
            pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0)),
        ],
    )
    xt, noise = pl.pallas_call(
        _qsample_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((b, rows, cols), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(seed_arr, t_arr, x2, *tables)
    return xt.reshape(x_0.shape), noise.reshape(x_0.shape)
