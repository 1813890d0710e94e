"""Benchmark harness — run on the real TPU chip by the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: MNIST DDPM train samples/sec/chip at the reference recipe
(UNet28, batch 128, Adam, T=1000) — per BASELINE.json. Secondary numbers
(full 1000-step sampling images/sec) ride along as extra keys.

vs_baseline compares against the reference's PyTorch-CPU yardstick measured
with tools/measure_reference_baseline.py on this machine (the reference
publishes no numbers — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.obs.profiling import force

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.experiments.common import make_sampler
from tinydiffusion_tpu.models.unet28 import UNet28
from tinydiffusion_tpu.parallel.mesh import make_mesh, shard_batch
from tinydiffusion_tpu.train.trainer import create_train_state, make_train_step

# Measured on this machine via tools/measure_reference_baseline.py
# (reference diffusion.py NoiseModel, torch 2.13 CPU 1-core, batch 128):
# {"train_samples_per_sec": 10.445, "sample_1000step_images_per_sec": 0.04263}
REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC = 10.445
REFERENCE_CPU_SAMPLE_IMAGES_PER_SEC = 0.04263

BATCH = 128
TRAIN_STEPS = 30
N_SAMPLE_IMAGES = 16


def main():
    schedule = DiffusionSchedule.linear(1000)
    model = UNet28(dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)

    rng = jax.random.PRNGKey(0)
    example = (jnp.zeros((BATCH, 28, 28, 1), jnp.float32), jnp.zeros((BATCH,), jnp.int32))
    state = create_train_state(model, tx, example, rng)

    mesh = make_mesh(("data",)) if len(jax.devices()) > 1 else None
    train_step = make_train_step(model, tx, schedule, mesh=mesh)

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 28, 28, 1)), jnp.float32
    )
    if mesh is not None:
        x0 = shard_batch(mesh, x0)

    # Warmup (compile) then timed steps. The donated-state chain makes the
    # final loss depend on every step; force() fetches it to host — the only
    # real completion fence on this backend (see obs/profiling.force).
    for _ in range(5):
        state, loss = train_step(state, x0)
    force(loss)
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        state, loss = train_step(state, x0)
    force(loss)
    train_dt = time.perf_counter() - t0
    n_chips = len(jax.devices())
    train_sps_per_chip = TRAIN_STEPS * BATCH / train_dt / n_chips

    # Larger-batch training throughput (secondary; the MXU util headroom of
    # the reference recipe's batch 128).
    BIG = 512
    state_big = create_train_state(
        model, tx,
        (jnp.zeros((BIG, 28, 28, 1), jnp.float32), jnp.zeros((BIG,), jnp.int32)),
        jax.random.PRNGKey(3),
    )
    xbig = jnp.asarray(
        np.random.default_rng(1).standard_normal((BIG, 28, 28, 1)), jnp.float32
    )
    if mesh is not None:
        xbig = shard_batch(mesh, xbig)
    for _ in range(3):
        state_big, loss_big = train_step(state_big, xbig)
    force(loss_big)
    t0 = time.perf_counter()
    for _ in range(10):
        state_big, loss_big = train_step(state_big, xbig)
    force(loss_big)
    big_sps = 10 * BIG / (time.perf_counter() - t0) / n_chips

    # Full 1000-step on-device sampling chain (reference recipe: 16 images).
    sampler = make_sampler(
        model, schedule, (N_SAMPLE_IMAGES, 28, 28, 1), dtype=jnp.bfloat16
    )
    out = sampler(state.params, state.batch_stats, jax.random.PRNGKey(1))
    force(out)  # compile + real completion
    t0 = time.perf_counter()
    out = sampler(state.params, state.batch_stats, jax.random.PRNGKey(2))
    force(out)
    sample_dt = time.perf_counter() - t0
    images_per_sec = N_SAMPLE_IMAGES / sample_dt

    # Batched sampling throughput (serving-style, 128 images per chain).
    sampler128 = make_sampler(model, schedule, (128, 28, 28, 1), dtype=jnp.bfloat16)
    out = sampler128(state.params, state.batch_stats, jax.random.PRNGKey(4))
    force(out)
    t0 = time.perf_counter()
    out = sampler128(state.params, state.batch_stats, jax.random.PRNGKey(5))
    force(out)
    images_per_sec_b128 = 128 / (time.perf_counter() - t0)

    vs_baseline = (
        train_sps_per_chip / REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC
        if REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC
        else None
    )
    print(
        json.dumps(
            {
                "metric": "MNIST DDPM train samples/sec/chip (batch 128)",
                "value": round(train_sps_per_chip, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "train_samples_per_sec_b512": round(big_sps, 1),
                "sample_1000step_images_per_sec": round(images_per_sec, 3),
                "sample_1000step_images_per_sec_b128": round(images_per_sec_b128, 3),
                "sample_chain_seconds": round(sample_dt, 3),
                "train_step_ms": round(train_dt / TRAIN_STEPS * 1e3, 3),
                "n_chips": n_chips,
                "device": str(jax.devices()[0]),
                "baseline_cpu_train_sps": REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
