"""Unconditional MNIST DDPM — capability parity with reference diffusion.py.

Reference recipe (diffusion.py:194-250, 352-360): MNIST in [-1,1], batch 128
shuffled, Adam lr 1e-3, T=1000 linear betas, 100 epochs; per epoch generate
16 samples with the 1000-step ancestral sampler and save a PNG grid
(nrow=4, normalized).

TPU-native execution model (none of this exists in the reference):
- one jitted SPMD train step (t-sampling + q_sample + UNet fwd/bwd + Adam +
  BN stats) with donated state, batch sharded over the ``data`` mesh axis;
- the per-epoch sampler is a single compiled ``lax.scan`` over all 1000
  steps — zero host round-trips;
- bfloat16 compute / fp32 params by default.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.data.loader import BatchIterator, prefetch_to_device
from tinydiffusion_tpu.data.mnist import MNIST_SCALE, MNIST_SHIFT, load_mnist_u8
from tinydiffusion_tpu.experiments.common import make_sampler, resolve_dtype
from tinydiffusion_tpu.models.unet28 import UNet28
from tinydiffusion_tpu.obs.images import save_image_grid
from tinydiffusion_tpu.obs.metrics import MetricsLogger, Throughput
from tinydiffusion_tpu.obs.profiling import force
from tinydiffusion_tpu.parallel.mesh import batch_sharding, make_mesh_for_batch
from tinydiffusion_tpu.train.trainer import create_train_state, make_train_step


@dataclasses.dataclass
class DiffusionConfig:
    num_epochs: int = 100
    batch_size: int = 128
    lr: float = 1e-3
    num_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    time_dim: int = 256
    n_samples: int = 16
    seed: int = 0
    data_root: str = "./data"
    out_dir: str = "runs/diffusion"
    compute_dtype: str = "bfloat16"
    use_mesh: bool = True
    log_every: int = 100
    sample_every_epoch: bool = True
    # Render the coarse strided denoising trajectory after training
    # (visualize_denoising_process parity, diffusion.py:321-348).
    visualize_denoising: bool = True
    denoising_stride: int = 100
    # The reference diffusion.py never checkpoints; we save the final state
    # (full resumable pytree) unless disabled.
    checkpoint_path: str = "checkpoints/diffusion_final"
    # Sampling dtype; fp32 by default — a 1000-step bf16 chain accumulates
    # rounding that visibly degrades sample quality late in training.
    sample_dtype: str = "float32"
    # Hermetic-mode knob for tests/CI: cap steps per epoch (None = full epoch).
    max_steps_per_epoch: int = 0  # 0 = unlimited
    # Fused Pallas q_sample: in-kernel TPU PRNG + noising in one pass
    # (+28% measured step throughput). Statistically identical N(0, I) but a
    # DIFFERENT noise stream than jax.random — leave off for parity/replay
    # runs; single-chip only (the kernel does not partition over a mesh).
    fused_qsample: bool = False
    # 'host' streams batches through the prefetch pipeline (reference-shaped
    # loop); 'device' pins the whole uint8 dataset in HBM and scans
    # log_every-sized index groups through the train step in one dispatch
    # each (data/device.py) — measured 16.5k vs 4.7k samples/s loop-level.
    # 'auto' (default) promotes to 'device' when the set fits in HBM. Works
    # under a DP mesh (replicated pin + sharded index gather); batch
    # composition replays the host stream exactly.
    data_placement: str = "auto"
    # Noise schedule: 'linear' (reference-faithful betas) or 'cosine'
    # (Nichol & Dhariwal 2021; no reference counterpart).
    noise_schedule: str = "linear"
    # Training target: 'eps' (reference-faithful noise prediction) or 'v'
    # (Salimans & Ho 2022 v-prediction; samplers convert back to eps).
    prediction: str = "eps"
    # EMA decay for a shadow copy of the params, updated inside the jitted
    # step and used for sampling/checkpointing when set (standard production
    # DDPM practice, e.g. 0.999; the reference has no EMA). 0 = off
    # (reference-faithful: sample from the live params).
    ema_decay: float = 0.0


def run(config: DiffusionConfig) -> dict:
    dtype = resolve_dtype(config.compute_dtype)
    rng = jax.random.PRNGKey(config.seed)

    # uint8 storage end to end: native gather keeps batches as bytes on
    # host, the prefetch worker ships them (4x fewer bytes over the link)
    # and normalizes to [-1,1] on device, overlapped with the train step.
    images_u8, _ = load_mnist_u8(config.data_root, train=True)
    data = BatchIterator(
        [images_u8], config.batch_size, shuffle=True, seed=config.seed,
        u8_normalize=(MNIST_SCALE, MNIST_SHIFT), device_normalize=True,
    )

    schedule = (
        DiffusionSchedule.linear(
            config.num_timesteps, config.beta_start, config.beta_end
        )
        if config.noise_schedule == "linear"
        else DiffusionSchedule.make(config.noise_schedule, config.num_timesteps)
    )
    model = UNet28(time_dim=config.time_dim, dtype=dtype)
    tx = optax.adam(config.lr)

    rng, init_rng = jax.random.split(rng)
    example = (
        jnp.zeros((config.batch_size, 28, 28, 1), jnp.float32),
        jnp.zeros((config.batch_size,), jnp.int32),
    )
    use_ema = config.ema_decay > 0
    ema_decay = config.ema_decay if use_ema else None
    state = create_train_state(model, tx, example, init_rng, ema=use_ema)

    mesh = make_mesh_for_batch(config.batch_size) if config.use_mesh else None
    from tinydiffusion_tpu.experiments.common import resolve_data_placement

    placement = config.data_placement
    if placement == "auto" and config.fused_qsample:
        # fused_qsample is an explicit opt-in to the Pallas noising kernel,
        # which only the host-streamed single-step path wires; honor it.
        placement = "host"
    resident = resolve_data_placement(
        placement, images_u8.nbytes, config.batch_size, mesh, "diffusion"
    )
    if resident and config.fused_qsample:
        import logging

        logging.getLogger("tinydiffusion.diffusion").warning(
            "fused_qsample is ignored with data_placement='device' (the "
            "resident scan uses the jax.random q_sample path)"
        )
    train_step = make_train_step(
        model, tx, schedule, mesh=mesh, fused_qsample=config.fused_qsample,
        ema_decay=ema_decay, prediction=config.prediction,
    )
    if resident:
        from tinydiffusion_tpu.data.device import DeviceDataset
        from tinydiffusion_tpu.parallel.mesh import replicated_sharding
        from tinydiffusion_tpu.train.trainer import make_resident_multi_step

        device_data = DeviceDataset(
            [images_u8], config.batch_size, shuffle=True, seed=config.seed,
            u8_normalize=(MNIST_SCALE, MNIST_SHIFT),
            sharding=replicated_sharding(mesh) if mesh is not None else None,
        )
        resident_step = make_resident_multi_step(
            model, tx, schedule, device_data, mesh=mesh, ema_decay=ema_decay,
            prediction=config.prediction,
        )
    sample_dtype = resolve_dtype(config.sample_dtype)
    sampler = make_sampler(
        model, schedule, (config.n_samples, 28, 28, 1), dtype=sample_dtype,
        prediction=config.prediction,
    )

    logger = MetricsLogger("diffusion", config.out_dir, dataclasses.asdict(config))
    throughput = Throughput()
    result = {"losses": [], "samples_per_sec": 0.0}

    batch_sh = batch_sharding(mesh) if mesh is not None else None
    step = 0
    loss = None
    for epoch in range(config.num_epochs):
        epoch_t0 = time.perf_counter()
        throughput.reset()
        if resident:
            # One dispatch per log_every batches: gather + normalize + train
            # scanned in-program over the HBM-pinned dataset; the (G,) loss
            # vector keeps the reference's per-100-batch logging exact
            # (losses[0] IS the loss at batch index `start`).
            idxs = device_data.epoch_index_batches(epoch)
            if config.max_steps_per_epoch:
                idxs = idxs[: config.max_steps_per_epoch]
            g = config.log_every
            for start in range(0, len(idxs), g):
                chunk = jnp.asarray(idxs[start : start + g])
                state, losses = resident_step(state, chunk)
                throughput.add(len(chunk) * config.batch_size)
                loss = losses[-1]
                loss_val = float(losses[0])
                logger.log(
                    {"epoch": epoch, "batch": start, "loss": loss_val}, step=step
                )
                result["losses"].append(loss_val)
                step += len(chunk)
        else:
            batches = prefetch_to_device(
                data.epoch(epoch), sharding=batch_sh, transform=data.device_transform
            )
            for batch_idx, (x0,) in enumerate(batches):
                if config.max_steps_per_epoch and batch_idx >= config.max_steps_per_epoch:
                    break
                state, loss = train_step(state, x0)
                throughput.add(config.batch_size)
                if batch_idx % config.log_every == 0:
                    # Matches the reference's per-100-batch print
                    # (diffusion.py:238-239).
                    loss_val = float(loss)
                    logger.log(
                        {"epoch": epoch, "batch": batch_idx, "loss": loss_val},
                        step=step,
                    )
                    result["losses"].append(loss_val)
                step += 1
        # Real completion fence: block_until_ready does not fence on this
        # backend (obs/profiling.force); fetching the chained loss does.
        if loss is not None:
            force(loss)
        sps = throughput.samples_per_sec
        result["samples_per_sec"] = sps

        if config.sample_every_epoch:
            rng, sample_rng = jax.random.split(rng)
            sample_params = state.ema_params if use_ema else state.params
            samples = sampler(sample_params, state.batch_stats, sample_rng)
            samples = np.asarray(jax.device_get((samples + 1) / 2), np.float32)
            save_image_grid(
                samples,
                f"{config.out_dir}/generated_mnist_epoch_{epoch}.png",
                nrow=4,
            )
            logger.log_image(
                "samples", f"{config.out_dir}/generated_mnist_epoch_{epoch}.png", step
            )
        logger.log(
            {
                "epoch": epoch,
                "train_samples_per_sec": sps,
                "epoch_seconds": time.perf_counter() - epoch_t0,
            },
            step=step,
        )

    if config.visualize_denoising:
        # Coarse T/stride-step trajectory, one grid per recorded timestep
        # (the reference renders each intermediate as its own figure,
        # diffusion.py:344-348).
        from tinydiffusion_tpu.experiments.common import make_trajectory_sampler

        traj_fn = make_trajectory_sampler(
            model, schedule, (4, 28, 28, 1), stride=config.denoising_stride,
            dtype=sample_dtype, prediction=config.prediction,
        )
        rng, t_rng = jax.random.split(rng)
        trajectory = np.asarray(
            jax.device_get(traj_fn(
                state.ema_params if use_ema else state.params,
                state.batch_stats, t_rng,
            )),
            np.float32,
        )
        for i, frame in enumerate((trajectory + 1) / 2):
            t_label = config.num_timesteps - i * config.denoising_stride
            save_image_grid(
                frame, f"{config.out_dir}/denoising_t{t_label}.png", nrow=2
            )

    if config.checkpoint_path:
        from tinydiffusion_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(
            config.checkpoint_path, state, config=dataclasses.asdict(config)
        )

    result["state"] = state
    logger.finish()
    return result


def main(argv=None):
    import argparse

    from tinydiffusion_tpu.experiments.common import add_config_flags, config_from_args

    parser = argparse.ArgumentParser(description=__doc__)
    add_config_flags(parser, DiffusionConfig())
    args = parser.parse_args(argv)
    config = config_from_args(DiffusionConfig, args)
    from tinydiffusion_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    print(f"devices: {jax.devices()}")
    run(config)


if __name__ == "__main__":
    main()
