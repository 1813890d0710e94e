"""Conv beta-VAE on LAION-style images — parity with reference vae_laion.py.

Reference recipe (vae_laion.py:335-494): batch 4, Adam 1e-4, seed 42;
skip all-zero batches (failed downloads, 346-350); per-epoch ``test()``
pass with reconstruction panels and best-loss rich checkpoint (444-459);
final 16-sample decode of z ~ N(0, I) (465-477).

Deviations (deliberate, documented):
- the reference's ``test()`` iterates ``train_loader`` (vae_laion.py:400-405),
  i.e. "test" loss is train-set loss — a quirk SURVEY.md flags as
  not-to-copy. We evaluate on a held-out 10% split.
- perceptual loss uses the offline PerceptualNet substitute by default (no
  VGG16 weights reachable) — same structure/scale, frozen, seeded.

TPU-native: the whole step (encode w/ flash attention + spectral-norm power
iteration + decode + BCE/perceptual/KLD loss + Adam) is one jitted program;
spectral-norm u vectors and BN stats ride in ``batch_stats`` and are donated.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.data.laion import (
    LAIONImageTextDataset,
    load_laion_dataset,
    precache_dataset,
)
from tinydiffusion_tpu.data.loader import BatchIterator, prefetch_to_device
from tinydiffusion_tpu.io.checkpoint import BestKeeper
from tinydiffusion_tpu.models.vae_conv import (
    ConvVAE,
    ConvVAEConfig,
    PerceptualNet,
    conv_vae_loss,
)
from tinydiffusion_tpu.obs.images import save_image_grid
from tinydiffusion_tpu.obs.metrics import LossAccumulator, MetricsLogger
from tinydiffusion_tpu.parallel.mesh import batch_sharding, make_mesh_for_batch


@flax.struct.dataclass
class ConvVAETrainState:
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: dict
    rng: jax.Array


@dataclasses.dataclass
class VAELaionConfig(ConvVAEConfig):
    seed: int = 42  # vae_laion.py:46
    n_records: int = 10_000
    out_dir: str = "runs/vae_laion"
    use_mesh: bool = True
    use_flash_attention: bool = True
    max_steps_per_epoch: int = 0
    offline: bool = True
    # Documented deviation: the reference trains unclipped and NaNs out at
    # the full 256x256 recipe (it only prints the NaN components,
    # vae_laion.py:220-227). Global-norm clipping keeps the recipe trainable;
    # 0 disables for strict parity.
    clip_norm: float = 10.0
    # 'host' streams batches through the prefetch pipeline; 'device' pins
    # the uint8 image set in HBM (1.9 GB at the full 256^2 10k recipe) and
    # scans log_interval-sized index groups per dispatch. All-zero images
    # (failed downloads) are excluded once at pin time instead of the host
    # path's per-batch skip. 'auto' (default) promotes to 'device' when the
    # set fits in HBM. DP-capable.
    data_placement: str = "auto"
    # 'seeded' uses the deterministic frozen substitute net; 'vgg16' loads a
    # REAL pretrained VGG16 features[:16] from --perceptual-weights (a
    # torch-saved state dict, compat/vgg.py) — the reference's exact frozen
    # feature extractor (vae_laion.py:170-176), usable whenever a weight
    # file is handed to this offline environment.
    perceptual: str = "seeded"
    perceptual_weights: str = ""
    # Compute dtype for the conv-VAE + perceptual net. 'bfloat16' works and
    # is CPU/interpret-validated (tests/test_vae_conv.py), but is NOT the
    # default: on this environment's TPU toolchain, bf16 compilations of
    # this model NaN in a fusion-dependent way (measured r5: the SAME
    # state/batch/key is finite eagerly and under jit-of-grad, NaN under
    # jit-of-forward; a second compile moved the NaN from the perceptual
    # branch into the decoder; bf16 max_pool/conv probes in isolation are
    # clean — i.e. an XLA:TPU miscompilation we can only avoid, not fix;
    # evidence: docs/evidence/bf16_convvae/ — scripts + captured logs).
    # fp32 conv-VAE training is proven at the full published recipe
    # (225k steps, r3 — BASELINE.md).
    compute_dtype: str = "float32"
    # Resume from checkpoints/vae_laion_best if it exists: restores the FULL
    # Orbax state (params + BN/SN stats + optimizer + RNG + step) and
    # continues from the saved epoch — the trainer-level exact resume the
    # reference lacks (it only has weight-resume in the LAION diffusion
    # script, conditional_diffusion_laion.py:376-383).
    resume: bool = False


def _conv_vae_raw_step(model: ConvVAE, perceptual: PerceptualNet, perc_params,
                       tx, beta: float):
    """Unjitted per-batch conv-VAE step, shared by the per-batch and
    HBM-resident programs."""

    def step_fn(state: ConvVAETrainState, x: jnp.ndarray):
        rng, z_key = jax.random.split(state.rng)

        def loss_fn(params):
            (recon, mu, logvar), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, z_key, train=True, mutable=["batch_stats"],
            )
            recon_img = recon.reshape(x.shape)
            rf = perceptual.apply({"params": perc_params}, recon_img)
            tf = perceptual.apply({"params": perc_params}, x)
            total, components = conv_vae_loss(recon_img, x, mu, logvar, rf, tf, beta)
            return total, (mutated["batch_stats"], components)

        (loss, (new_stats, components)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt, rng=rng,
        )
        return new_state, loss, components

    return step_fn


def make_conv_vae_train_step(model: ConvVAE, perceptual: PerceptualNet, perc_params,
                             tx, beta: float, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn = _conv_vae_raw_step(model, perceptual, perc_params, tx, beta)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn, donate_argnums=0, in_shardings=(repl, data),
        out_shardings=(repl, repl, repl),
    )


def make_conv_vae_resident_step(model: ConvVAE, perceptual: PerceptualNet,
                                perc_params, tx, beta: float, dataset,
                                mesh=None):
    """HBM-resident conv-VAE training: ``step(state, idxs) -> (state,
    losses, components)`` scanning (K, B) int32 index batches over the
    pinned uint8 image set (arrays as explicit jit args — data/device.py).
    ``components`` carries the per-batch loss terms stacked (K,). Under a
    ``mesh`` index batches shard over ``data`` (train.trainer.resident_jit)."""
    single = _conv_vae_raw_step(model, perceptual, perc_params, tx, beta)

    def step_fn(arrays, state: ConvVAETrainState, idxs):
        def body(s, idx):
            (x,) = dataset.gather_arrays(arrays, idx)
            s2, loss, components = single(s, x)
            return s2, (loss, components)

        new_state, (losses, components) = jax.lax.scan(body, state, idxs)
        return new_state, losses, components

    from tinydiffusion_tpu.train.trainer import resident_jit

    return resident_jit(step_fn, dataset, mesh, n_extra_out=2)


def make_conv_vae_eval_step(model: ConvVAE, perceptual: PerceptualNet, perc_params,
                            beta: float, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step_fn(params, batch_stats, x, key):
        recon, mu, logvar = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, key, train=False
        )
        recon_img = recon.reshape(x.shape)
        rf = perceptual.apply({"params": perc_params}, recon_img)
        tf = perceptual.apply({"params": perc_params}, x)
        total, _ = conv_vae_loss(recon_img, x, mu, logvar, rf, tf, beta)
        return total, recon_img

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step_fn, in_shardings=(repl, repl, data, repl),
                   out_shardings=(repl, data))


def load_images(config: VAELaionConfig) -> np.ndarray:
    """Materialize the (cached) dataset as one uint8 array; batches are
    normalized to [0,1] at assembly time by the native fused loader
    (vae_laion transform semantics: Resize + ToTensor, vae_laion.py:316-321,
    at a quarter of the fp32 host-memory footprint)."""
    records = load_laion_dataset(config.n_records, offline=config.offline)
    ds = LAIONImageTextDataset(
        records,
        cache_dir=config.image_cache_dir,
        failed_urls_cache=config.failed_urls_cache,
        image_size=config.image_size,
        normalize=False,
        on_error="zero",
        as_uint8=True,
    )
    images = np.stack([ds[i][0] for i in range(len(ds))])
    return images


def run(config: VAELaionConfig) -> dict:
    rng = jax.random.PRNGKey(config.seed)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    model = ConvVAE(
        latent_dim=config.latent_dim,
        input_channels=config.input_channels,
        image_size=config.image_size,
        use_flash_attention=config.use_flash_attention,
        dtype=dtype,
    )
    perceptual = PerceptualNet(dtype=dtype)
    if config.perceptual == "vgg16":
        # The reference's frozen pretrained VGG16 features[:16]
        # (vae_laion.py:170-176), converted from a torch state-dict file.
        from tinydiffusion_tpu.compat.vgg import load_vgg16_perceptual

        if not config.perceptual_weights:
            raise ValueError(
                "perceptual='vgg16' needs --perceptual-weights "
                "(a torch-saved vgg16 state dict; see compat/vgg.py)"
            )
        perc_params = jax.tree.map(
            jnp.asarray, load_vgg16_perceptual(config.perceptual_weights)
        )
        print(f"loaded VGG16 perceptual weights from {config.perceptual_weights}")
    elif config.perceptual == "seeded":
        # Deterministic frozen perceptual weights (offline VGG16 substitute).
        perc_params = perceptual.init(
            jax.random.PRNGKey(123),
            jnp.zeros((1, config.image_size, config.image_size, 3)),
        )["params"]
    else:
        raise ValueError(
            f"perceptual={config.perceptual!r}; choose 'seeded' or 'vgg16'"
        )

    tx = optax.adam(config.learning_rate)
    if config.clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_norm), tx)

    images = load_images(config)
    n_val = max(len(images) // 10, 1)
    val_images, train_images = images[:n_val], images[n_val:]
    u8 = (1.0 / 255.0, 0.0)  # ToTensor: [0, 1]
    train_it = BatchIterator([train_images], config.batch_size, shuffle=True,
                             seed=config.seed, u8_normalize=u8,
                             device_normalize=True)
    val_it = BatchIterator([val_images], config.batch_size, shuffle=False,
                           u8_normalize=u8, device_normalize=True)

    rng, init_rng, state_rng, z0 = jax.random.split(rng, 4)
    variables = model.init(
        init_rng,
        jnp.zeros((2, config.image_size, config.image_size, 3)),
        jax.random.PRNGKey(0),
        train=False,
    )
    state = ConvVAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=state_rng,
    )

    mesh = make_mesh_for_batch(config.batch_size) if config.use_mesh else None
    from tinydiffusion_tpu.experiments.common import resolve_data_placement

    resident = resolve_data_placement(
        config.data_placement, train_images.nbytes, config.batch_size,
        mesh, "vae_laion",
    )
    resident_eval = None
    if resident:
        from tinydiffusion_tpu.data.device import DeviceDataset
        from tinydiffusion_tpu.parallel.mesh import replicated_sharding

        # The host path skips all-zero BATCHES per step (failed downloads,
        # vae_laion.py:346-350); resident mode excludes all-zero IMAGES once
        # at pin time instead.
        nonzero = train_images.reshape(len(train_images), -1).any(axis=1)
        if not nonzero.all():
            print(f"Excluding {int((~nonzero).sum())} all-zero images from "
                  "the device-resident set.")
        device_data = DeviceDataset(
            [train_images[nonzero]], config.batch_size, shuffle=True,
            seed=config.seed, u8_normalize=u8,
            sharding=replicated_sharding(mesh) if mesh is not None else None,
        )
        resident_step = make_conv_vae_resident_step(
            model, perceptual, perc_params, tx, config.beta, device_data,
            mesh=mesh,
        )
        # Pin the val split too (the r2-weak-#8 treatment, extended to the
        # LAION VAE): the epoch-end val pass becomes ONE dispatch instead
        # of a host-streamed batch loop. Gated on the val split containing
        # no all-zero images so the host path's all-zero-batch skip
        # (vae_laion.py:346-350) is provably a no-op and the scanned pass
        # replays the host key cadence fold_in(seed+5, epoch*1000+i)
        # exactly.
        if val_images.reshape(len(val_images), -1).any(axis=1).all():
            from tinydiffusion_tpu.train.trainer import make_resident_eval

            device_val = DeviceDataset(
                [val_images], config.batch_size, shuffle=False,
                seed=config.seed, u8_normalize=u8,
                sharding=replicated_sharding(mesh) if mesh is not None else None,
            )

            def _val_body(ctx, batch, key):
                params, batch_stats = ctx
                (x,) = batch
                recon, mu, logvar = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, key, train=False,
                )
                recon_img = recon.reshape(x.shape)
                rf = perceptual.apply({"params": perc_params}, recon_img)
                tf = perceptual.apply({"params": perc_params}, x)
                total, _ = conv_vae_loss(
                    recon_img, x, mu, logvar, rf, tf, config.beta
                )
                return total

            resident_eval = make_resident_eval(
                _val_body, device_val, jax.random.PRNGKey(config.seed + 5),
                mesh=mesh, fold_stride=1000,
            )
        else:
            print("val split contains all-zero images; keeping the "
                  "host-streamed val pass (all-zero-batch-skip parity).")
    train_step = make_conv_vae_train_step(model, perceptual, perc_params, tx, config.beta, mesh)
    eval_step = make_conv_vae_eval_step(model, perceptual, perc_params, config.beta, mesh)

    logger = MetricsLogger("vae_laion", config.out_dir, dataclasses.asdict(config))
    keeper = BestKeeper(f"{config.checkpoint_dir}/vae_laion_best")
    result = {"test_losses": []}

    start_epoch = 1
    if config.resume:
        from tinydiffusion_tpu.io.checkpoint import (
            checkpoint_exists,
            load_sidecar,
            restore_checkpoint,
        )

        ckpt_path = f"{config.checkpoint_dir}/vae_laion_best"
        if checkpoint_exists(ckpt_path):
            state = restore_checkpoint(ckpt_path, state)
            meta = load_sidecar(ckpt_path).get("metadata", {})
            keeper.best = float(meta.get("metric", float("inf")))
            start_epoch = int(meta.get("epoch", 0)) + 1
            print(f"Resumed from {ckpt_path}: epoch {start_epoch - 1} "
                  f"(best loss {keeper.best:.4f}), continuing at epoch "
                  f"{start_epoch}")
        else:
            print(f"--resume set but {ckpt_path} not found; starting fresh")

    def nonzero_batches(epoch_iter):
        """Host-side all-zero-batch skip (failed downloads,
        vae_laion.py:346-350) — checked on the uint8 bytes BEFORE the
        prefetch worker ships the batch to the device."""
        for batch_idx, (x,) in enumerate(epoch_iter):
            if np.all(x == 0):
                print(f"Batch {batch_idx} contains all-zero images, skipping.")
                continue
            yield (x,)

    batch_sh = batch_sharding(mesh) if mesh is not None else None
    for epoch in range(start_epoch, config.epochs + 1):
        train_acc, n_seen = LossAccumulator(), 0
        comp_acc: dict = {}
        if resident:
            idxs = device_data.epoch_index_batches(epoch)
            if config.max_steps_per_epoch:
                idxs = idxs[: config.max_steps_per_epoch]
            g = config.log_interval

            def _drain(pending):
                nonlocal n_seen
                start, k_steps, losses, components = pending
                # ONE host fetch per group: per-element losses[j]/v[j]
                # slicing spawned ~60 tiny device programs per 10-step
                # group (6 vectors x K elements) plus 6 fetch round-trips.
                host_losses, host_comp = jax.device_get((losses, components))
                train_acc.add_many(np.asarray(host_losses))
                for k, v in host_comp.items():
                    comp_acc.setdefault(k, LossAccumulator()).add_many(np.asarray(v))
                n_seen += k_steps * config.batch_size
                comp = {k: float(v[0]) for k, v in host_comp.items()}
                logger.log(
                    {"epoch": epoch, "batch": start,
                     "batch_train_loss": float(host_losses[0]) / config.batch_size,
                     **comp}
                )

            # One-deep fetch pipeline: dispatch group i+1 BEFORE fetching
            # group i's losses, so the host<->device round trip (the
            # dominant per-group cost on this tunneled backend) overlaps
            # with device execution instead of serializing after it.
            pending = None
            for start in range(0, len(idxs), g):
                chunk = jnp.asarray(idxs[start : start + g])
                state, losses, components = resident_step(state, chunk)
                if pending is not None:
                    _drain(pending)
                pending = (start, chunk.shape[0], losses, components)
            if pending is not None:
                _drain(pending)
        else:
            batches = prefetch_to_device(
                nonzero_batches(train_it.epoch(epoch)), sharding=batch_sh,
                transform=train_it.device_transform,
            )
            for batch_idx, (x,) in enumerate(batches):
                if config.max_steps_per_epoch and batch_idx >= config.max_steps_per_epoch:
                    break
                batch_len = len(x)
                state, loss, components = train_step(state, x)
                train_acc.add(loss)
                # Buffer every batch's components on-device (no sync — the
                # 256x256 recipe's blow-ups land BETWEEN log points, so
                # log-cadence snapshots alone miss them).
                for k, v in components.items():
                    comp_acc.setdefault(k, LossAccumulator()).add(v)
                n_seen += batch_len
                if batch_idx % config.log_interval == 0:
                    comp = {k: float(v) for k, v in components.items()}
                    if not all(np.isfinite(v) for v in comp.values()):
                        # structured replacement for the reference's NaN print
                        # (vae_laion.py:220-227)
                        print(f"Loss components: {comp}")
                    logger.log(
                        {"epoch": epoch, "batch": batch_idx,
                         "batch_train_loss": train_acc.last() / max(batch_len, 1), **comp}
                    )
        # One epoch-end fetch of all losses (completion fence included —
        # donated chained state), instead of a host sync per step.
        avg_train = train_acc.sum() / max(n_seen, 1)
        comp_max = {
            f"{k}_epoch_max": float(np.max(acc.values()))
            for k, acc in comp_acc.items()
        }

        test_acc, n_test = LossAccumulator(), 0
        test_sizes: list = []
        if resident_eval is not None:
            vidxs = device_val.epoch_index_batches(0)
            if config.max_steps_per_epoch:
                vidxs = vidxs[: config.max_steps_per_epoch]
            if len(vidxs):
                vals_host = np.asarray(
                    resident_eval(
                        (state.params, state.batch_stats), epoch, vidxs
                    ),
                    np.float64,
                )
                test_acc.add_many(vals_host)
                test_sizes = [config.batch_size] * len(vals_host)
                n_test = config.batch_size * len(vals_host)
            # Reconstruction panel from the first val batch (one streamed
            # batch — the scanned pass returns losses only).
            first = next(iter(prefetch_to_device(
                val_it.epoch(), sharding=batch_sh,
                transform=val_it.device_transform,
            )), None)
            if first is not None:
                (x,) = first
                key = jax.random.fold_in(
                    jax.random.PRNGKey(config.seed + 5), epoch * 1000
                )
                _, recon = eval_step(state.params, state.batch_stats, x, key)
                n_img = min(config.n_images_to_log, len(x))
                panel = np.concatenate(
                    [np.asarray(x[:n_img]), np.asarray(recon[:n_img])], axis=0
                )
                panel_path = (
                    f"{config.out_dir}/original_vs_reconstructed_epoch_{epoch}.png"
                )
                save_image_grid(panel, panel_path, nrow=n_img, normalize=False)
                logger.log_image("original_vs_reconstructed", panel_path)
        else:
            val_batches = prefetch_to_device(
                nonzero_batches(val_it.epoch()), sharding=batch_sh,
                transform=val_it.device_transform,
            )
            for i, (x,) in enumerate(val_batches):
                if config.max_steps_per_epoch and i >= config.max_steps_per_epoch:
                    break
                key = jax.random.fold_in(jax.random.PRNGKey(config.seed + 5), epoch * 1000 + i)
                loss, recon = eval_step(state.params, state.batch_stats, x, key)
                test_acc.add(loss)
                test_sizes.append(len(x))
                n_test += len(x)
                if i == 0:
                    n_img = min(config.n_images_to_log, len(x))
                    panel = np.concatenate(
                        [np.asarray(x[:n_img]), np.asarray(recon[:n_img])], axis=0
                    )
                    panel_path = (
                        f"{config.out_dir}/original_vs_reconstructed_epoch_{epoch}.png"
                    )
                    save_image_grid(panel, panel_path, nrow=n_img, normalize=False)
                    logger.log_image("original_vs_reconstructed", panel_path)
        eval_bad = 0
        if n_test == 0:
            # Tiny configs can leave the 10% val split with zero full
            # batches; fall back to train loss for the best-model policy
            # rather than recording a spurious 0.
            avg_test = avg_train
        else:
            # Average over FINITE eval batches only: the eval path (running
            # BN stats + a sampled z) overflows on epochs that end near a
            # transient latent blow-up, and one Inf batch would otherwise
            # report test_loss=Inf for the epoch and blind best-model
            # selection. The skip is logged, never silent.
            vals = test_acc.values()
            sizes = np.asarray(test_sizes, np.float64)
            finite = np.isfinite(vals)
            eval_bad = int((~finite).sum())
            if eval_bad:
                print(f"Epoch {epoch}: {eval_bad}/{len(vals)} eval batches "
                      "non-finite, excluded from test loss")
            avg_test = (
                float(vals[finite].sum() / sizes[finite].sum())
                if finite.any() else float("inf")
            )
        result["test_losses"].append(avg_test)
        logger.log({"epoch": epoch, "train_loss": avg_train,
                    "test_loss": avg_test,
                    "eval_nonfinite_batches": eval_bad, **comp_max})
        if keeper.update(avg_test, state, config=dataclasses.asdict(config), epoch=epoch):
            print(f"Saved best model (epoch {epoch}, loss {avg_test:.4f})")

    # Final samples (vae_laion.py:465-477).
    rng, z_rng = jax.random.split(rng)
    z = jax.random.normal(z_rng, (16, config.latent_dim))
    samples = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        z, train=False, method=ConvVAE.decode,
    )
    save_image_grid(
        np.asarray(samples), f"{config.out_dir}/generated_samples.png",
        nrow=4, normalize=False,
    )
    logger.log_image("generated_samples", f"{config.out_dir}/generated_samples.png")
    result["state"] = state
    logger.finish()
    return result


def main(argv=None):
    import argparse

    from tinydiffusion_tpu.experiments.common import add_config_flags, config_from_args

    parser = argparse.ArgumentParser(description=__doc__)
    add_config_flags(parser, VAELaionConfig())
    args = parser.parse_args(argv)
    from tinydiffusion_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    print(f"devices: {jax.devices()}")
    run(config_from_args(VAELaionConfig, args))


if __name__ == "__main__":
    main()
