"""End-to-end smoke runs of every experiment at hermetic tiny configs on the
8-device CPU mesh: each exercises data -> jitted train step -> val/checkpoint
-> sampler -> PNG artifacts (SURVEY.md §4 integration tier)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_diffusion_smoke(tmp_path):
    from tinydiffusion_tpu.experiments.diffusion import DiffusionConfig, run

    cfg = DiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"), compute_dtype="float32",
        max_steps_per_epoch=3, log_every=1,
        checkpoint_path=str(tmp_path / "ckpt" / "final"),
    )
    result = run(cfg)
    assert np.isfinite(result["losses"]).all()
    assert os.path.exists(tmp_path / "out" / "generated_mnist_epoch_0.png")
    assert os.path.isdir(tmp_path / "ckpt" / "final")


@pytest.mark.slow
def test_diffusion_smoke_resident_data(tmp_path):
    """data_placement='device': HBM-pinned dataset, scanned index-group
    dispatches (single-device path; the multi-device mesh falls back to
    host streaming with a warning)."""
    from tinydiffusion_tpu.experiments.diffusion import DiffusionConfig, run

    cfg = DiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"), compute_dtype="float32",
        max_steps_per_epoch=4, log_every=2, use_mesh=False,
        checkpoint_path="", data_placement="device",
        sample_every_epoch=False, visualize_denoising=False,
    )
    result = run(cfg)
    assert np.isfinite(result["losses"]).all()
    # 4 capped steps at log_every=2 -> logs at batch 0 and 2 (even groups:
    # no tail program, one compile on the 1-core CPU host)
    assert len(result["losses"]) == 2


@pytest.mark.slow
def test_conditional_diffusion_smoke(tmp_path):
    from tinydiffusion_tpu.experiments.conditional_diffusion import (
        ConditionalDiffusionConfig,
        run,
    )

    cfg = ConditionalDiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"),
        model_save_path=str(tmp_path / "ckpt" / "best"),
        compute_dtype="float32", max_steps_per_epoch=3, log_every=1,
    )
    result = run(cfg)
    assert len(result["val_losses"]) == 1
    assert os.path.isdir(tmp_path / "ckpt" / "best")  # best-val Orbax dir
    assert os.path.exists(tmp_path / "out" / "generated_digit_7.png")


@pytest.mark.slow
def test_vae_then_latent_diffusion_roundtrip(tmp_path):
    """Two-stage artifact flow: vae checkpoint -> latent_diffusion consumes it
    (latent_diffusion.py:418-434 contract)."""
    from tinydiffusion_tpu.experiments.vae import VAEExperimentConfig, run as run_vae

    vae_cfg = VAEExperimentConfig(
        epochs=1, batch_size=32, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "vae_out"),
        checkpoint_dir=str(tmp_path / "ckpt"), max_steps_per_epoch=3,
    )
    run_vae(vae_cfg)
    assert os.path.isdir(tmp_path / "ckpt" / "vae_mnist_best")

    from tinydiffusion_tpu.experiments.latent_diffusion import (
        LatentDiffusionConfig,
        run as run_latent,
    )

    for backbone in ["mlp_unet", "dit"]:
        cfg = LatentDiffusionConfig(
            backbone=backbone, num_epochs=1, batch_size=16, num_timesteps=20,
            time_dim=32, n_samples=4, data_root=str(tmp_path / "data"),
            out_dir=str(tmp_path / f"latent_out_{backbone}"),
            vae_checkpoint=str(tmp_path / "ckpt" / "vae_mnist_best"),
            model_save_path=str(tmp_path / "ckpt" / f"latent_{backbone}"),
            compute_dtype="float32", max_steps_per_epoch=2,
            sample_every_epoch=False,
        )
        result = run_latent(cfg)
        assert np.isfinite(result["val_losses"]).all()
        assert os.path.exists(
            tmp_path / f"latent_out_{backbone}" / "generated_digit_7.png"
        )


@pytest.mark.slow
def test_vae_laion_smoke(tmp_path):
    from tinydiffusion_tpu.experiments.vae_laion import VAELaionConfig, run

    cfg = VAELaionConfig(
        epochs=1, batch_size=4, image_size=32, latent_dim=8, n_records=8,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        image_cache_dir=str(tmp_path / "cache"),
        failed_urls_cache=str(tmp_path / "failed.json"),
        max_steps_per_epoch=2, log_interval=1, use_flash_attention=False,
    )
    result = run(cfg)
    assert np.isfinite(result["test_losses"]).all()
    assert os.path.exists(tmp_path / "out" / "generated_samples.png")


@pytest.mark.slow
def test_conditional_diffusion_laion_smoke(tmp_path):
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        LaionDiffusionConfig,
        run,
    )

    cfg = LaionDiffusionConfig(
        num_epochs=1, batch_size=4, num_timesteps=10, image_size=64,
        latent_size=32, n_records=10,
        out_dir=str(tmp_path / "out"),
        image_cache_dir=str(tmp_path / "cache"),
        failed_urls_cache=str(tmp_path / "failed.json"),
        model_save_path=str(tmp_path / "ckpt" / "best"),
        compute_dtype="float32", max_steps_per_epoch=2,
        sample_every_batches=0, sample_every_epoch=True, latent_codec="patch",
        text_encoder="hash",
    )
    result = run(cfg)
    assert np.isfinite(result["val_losses"]).all()
    assert os.path.exists(tmp_path / "out" / "samples_epoch_0.png")


@pytest.mark.slow
def test_conditional_diffusion_laion_multistep_smoke(tmp_path):
    """steps_per_dispatch > 1: K-grouped scanned dispatches + the tail
    batches that never fill a group both train, and losses stay finite."""
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        LaionDiffusionConfig,
        run,
    )

    cfg = LaionDiffusionConfig(
        num_epochs=1, batch_size=2, num_timesteps=10, image_size=64,
        latent_size=32, n_records=14,
        out_dir=str(tmp_path / "out"),
        image_cache_dir=str(tmp_path / "cache"),
        failed_urls_cache=str(tmp_path / "failed.json"),
        model_save_path=str(tmp_path / "ckpt" / "best"),
        compute_dtype="float32", max_steps_per_epoch=5,
        sample_every_batches=0, sample_every_epoch=False, latent_codec="patch",
        text_encoder="hash", steps_per_dispatch=2,
    )
    result = run(cfg)
    assert np.isfinite(result["val_losses"]).all()


@pytest.mark.slow
def test_vae_laion_resident_val_matches_host(tmp_path):
    """The pinned one-dispatch val pass reports the same per-epoch test
    losses as the host-streamed loop (same key cadence
    fold_in(seed+5, epoch*1000+i), same batch composition)."""
    from tinydiffusion_tpu.experiments.vae_laion import VAELaionConfig, run

    def go(placement, tag):
        cfg = VAELaionConfig(
            epochs=2, batch_size=4, image_size=32, latent_dim=8, n_records=48,
            out_dir=str(tmp_path / tag),
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            # Per-run cache: a shared dir makes run 2 decode run 1's LOSSY
            # JPEG cache writes while run 1 trained on pre-encode pixels.
            image_cache_dir=str(tmp_path / f"cache_{tag}"),
            failed_urls_cache=str(tmp_path / f"failed_{tag}.json"),
            max_steps_per_epoch=3, log_interval=1, use_flash_attention=False,
            data_placement=placement, use_mesh=False,
        )
        return run(cfg)

    res = go("device", "resident")
    host = go("host", "host")
    assert np.isfinite(res["test_losses"]).all()
    np.testing.assert_allclose(
        res["test_losses"], host["test_losses"], rtol=1e-5
    )
