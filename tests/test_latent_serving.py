"""Latent-family serving: load_latent_checkpoint / make_latent_pixel_sampler
and the generate.py CLI dispatch on the sidecar's 'backbone' key.

The reference can only sample latent models from inside their training
loops (latent_diffusion.py:308-347, diffusion_transformer.py); here any
saved latent checkpoint serves standalone through the same CLI as the
pixel models, with all three samplers.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def latent_ckpts(tmp_path_factory):
    """Tiny two-stage training run: VAE checkpoint -> latent (mlp_unet)
    checkpoint consuming it. Shared across the module's tests."""
    tmp_path = tmp_path_factory.mktemp("latent_serving")
    from tinydiffusion_tpu.experiments.latent_diffusion import (
        LatentDiffusionConfig,
        run as run_latent,
    )
    from tinydiffusion_tpu.experiments.vae import (
        VAEExperimentConfig,
        run as run_vae,
    )

    vae_cfg = VAEExperimentConfig(
        epochs=1, batch_size=32, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "vae_out"),
        checkpoint_dir=str(tmp_path / "ckpt"), max_steps_per_epoch=3,
    )
    run_vae(vae_cfg)

    cfg = LatentDiffusionConfig(
        backbone="mlp_unet", num_epochs=1, batch_size=16, num_timesteps=20,
        time_dim=32, n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "latent_out"),
        vae_checkpoint=str(tmp_path / "ckpt" / "vae_mnist_best"),
        model_save_path=str(tmp_path / "ckpt" / "latent_best"),
        compute_dtype="float32", max_steps_per_epoch=2,
        sample_every_epoch=False, visualize_denoising=False,
    )
    run_latent(cfg)
    return {
        "latent": str(tmp_path / "ckpt" / "latent_best"),
        "vae": str(tmp_path / "ckpt" / "vae_mnist_best"),
        "tmp": tmp_path,
    }


@pytest.mark.heavy
def test_load_latent_checkpoint_roundtrip(latent_ckpts):
    from tinydiffusion_tpu.experiments.common import load_latent_checkpoint

    loaded = load_latent_checkpoint(latent_ckpts["latent"])
    assert loaded["cfg"]["backbone"] == "mlp_unet"
    assert loaded["latent_dim"] == 20  # VAE default
    assert loaded["schedule"].num_timesteps == 20
    assert loaded["num_classes"] == 10
    # params restored, not template zeros: a forward produces finite output
    z = jnp.zeros((2, loaded["latent_dim"]))
    out = loaded["model"].apply(
        {"params": loaded["params"],
         "batch_stats": loaded["state"].batch_stats},
        z, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        train=False,
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.heavy
def test_load_latent_checkpoint_validation(latent_ckpts, tmp_path):
    from tinydiffusion_tpu.experiments.common import load_latent_checkpoint

    # missing VAE must raise, not silently serve a random decoder
    with pytest.raises(FileNotFoundError, match="VAE checkpoint"):
        load_latent_checkpoint(
            latent_ckpts["latent"],
            vae_checkpoint=str(tmp_path / "nonexistent"),
        )


@pytest.mark.heavy
@pytest.mark.parametrize("method,steps", [("ddpm", 0), ("ddim", 5),
                                          ("dpmpp", 5)])
def test_latent_pixel_sampler_all_methods(latent_ckpts, method, steps):
    from tinydiffusion_tpu.experiments.common import (
        load_latent_checkpoint,
        make_latent_pixel_sampler,
    )

    loaded = load_latent_checkpoint(latent_ckpts["latent"])
    fn = make_latent_pixel_sampler(loaded, 4, method=method,
                                   sample_steps=steps)
    x = fn(jax.random.PRNGKey(0), jnp.array([0, 1, 2, 3], jnp.int32))
    x = np.asarray(x)
    assert x.shape == (4, 28, 28, 1)
    assert np.isfinite(x).all()
    # decode tail maps the sigmoid output into the uniform [-1, 1] range
    assert x.min() >= -1.0 - 1e-5 and x.max() <= 1.0 + 1e-5


@pytest.mark.heavy
def test_generate_cli_latent_dispatch(latent_ckpts):
    """generate.py routes latent checkpoints by sidecar and serves dpmpp."""
    import generate

    out = str(latent_ckpts["tmp"] / "latent_dpmpp.png")
    generate.main([
        "--checkpoint", latent_ckpts["latent"],
        "--n", "4", "--out", out, "--digit", "3",
        "--sampler", "dpmpp", "--sample-steps", "5",
    ])
    assert os.path.exists(out)

    # pixel-only modes are rejected with a clean CLI error
    with pytest.raises(SystemExit):
        generate.main([
            "--checkpoint", latent_ckpts["latent"],
            "--n", "4", "--out", out, "--guidance-scale", "2.0",
        ])
