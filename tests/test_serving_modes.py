"""img2img (partial-chain DDIM) and inpainting (known-region compositing).

Production serving modes with no reference counterpart (the reference can
only sample from pure noise inside its training scripts) — built on the
same compiled scan chains (core/sampler.py) and exposed via generate.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusion_tpu.core.process import q_sample_with_noise
from tinydiffusion_tpu.core.sampler import (
    ddim_sample,
    ddim_timesteps,
    ddpm_sample,
)
from tinydiffusion_tpu.core.schedule import DiffusionSchedule

B, D = 4, 12


def test_ddim_timesteps_t_start():
    taus = np.asarray(ddim_timesteps(100, 10, t_start=40))
    assert taus[0] == 40 and taus[-1] == 0
    assert (np.diff(taus) < 0).all()
    # defaults unchanged
    full = np.asarray(ddim_timesteps(100, 10))
    assert full[0] == 99
    with pytest.raises(ValueError, match="t_start"):
        ddim_timesteps(100, 10, t_start=100)
    with pytest.raises(ValueError, match="t_start"):
        ddim_timesteps(100, 10, t_start=-1)


def test_img2img_oracle_recovers_x0_exactly():
    """With an oracle that returns the TRUE noise, a single DDIM step from
    (x_init = q_sample(x0, t0), t_start=t0) recovers x0 exactly:
    x0_hat = (x_t - sb*eps)/sa == x0 and abar_s = 1 at the final step."""
    sch = DiffusionSchedule.linear(100)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t0 = 37
    t_vec = jnp.full((B,), t0, jnp.int32)
    x_t = q_sample_with_noise(sch, x0, t_vec, eps)

    out = ddim_sample(
        lambda x, t: eps, sch, (B, D), jax.random.PRNGKey(1),
        num_steps=1, eta=0.0, x_init=x_t, t_start=t0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def test_img2img_low_strength_stays_close():
    """A shallow partial chain (small t_start) from a noised real image
    lands much closer to it than a full-chain sample does."""
    sch = DiffusionSchedule.linear(100)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    key = jax.random.PRNGKey(2)

    def apply_fn(x, t):
        return 0.05 * x  # weak arbitrary denoiser

    t0 = 5
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    x_t = q_sample_with_noise(sch, x0, jnp.full((B,), t0, jnp.int32), eps)
    near = ddim_sample(apply_fn, sch, (B, D), key, num_steps=5,
                       x_init=x_t, t_start=t0)
    far = ddim_sample(apply_fn, sch, (B, D), key, num_steps=50)
    d_near = float(jnp.abs(near - x0).mean())
    d_far = float(jnp.abs(far - x0).mean())
    assert d_near < d_far


@pytest.mark.parametrize("method", ["ddpm", "ddim"])
def test_inpainting_known_region_exact(method):
    """The output equals x_known EXACTLY where mask == 1 (the final step
    composites the clean known image), and differs elsewhere."""
    sch = DiffusionSchedule.linear(30)
    rng = np.random.default_rng(2)
    x_known = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.asarray((np.arange(D) < D // 2), jnp.float32)[None, :]
    key = jax.random.PRNGKey(4)

    def apply_fn(x, t):
        return 0.1 * x

    if method == "ddpm":
        out = ddpm_sample(apply_fn, sch, (B, D), key, mask=mask,
                          x_known=x_known)
    else:
        out = ddim_sample(apply_fn, sch, (B, D), key, num_steps=6,
                          mask=mask, x_known=x_known)
    out = np.asarray(out)
    known = np.asarray(x_known)
    m = np.broadcast_to(np.asarray(mask), out.shape).astype(bool)
    np.testing.assert_array_equal(out[m], known[m])
    assert np.abs(out[~m] - known[~m]).max() > 1e-3


def test_inpainting_validation():
    sch = DiffusionSchedule.linear(10)
    key = jax.random.PRNGKey(0)
    fn = lambda x, t: x * 0.0
    with pytest.raises(ValueError, match="BOTH"):
        ddpm_sample(fn, sch, (B, D), key, mask=jnp.ones((B, D)))
    with pytest.raises(ValueError, match="BOTH"):
        ddim_sample(fn, sch, (B, D), key, x_known=jnp.ones((B, D)))
    with pytest.raises(ValueError, match="noise_stream"):
        ddpm_sample(fn, sch, (B, D), key, mask=jnp.ones((B, D)),
                    x_known=jnp.ones((B, D)),
                    noise_stream=jnp.zeros((10, B, D)))


def test_make_sampler_t_start_requires_ddim():
    from tinydiffusion_tpu.experiments.common import make_sampler
    from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent

    sch = DiffusionSchedule.linear(10)
    model = MLPUNetLatent(latent_dim=D)
    with pytest.raises(ValueError, match="ddim"):
        make_sampler(model, sch, (B, D), method="ddpm", t_start=5)


@pytest.mark.slow
def test_generate_cli_img2img_and_inpaint(tmp_path):
    """--init-image/--strength and --inpaint-image/--inpaint-mask through
    the real serving CLI from a freshly trained checkpoint."""
    import os

    from PIL import Image

    from tinydiffusion_tpu.experiments.diffusion import DiffusionConfig, run

    cfg = DiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"), compute_dtype="float32",
        max_steps_per_epoch=3, log_every=1, use_mesh=False,
        visualize_denoising=False,
        checkpoint_path=str(tmp_path / "ckpt" / "final"),
    )
    result = run(cfg)
    assert np.isfinite(result["losses"]).all()

    # a synthetic 28x28 "digit" and a left-half keep mask
    img = np.zeros((28, 28), np.uint8)
    img[6:22, 12:16] = 255
    Image.fromarray(img).save(tmp_path / "init.png")
    m = np.zeros((28, 28), np.uint8)
    m[:, :14] = 255
    Image.fromarray(m).save(tmp_path / "mask.png")

    import generate

    out1 = str(tmp_path / "img2img.png")
    generate.main([
        "--checkpoint", str(tmp_path / "ckpt" / "final"),
        "--n", "4", "--out", out1,
        "--sampler", "ddim", "--sample-steps", "5",
        "--init-image", str(tmp_path / "init.png"), "--strength", "0.5",
    ])
    assert os.path.exists(out1)

    out2 = str(tmp_path / "inpaint.png")
    generate.main([
        "--checkpoint", str(tmp_path / "ckpt" / "final"),
        "--n", "4", "--out", out2,
        "--sampler", "ddim", "--sample-steps", "5",
        "--inpaint-image", str(tmp_path / "init.png"),
        "--inpaint-mask", str(tmp_path / "mask.png"),
    ])
    assert os.path.exists(out2)
