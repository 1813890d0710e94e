"""Classifier-free guidance (label dropout + guided sampling).

No reference counterpart (Ho & Salimans 2022) — the production-serving path
for conditional checkpoints: training replaces labels with a reserved null
class at probability p; sampling combines conditional and null predictions
``eps = eps_null + s*(eps_cond - eps_null)`` from ONE doubled-batch forward
per chain step (experiments/common.make_sampler).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.experiments.common import make_sampler
from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_train_step,
)

B, D, NCLS = 8, 20, 10  # null label = NCLS (one extra embedding row)


def _setup():
    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D, num_classes=NCLS + 1)
    tx = optax.sgd(1e-2)
    y = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y, y)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, NCLS, (B,)), jnp.int32)
    return schedule, model, tx, state, x0, ys


def _find_embedding(params):
    """Locate the (NCLS+1, time_dim) class-embedding table in the tree."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if leaf.ndim == 2 and leaf.shape[0] == NCLS + 1:
            return path, np.asarray(leaf)
    raise AssertionError("class embedding table not found")


@pytest.mark.heavy  # ~19s compile — re-tiered r5
def test_label_dropout_trains_the_null_row():
    """With dropout the reserved null embedding row receives gradient; without
    it the row never moves (labels stay in [0, NCLS)).

    The dropout batch must MIX null and real labels (p=0.5, a few steps): if
    every element shares one label (p=1.0), the embedding perturbation is
    batch-uniform and this model's BatchNorm subtracts it back out — the row's
    gradient is structurally ~0 (measured 8e-9). Mixed batches, the training
    regime CFG actually uses, break that cancellation."""
    schedule, model, tx, state, x0, ys = _setup()
    _, before = _find_embedding(state.params)

    step_plain = make_train_step(model, tx, schedule, conditional=True)
    s_plain, _ = step_plain(_setup()[3], x0, ys)
    _, after_plain = _find_embedding(s_plain.params)
    assert np.array_equal(before[NCLS], after_plain[NCLS])
    assert not np.array_equal(before[:NCLS], after_plain[:NCLS])

    step_cfg = make_train_step(model, tx, schedule, conditional=True,
                               label_dropout=0.5, null_label=NCLS)
    s_cfg = _setup()[3]
    for _ in range(3):
        s_cfg, loss = step_cfg(s_cfg, x0, ys)
        assert np.isfinite(float(loss))
    _, after_cfg = _find_embedding(s_cfg.params)
    assert not np.array_equal(before[NCLS], after_cfg[NCLS])


def test_label_dropout_requires_conditional_and_null():
    schedule, model, tx, state, x0, ys = _setup()
    with pytest.raises(ValueError, match="null_label"):
        make_train_step(model, tx, schedule, conditional=True,
                        label_dropout=0.5)
    with pytest.raises(ValueError, match="conditional"):
        make_train_step(model, tx, schedule, label_dropout=0.5)


def test_guidance_scale_one_matches_plain_conditional():
    """s=1 collapses to the pure conditional prediction: the guided sampler
    (doubled-batch path is bypassed at exactly 1.0) equals the plain one."""
    schedule, model, tx, state, x0, ys = _setup()
    kw = dict(conditional=True, method="ddim", sample_steps=4)
    plain = make_sampler(model, schedule, (B, D), **kw)
    guided = make_sampler(model, schedule, (B, D), guidance_scale=1.0,
                          null_label=NCLS, **kw)
    key = jax.random.PRNGKey(3)
    a = plain(state.params, state.batch_stats, key, y=ys)
    b = guided(state.params, state.batch_stats, key, y=ys)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_guidance_scale_zero_matches_null_labels():
    """s=0 ignores the conditioning entirely: identical to sampling the
    plain conditional path with every label set to the null class."""
    schedule, model, tx, state, x0, ys = _setup()
    kw = dict(conditional=True, method="ddim", sample_steps=4)
    guided = make_sampler(model, schedule, (B, D), guidance_scale=0.0,
                          null_label=NCLS, **kw)
    plain = make_sampler(model, schedule, (B, D), **kw)
    key = jax.random.PRNGKey(3)
    a = guided(state.params, state.batch_stats, key, y=ys)
    b = plain(state.params, state.batch_stats, key,
              y=jnp.full((B,), NCLS, jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_guidance_changes_output_and_stays_finite():
    schedule, model, tx, state, x0, ys = _setup()
    kw = dict(conditional=True, method="ddim", sample_steps=4)
    guided = make_sampler(model, schedule, (B, D), guidance_scale=3.0,
                          null_label=NCLS, **kw)
    plain = make_sampler(model, schedule, (B, D), **kw)
    key = jax.random.PRNGKey(3)
    a = np.asarray(guided(state.params, state.batch_stats, key, y=ys))
    b = np.asarray(plain(state.params, state.batch_stats, key, y=ys))
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() > 1e-6


def test_guidance_without_null_label_raises():
    schedule, model, tx, state, x0, ys = _setup()
    with pytest.raises(ValueError, match="null_label"):
        make_sampler(model, schedule, (B, D), conditional=True,
                     guidance_scale=2.0)


@pytest.mark.slow
def test_conditional_experiment_cfg_smoke(tmp_path):
    """--label-dropout + --guidance-scale through the full conditional
    experiment, then CFG serving via generate.py from the best checkpoint."""
    import os

    from tinydiffusion_tpu.experiments.conditional_diffusion import (
        ConditionalDiffusionConfig,
        run,
    )

    cfg = ConditionalDiffusionConfig(
        num_epochs=1, batch_size=16, num_timesteps=20, time_dim=16,
        n_samples=4, data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"), compute_dtype="float32",
        max_steps_per_epoch=2, log_every=1, use_mesh=False,
        visualize_denoising=False, sample_every_epoch=False,
        label_dropout=0.2, guidance_scale=2.0, ema_decay=0.9,
        model_save_path=str(tmp_path / "ckpt" / "best"),
    )
    result = run(cfg)
    assert np.isfinite(result["val_losses"]).all()

    import generate

    out = str(tmp_path / "cfg_samples.png")
    generate.main([
        "--checkpoint", str(tmp_path / "ckpt" / "best"),
        "--n", "4", "--digit", "7", "--out", out,
        "--sampler", "ddim", "--sample-steps", "5",
        "--guidance-scale", "2.5",
    ])
    assert os.path.exists(out)


# ---------------------------------------------------------------------------
# Text-conditional (LAION) CFG: caption dropout + guided sampling
# ---------------------------------------------------------------------------

# Tiny time_dim / latent_size / latent_channels. latent_size must survive
# the LatentUNet's three 2x pools (8 -> 4 -> 2 -> 1, all powers of two).
TD, LS, LC = 16, 8, 2


class _IdentityCodec:
    """Test codec: 'images' are already latents; encode/decode are identity."""

    def encode(self, images, key=None):
        return images

    def decode(self, latents):
        return latents


def _laion_setup():
    from tinydiffusion_tpu.models.unet_latent import LatentUNet

    schedule = DiffusionSchedule.linear(20)
    model = LatentUNet(time_dim=TD, in_channels=LC, base_width=4)
    tx = optax.sgd(1e-2)
    x = jnp.zeros((B, LS, LS, LC), jnp.float32)
    example = (x, jnp.zeros((B,), jnp.int32), jnp.zeros((B, TD), jnp.float32))
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0),
                               ema=True)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.standard_normal((B, LS, LS, LC)), jnp.float32)
    embeds = jnp.asarray(rng.standard_normal((B, TD)), jnp.float32)
    null = jnp.asarray(rng.standard_normal((TD,)), jnp.float32)
    return schedule, model, tx, state, images, embeds, null


@pytest.mark.heavy  # ~35s compile — re-tiered r5
def test_laion_caption_dropout_and_ema_step():
    """The text-conditional step trains with caption dropout + EMA: loss
    finite, the EMA shadow moves and lags the live params."""
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        make_laion_train_step,
    )

    schedule, model, tx, state, images, embeds, null = _laion_setup()
    before = jax.tree_util.tree_map(np.asarray, state.params)
    step = make_laion_train_step(model, tx, schedule, _IdentityCodec(),
                                 ema_decay=0.5, caption_dropout=0.5,
                                 null_embed=null)
    s = state
    for _ in range(3):
        s, loss = step(s, images, embeds)
        assert np.isfinite(float(loss))
    p, e = (jax.tree_util.tree_leaves(t) for t in (s.params, s.ema_params))
    b = jax.tree_util.tree_leaves(before)
    assert any(not np.array_equal(np.asarray(x), y) for x, y in zip(e, b))
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(e, p))


def test_laion_caption_dropout_requires_null_embed():
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        make_laion_train_step,
    )

    schedule, model, tx, state, images, embeds, null = _laion_setup()
    with pytest.raises(ValueError, match="null_embed"):
        make_laion_train_step(model, tx, schedule, _IdentityCodec(),
                              caption_dropout=0.5)


@pytest.mark.heavy  # ~21s compile — re-tiered r5
def test_laion_guided_sampler_identities():
    """s=1 bypasses the doubled-batch path and equals the plain sampler;
    s=0 equals sampling with every embedding set to the null embedding;
    s=3 changes the output and stays finite."""
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        make_laion_sampler,
    )

    schedule, model, tx, state, images, embeds, null = _laion_setup()
    codec = _IdentityCodec()
    kw = dict(n_samples=B, latent_size=LS, latent_channels=LC,
              dtype=jnp.float32)
    plain = make_laion_sampler(model, schedule, codec, **kw)
    s1 = make_laion_sampler(model, schedule, codec, guidance_scale=1.0,
                            null_embed=null, **kw)
    s0 = make_laion_sampler(model, schedule, codec, guidance_scale=0.0,
                            null_embed=null, **kw)
    s3 = make_laion_sampler(model, schedule, codec, guidance_scale=3.0,
                            null_embed=null, **kw)
    key = jax.random.PRNGKey(5)
    a = np.asarray(plain(state.params, state.batch_stats, key, embeds))
    np.testing.assert_allclose(
        np.asarray(s1(state.params, state.batch_stats, key, embeds)), a,
        rtol=1e-6)
    null_b = jnp.broadcast_to(null[None, :], embeds.shape)
    np.testing.assert_allclose(
        np.asarray(s0(state.params, state.batch_stats, key, embeds)),
        np.asarray(plain(state.params, state.batch_stats, key, null_b)),
        rtol=1e-4, atol=1e-5)
    g = np.asarray(s3(state.params, state.batch_stats, key, embeds))
    assert np.isfinite(g).all()
    assert np.abs(g - a).max() > 1e-6


def test_laion_guided_sampler_requires_null_embed():
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        make_laion_sampler,
    )

    schedule, model, tx, state, images, embeds, null = _laion_setup()
    with pytest.raises(ValueError, match="null_embed"):
        make_laion_sampler(model, schedule, _IdentityCodec(), n_samples=B,
                           latent_size=LS, latent_channels=LC,
                           dtype=jnp.float32, guidance_scale=2.0)


@pytest.mark.slow
def test_laion_experiment_cfg_smoke(tmp_path):
    """--caption-dropout / --guidance-scale / --ema-decay through the full
    LAION experiment (offline synthetic data, hash encoder, patch codec)."""
    import os

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
        text_encoder="hash", caption_dropout=0.25, guidance_scale=2.0,
        ema_decay=0.9,
    )
    result = run(cfg)
    assert np.isfinite(result["val_losses"]).all()
    assert os.path.exists(tmp_path / "out" / "samples_epoch_0.png")
    state = result["state"]
    assert state.ema_params is not None

    # Standalone text-to-image serving from the checkpoint: restores the
    # EMA shadow, persisted codec basis, and text encoder from the sidecar;
    # guided DDIM from arbitrary prompts.
    import generate_laion

    out = str(tmp_path / "served.png")
    generate_laion.main([
        "--checkpoint", str(tmp_path / "ckpt" / "best"),
        "--prompt", "a photo of a red cat", "--prompt", "a photo of a dog",
        "--sampler", "ddim", "--sample-steps", "5",
        "--guidance-scale", "2.0", "--out", out,
    ])
    assert os.path.exists(out)
