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
