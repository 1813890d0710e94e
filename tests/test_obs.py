"""Observability subsystem tests: metrics JSONL, image grids, profiling
timer, checkify wrapper, finite checks."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusion_tpu.obs.debug import assert_all_finite, checked, scrub_nonfinite
from tinydiffusion_tpu.obs.images import make_grid, save_image_grid
from tinydiffusion_tpu.obs.metrics import MetricsLogger, Throughput
from tinydiffusion_tpu.obs.profiling import time_fn


def test_metrics_jsonl(tmp_path):
    logger = MetricsLogger("proj", str(tmp_path), {"lr": 1e-3}, use_wandb=False, quiet=True)
    logger.log({"train_loss": 0.5, "epoch": 1}, step=10)
    logger.log({"val_loss": 0.4}, step=20)
    logger.finish()
    lines = [json.loads(x) for x in open(tmp_path / "proj" / "metrics.jsonl")]
    assert lines[0]["train_loss"] == 0.5 and lines[0]["step"] == 10
    assert lines[1]["val_loss"] == 0.4
    config = json.load(open(tmp_path / "proj" / "config.json"))
    assert config["lr"] == 1e-3


def test_make_grid_layout():
    images = np.zeros((6, 8, 8, 1), np.float32)
    images[0, :, :, 0] = 1.0
    grid = make_grid(images, nrow=4, padding=2, normalize=True)
    # 2 rows x 4 cols of 8px tiles with 2px padding
    assert grid.shape == (2 + 2 * 10, 2 + 4 * 10, 1)
    assert grid[2:10, 2:10].min() == 1.0  # first tile is the bright one


def test_save_image_grid_with_labels(tmp_path):
    path = str(tmp_path / "g.png")
    save_image_grid(np.random.rand(4, 16, 16, 1), path, nrow=2, labels=[1, 2, 3, 4])
    assert os.path.getsize(path) > 0


def test_time_fn_blocks():
    f = jax.jit(lambda x: x * 2)
    stats = time_fn(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert stats["mean_ms"] > 0 and stats["iters"] == 3


def test_checked_raises_on_nan():
    @checked
    def bad(x):
        return jnp.log(x)  # log(-1) -> NaN

    with pytest.raises(Exception):
        bad(jnp.array([-1.0]))
    good = checked(lambda x: x + 1)
    np.testing.assert_allclose(np.asarray(good(jnp.array([1.0]))), [2.0])


def test_scrub_and_assert_finite():
    x = jnp.array([1.0, jnp.nan, jnp.inf])
    np.testing.assert_allclose(np.asarray(scrub_nonfinite(x)), [1.0, 0.0, 0.0])
    assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": x}, "state")


def test_throughput_counter():
    t = Throughput()
    t.add(100)
    assert t.samples_per_sec > 0


def test_loss_accumulator_scalar_and_vector_mix():
    """add (scalars) and add_many ((K,) vectors) interleave: count, sum,
    mean, last, values all treat the buffer as the flat step stream."""
    from tinydiffusion_tpu.obs.metrics import LossAccumulator

    acc = LossAccumulator()
    acc.add(jnp.asarray(1.0))
    acc.add_many(jnp.asarray([2.0, 3.0, 4.0]))
    acc.add(jnp.asarray(5.0))
    acc.add_many(jnp.asarray([6.0]))  # ragged tail group
    assert acc.count == 6
    assert acc.sum() == 21.0
    assert acc.mean() == 3.5
    assert acc.last() == 6.0
    np.testing.assert_allclose(acc.values(), [1, 2, 3, 4, 5, 6])
    acc.reset()
    assert acc.count == 0 and acc.sum() == 0.0


def test_loss_accumulator_finite_stats_with_vectors():
    from tinydiffusion_tpu.obs.metrics import LossAccumulator

    acc = LossAccumulator()
    acc.add_many(jnp.asarray([1.0, jnp.inf, 3.0]))
    mean, bad = acc.finite_mean_and_bad_count()
    assert mean == 2.0 and bad == 1
