"""Data pipeline tests: normalization contract, split determinism, batching."""

import numpy as np

from tinydiffusion_tpu.data.loader import BatchIterator
from tinydiffusion_tpu.data.mnist import load_mnist, train_val_split


def test_mnist_contract(tmp_path):
    images, labels = load_mnist(str(tmp_path), train=True, synthetic_n=600)
    assert images.shape == (600, 28, 28, 1)
    assert images.dtype == np.float32
    assert labels.shape == (600,) and labels.dtype == np.int32
    # Normalize((0.5,), (0.5,)) contract: range [-1, 1] (diffusion.py:202-204).
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert images.min() < -0.9  # background is -1
    assert set(np.unique(labels)) <= set(range(10))


def test_mnist_cached_and_deterministic(tmp_path):
    a, la = load_mnist(str(tmp_path), train=True, synthetic_n=100)
    b, lb = load_mnist(str(tmp_path), train=True, synthetic_n=100)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)


def test_split_deterministic_and_disjoint(tmp_path):
    images, labels = load_mnist(str(tmp_path), train=True, synthetic_n=500)
    xt, yt, xv, yv = train_val_split(images, labels, 0.2, seed=42)
    xt2, _, xv2, _ = train_val_split(images, labels, 0.2, seed=42)
    np.testing.assert_array_equal(xt, xt2)
    np.testing.assert_array_equal(xv, xv2)
    assert len(xv) == 100 and len(xt) == 400


def test_batch_iterator_fixed_shapes():
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    y = np.arange(10, dtype=np.int32)
    it = BatchIterator([x, y], batch_size=4, shuffle=True, seed=0)
    batches = list(it.epoch(0))
    assert len(batches) == 2 == len(it)
    for bx, by in batches:
        assert bx.shape == (4, 3) and by.shape == (4,)
        # alignment preserved under shuffle
        np.testing.assert_array_equal(bx[:, 0], by * 3)


def test_batch_iterator_reshuffles_per_epoch():
    x = np.arange(16, dtype=np.float32)[:, None]
    it = BatchIterator([x], batch_size=16, shuffle=True, seed=0)
    (e0,) = next(iter(it.epoch(0)))
    (e1,) = next(iter(it.epoch(1)))
    assert not np.array_equal(e0, e1)
