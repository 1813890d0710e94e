"""Native C++ host-loader: builds with the system toolchain, matches the
numpy semantics exactly, and plugs into BatchIterator."""

import numpy as np
import pytest

from tinydiffusion_tpu.data import native
from tinydiffusion_tpu.data.loader import BatchIterator


def test_native_builds():
    assert native.available(), "g++ toolchain present in this image — must build"


def test_gather_normalize_matches_numpy(rng):
    src = rng.integers(0, 256, (50, 7, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, 16)
    scale, shift = 2.0 / 255.0, -1.0
    out = native.gather_normalize_u8(src, idx, scale, shift)
    expected = src[idx].astype(np.float32) * scale + shift
    assert out.dtype == np.float32 and out.shape == (16, 7, 3)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_gather_rows_matches_numpy(rng):
    for dtype in [np.float32, np.int32, np.uint8]:
        src = np.ascontiguousarray(
            rng.integers(0, 100, (30, 5)).astype(dtype)
        )
        idx = rng.integers(0, 30, 12)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_batch_iterator_native_path(rng):
    images = rng.integers(0, 256, (40, 4, 4, 1), dtype=np.uint8)
    labels = np.arange(40, dtype=np.int32)
    it = BatchIterator(
        [images, labels], batch_size=8, shuffle=True, seed=3,
        u8_normalize=(2.0 / 255.0, -1.0),
    )
    for x, y in it.epoch(0):
        assert x.dtype == np.float32 and x.shape == (8, 4, 4, 1)
        assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6  # fp32 rounding
        # alignment: x rows must equal the normalized source rows of y
        expected = images[y].astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(x, expected, rtol=1e-6)


def test_fallback_matches_native(rng, monkeypatch):
    src = rng.integers(0, 256, (20, 6), dtype=np.uint8)
    idx = rng.integers(0, 20, 5)
    want = native.gather_normalize_u8(src, idx, 0.5, 1.0)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)  # force numpy fallback
    got = native.gather_normalize_u8(src, idx, 0.5, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
