"""MNIST loading — parity with the reference's torchvision pipeline
(/root/reference/diffusion.py:196-213: ToTensor + Normalize((0.5,), (0.5,)),
80/20 train/val split with seed 42 in conditional_diffusion.py:214-219).

TPU-native shape contract is NHWC (N, 28, 28, 1). Storage is uint8; the
``ToTensor + Normalize`` transform is the affine ``x * 2/255 - 1`` applied
either host-side by the fused native gather or on device by the prefetch
worker (data/loader.py) — bytes, not floats, cross the PCIe/tunnel link.

Zero-egress environment: when no IDX files are present under ``data_root``
a deterministic synthetic digit set (pixel-font glyphs + jitter + noise) is
generated and cached, so every experiment runs hermetically.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Optional, Tuple

import numpy as np

from tinydiffusion_tpu.data import native

# ToTensor + Normalize((0.5,), (0.5,)): u8 -> [-1, 1].
MNIST_SCALE = 2.0 / 255.0
MNIST_SHIFT = -1.0

_IDX_FILES = {
    True: ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    False: ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}

# 7x5 pixel-font digit glyphs for the synthetic fallback.
_GLYPHS = [
    "01110 10001 10011 10101 11001 10001 01110",  # 0
    "00100 01100 00100 00100 00100 00100 01110",  # 1
    "01110 10001 00001 00010 00100 01000 11111",  # 2
    "11110 00001 00001 01110 00001 00001 11110",  # 3
    "00010 00110 01010 10010 11111 00010 00010",  # 4
    "11111 10000 11110 00001 00001 10001 01110",  # 5
    "00110 01000 10000 11110 10001 10001 01110",  # 6
    "11111 00001 00010 00100 01000 01000 01000",  # 7
    "01110 10001 10001 01110 10001 10001 01110",  # 8
    "01110 10001 10001 01111 00001 00010 01100",  # 9
]


def _open_maybe_gz(path: str):
    return gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")


def _find_idx(data_root: str, name: str) -> Optional[str]:
    for sub in ("", "MNIST/raw"):
        for suffix in ("", ".gz"):
            p = os.path.join(data_root, sub, name + suffix)
            if os.path.exists(p):
                return p
    return None


def _read_idx(path: str) -> np.ndarray:
    """Parse an IDX-format file (big-endian magic + dims + u8 payload)."""
    with _open_maybe_gz(path) as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def _glyph_bank() -> np.ndarray:
    """(10, 28, 28) float canonical digit images, upscaled pixel font."""
    bank = np.zeros((10, 28, 28), np.float32)
    for d, spec in enumerate(_GLYPHS):
        rows = spec.split()
        g = np.array([[c == "1" for c in r] for r in rows], np.float32)  # (7, 5)
        g = np.kron(g, np.ones((3, 3), np.float32))  # 21 x 15
        bank[d, 3:24, 6:21] = g
    return bank


def _synthesize(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic digit-like images: glyph + translation + intensity +
    noise. Vectorized via a precomputed (10, 49, 28, 28) shift table."""
    bank = _glyph_bank()
    shifts = [(dy, dx) for dy in range(-3, 4) for dx in range(-3, 4)]
    table = np.stack(
        [np.roll(bank, s, axis=(1, 2)) for s in shifts], axis=1
    )  # (10, 49, 28, 28)
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n).astype(np.int32)
    offs = rng.integers(0, len(shifts), n)
    imgs = table[labels, offs]
    imgs = imgs * rng.uniform(0.65, 1.0, (n, 1, 1)).astype(np.float32)
    imgs = imgs + rng.normal(0.0, 0.03, imgs.shape).astype(np.float32)
    imgs = np.clip(imgs, 0.0, 1.0)
    return (imgs * 255).astype(np.uint8)[..., None], labels


def load_mnist_u8(
    data_root: str, train: bool = True, synthetic_n: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 images (N, 28, 28, 1) + int32 labels.

    Real IDX files under ``data_root`` (or ``data_root/MNIST/raw``) win;
    otherwise a cached deterministic synthetic set is generated.
    """
    img_name, lbl_name = _IDX_FILES[bool(train)]
    img_path, lbl_path = _find_idx(data_root, img_name), _find_idx(data_root, lbl_name)
    if img_path and lbl_path:
        images = _read_idx(img_path)[..., None]
        labels = _read_idx(lbl_path).astype(np.int32)
        return images, labels

    n = synthetic_n if synthetic_n is not None else (60_000 if train else 10_000)
    split = "train" if train else "test"
    cache = os.path.join(data_root, f"synthetic_mnist_{split}_{n}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            return z["images"], z["labels"]
    images, labels = _synthesize(n, seed=1234 if train else 5678)
    os.makedirs(data_root, exist_ok=True)
    np.savez_compressed(cache, images=images, labels=labels)
    return images, labels


def load_mnist(
    data_root: str, train: bool = True, synthetic_n: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """float32 images in [-1, 1] (the reference's transform) + int32 labels."""
    images_u8, labels = load_mnist_u8(data_root, train=train, synthetic_n=synthetic_n)
    images = native.normalize_u8(images_u8, MNIST_SCALE, MNIST_SHIFT)
    # fp32 rounding of 255 * (2/255) overshoots 1 by 1 ulp; keep the
    # documented [-1, 1] contract exact.
    np.clip(images, -1.0, 1.0, out=images)
    return images, labels


def train_val_split(
    images: np.ndarray, labels: np.ndarray, val_frac: float, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic shuffled split (conditional_diffusion.py:214-219:
    80/20 with generator seed 42). Returns (xt, yt, xv, yv)."""
    n = len(images)
    perm = np.random.default_rng(seed).permutation(n)
    n_val = int(round(n * val_frac))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    return (
        native.gather_rows(images, train_idx), labels[train_idx],
        native.gather_rows(images, val_idx), labels[val_idx],
    )
