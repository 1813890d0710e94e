"""Image-grid artifacts (sample sheets, reconstruction panels).

Replaces ``torchvision.utils.make_grid(nrow=4, normalize=True)`` +
``save_image`` (diffusion.py:249-250) and the matplotlib grids
(diffusion.py:280-317) — torchvision is unavailable here, so grids are
assembled in numpy and written with PIL.
"""

from __future__ import annotations

import os

import numpy as np


def make_grid(
    images: np.ndarray,
    nrow: int = 4,
    padding: int = 2,
    normalize: bool = True,
    pad_value: float = 0.0,
) -> np.ndarray:
    """Tile NHWC images into one HWC grid (torchvision make_grid semantics:
    row-major placement, ``padding`` px between tiles, optional min/max
    normalization over the whole batch)."""
    images = np.asarray(images, dtype=np.float32)
    if images.ndim == 3:
        images = images[..., None]
    n, h, w, c = images.shape
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-8)
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.full(
        (padding + nrows * (h + padding), padding + ncol * (w + padding), c),
        pad_value,
        dtype=np.float32,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        top = padding + r * (h + padding)
        left = padding + col * (w + padding)
        grid[top : top + h, left : left + w] = images[i]
    return grid


def save_image_grid(
    images: np.ndarray,
    path: str,
    nrow: int = 4,
    normalize: bool = True,
    labels=None,
) -> None:
    """Write a PNG sample sheet. ``labels`` (optional) are drawn above each
    tile like the reference's labeled matplotlib grids
    (conditional_diffusion.py:312-339)."""
    from PIL import Image, ImageDraw

    grid = make_grid(images, nrow=nrow, normalize=normalize)
    arr = (np.clip(grid, 0.0, 1.0) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        img = Image.fromarray(arr[..., 0], mode="L")
    else:
        img = Image.fromarray(arr, mode="RGB")
    if labels is not None:
        img = img.convert("RGB")
        draw = ImageDraw.Draw(img)
        n, h, w = np.asarray(images).shape[:3]
        padding = 2
        for i, lab in enumerate(labels):
            r, col = divmod(i, nrow)
            top = padding + r * (h + padding)
            left = padding + col * (w + padding)
            draw.text((left + 1, top + 1), str(lab), fill=(255, 64, 64))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img.save(path)
