"""Resize / pooling primitives with PyTorch-parity semantics, MXU-friendly.

The reference UNet leans on two ops whose exact semantics JAX does not ship:

- ``F.interpolate(..., mode="bilinear", align_corners=True)`` — used at every
  decoder stage (diffusion.py:102, 137-159). ``jax.image.resize`` implements
  half-pixel centers, which does NOT match align_corners. We build the exact
  align-corners interpolation as two small dense matrices applied along H and
  W. A separable linear resize is just two matmuls, which XLA tiles onto the
  MXU — faster on TPU than a gather-based implementation and bit-accurate to
  torch (which also computes source coords as ``i * (in-1)/(out-1)``).
- ``nn.MaxPool2d(2, ceil_mode=True)`` (diffusion.py:101) — implemented with
  ``lax.reduce_window`` plus explicit -inf edge padding so 7 -> 4 etc.

All ops take NHWC (TPU-native layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense ``[out, in]`` interpolation matrix for 1-D align-corners bilinear."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        w[0, 0] = 1.0
    else:
        scale = (in_size - 1) / (out_size - 1)
        for i in range(out_size):
            src = i * scale
            lo = int(np.floor(src))
            lo = min(lo, in_size - 1)
            hi = min(lo + 1, in_size - 1)
            frac = src - lo
            w[i, lo] += 1.0 - frac
            w[i, hi] += frac
    return w.astype(np.float32)


def resize_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize of NHWC ``x`` to spatial ``size``.

    Matches ``torch.nn.functional.interpolate(x, size, mode="bilinear",
    align_corners=True)`` (diffusion.py:137-159). Implemented as two
    contractions (separable), so the work lands on the MXU.
    """
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_align_corners_matrix(h_in, h_out), dtype=x.dtype)
    mw = jnp.asarray(_align_corners_matrix(w_in, w_out), dtype=x.dtype)
    # HIGHEST precision: each output pixel mixes at most 2 inputs per axis, so
    # fp32 accumulation is essentially free but keeps bit-parity with torch on
    # TPU (where default matmul precision is bf16).
    prec = jax.lax.Precision.HIGHEST
    # [B,h,w,C] -> [B,H,w,C]: contract h with mh.
    x = jnp.einsum("bhwc,Hh->bHwc", x, mh, precision=prec)
    # [B,H,w,C] -> [B,H,W,C]: contract w with mw.
    x = jnp.einsum("bhwc,Ww->bhWc", x, mw, precision=prec)
    return x


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)``."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (2 * h, 2 * w))


def _pool_pads(h: int, w: int, window: int, stride: int):
    pad_h = (-(h - window) % stride) if h > window else (window - h)
    pad_w = (-(w - window) % stride) if w > window else (window - w)
    return pad_h, pad_w


def _reduce_window_max(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    _, h, w, _ = x.shape
    pad_h, pad_w = _pool_pads(h, w, window, stride)
    # NOTE: init must be a Python scalar, not a traced array — a traced init
    # demotes the op from reduce_window_max (which has a VJP) to the generic
    # variadic reduce_window (which does not support reverse-mode autodiff).
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


@jax.custom_vjp
def _max_pool_ceil_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return _reduce_window_max(x, 2, 2)


def _max_pool_2x2_fwd(x):
    return _max_pool_ceil_2x2(x), x


def _max_pool_2x2_bwd(x, g):
    """Backward without XLA's select-and-scatter (4.5% of the UNet28 train
    step device time, BASELINE.md hotspot table — the single most expensive
    non-MXU op in the step).

    2x2/stride-2 windows are DISJOINT, so the gradient routes to the
    argmax within each window independently: pad to even with -inf,
    reshape to expose the 4 window positions, one-hot on argmax, multiply,
    reshape back. All elementwise + a length-4 argmax — XLA fuses it with
    the surrounding bf16->fp32 converts instead of emitting the serial
    select-and-scatter custom call. ``jnp.argmax`` takes the FIRST max in
    (dy, dx) row-major order — exactly torch's MaxPool2d backward
    convention (and select-and-scatter's GE-select order), so gradients
    are identical including on ties.
    """
    b, h, w, c = x.shape
    pad_h, pad_w = _pool_pads(h, w, 2, 2)
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                 constant_values=-jnp.inf)
    hp, wp = h + pad_h, w + pad_w
    # (B, Ho, dy, Wo, dx, C) -> (B, Ho, Wo, dy*dx, C), row-major (dy, dx)
    xw = xp.reshape(b, hp // 2, 2, wp // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b, hp // 2, wp // 2, 4, c)
    onehot = jax.nn.one_hot(jnp.argmax(xw, axis=3), 4, axis=3, dtype=g.dtype)
    gw = onehot * g[:, :, :, None, :]
    gp = gw.reshape(b, hp // 2, wp // 2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    gp = gp.reshape(b, hp, wp, c)
    return (gp[:, :h, :w, :],)


_max_pool_ceil_2x2.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)


def max_pool_ceil(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """``nn.MaxPool2d(window, stride, ceil_mode=True)`` on NHWC.

    ceil_mode pads the bottom/right edge with -inf so odd sizes round up
    (28 -> 14 -> 7 -> 4 in the reference encoder, diffusion.py:101, 119-124).

    The 2x2/stride-2 case (every use in the repo) carries a custom VJP
    that replaces select-and-scatter with disjoint-window argmax routing —
    identical gradients (torch's first-max tie convention), fusible ops.
    """
    if window == 2 and stride == 2:
        return _max_pool_ceil_2x2(x)
    return _reduce_window_max(x, window, stride)
