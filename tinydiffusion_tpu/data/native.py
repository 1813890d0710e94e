"""ctypes bindings for the C++ host-loader kernels (native/hostloader.cpp).

Batch assembly on this 1-core host is a real cost: numpy's
``src[idx].astype(f32) * scale + shift`` makes three full passes over the
batch. The C++ kernel fuses gather + u8->f32 + normalize into one pass.
Built on demand with the system g++ and cached by source hash; every entry
point falls back to the equivalent numpy expression when the toolchain or
build is unavailable, so the pipeline never hard-depends on the .so.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "native", "hostloader.cpp")
_CACHE_DIR = os.path.expanduser("~/.cache/tinydiffusion_tpu")

_lib = None
_tried = False


def _build() -> str:
    """Compile hostloader.cpp into the user cache, keyed by source hash."""
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.md5(src).hexdigest()[:12]
    so_path = os.path.join(_CACHE_DIR, f"libhostloader-{tag}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    # Build to a temp name then rename: atomic under concurrent test workers.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return so_path


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        lib = ctypes.CDLL(_build())
        lib.gather_normalize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
        ]
        lib.gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.normalize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    """True when the native library built (or was cached) successfully."""
    return _load() is not None


def gather_normalize_u8(src: np.ndarray, idx, scale: float, shift: float) -> np.ndarray:
    """``src[idx].astype(float32) * scale + shift`` in one fused pass.

    ``src`` is uint8 with any trailing shape; ``idx`` indexes dim 0.
    """
    src = np.ascontiguousarray(src, dtype=np.uint8)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    lib = _load()
    if lib is None:
        return (
            src[idx].astype(np.float32) * np.float32(scale) + np.float32(shift)
        )
    out = np.empty((len(idx),) + src.shape[1:], dtype=np.float32)
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gather_normalize_u8(
        src.ctypes.data, idx.ctypes.data, len(idx), row_elems,
        ctypes.c_float(scale), ctypes.c_float(shift), out.ctypes.data,
    )
    return out


def gather_rows(src: np.ndarray, idx) -> np.ndarray:
    """``src[idx]`` (dim-0 gather) as one memcpy pass, any dtype."""
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    lib = _load()
    if lib is None:
        return src[idx].copy()
    out = np.empty((len(idx),) + src.shape[1:], dtype=src.dtype)
    row_bytes = int(np.prod(src.shape[1:], dtype=np.int64)) * src.dtype.itemsize
    lib.gather_rows(src.ctypes.data, idx.ctypes.data, len(idx), row_bytes,
                    out.ctypes.data)
    return out


def normalize_u8(src: np.ndarray, scale: float, shift: float) -> np.ndarray:
    """Whole-array fused ``u8 -> f32 * scale + shift`` (dataset materialize)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return src.astype(np.float32) * np.float32(scale) + np.float32(shift)
    out = np.empty(src.shape, dtype=np.float32)
    lib.normalize_u8(src.ctypes.data, src.size, ctypes.c_float(scale),
                     ctypes.c_float(shift), out.ctypes.data)
    return out
