"""Profiling / tracing hooks — the observability the reference lacks
(SURVEY.md §5: no torch profiler, no timers; closest is torch.compile flags).

Two entry points:
- ``trace(dir)``: context manager around ``jax.profiler`` producing an
  XProf/Perfetto trace directory (open with xprof/tensorboard).
- ``time_fn(fn, *args, iters)``: honest steady-state wall timing with
  ``block_until_ready`` fencing — the harness bench.py builds on.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Capture a device trace: ``with trace('runs/profile'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force(out) -> None:
    """Force REAL completion of a computation.

    On this environment's axon backend, ``jax.block_until_ready`` returns
    before execution finishes (measured: a 4096^3 matmul chain "completed"
    at 21 PFLOP/s under block_until_ready vs an honest 67 TF/s when the
    result bytes are fetched). Fetching one leaf's first element to host is
    the only reliable completion fence — every timing in this repo must go
    through this helper.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3, **kwargs) -> dict:
    """Steady-state timing: returns mean/min ms over ``iters`` after warmup.

    Forces every iteration's result to host (see ``force``) so async
    runtimes cannot flatter the number.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        force(out)
        times.append(time.perf_counter() - t0)
    return {
        "mean_ms": sum(times) / len(times) * 1e3,
        "min_ms": min(times) * 1e3,
        "iters": iters,
    }
