"""Numerical-safety utilities — structured replacements for the reference's
manual NaN guards (vae_laion.py:220-227 component prints,
conditional_diffusion_laion.py:591-598 NaN/Inf scrub).

- ``checked(fn)``: wrap a jitted function with ``jax.experimental.checkify``
  NaN/div checks; returns ``(err, out)`` and raises on host via
  ``err.throw()`` when ``strict``.
- ``scrub_nonfinite(x)``: the reference's sampler scrub — replace NaN/Inf
  with zeros (conditional_diffusion_laion.py:591-598).
- ``assert_all_finite(tree, name)``: host-side check for train loops/tests.

For hard debugging, ``JAX_DEBUG_NANS=1`` remains the environment-level tool.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked(fn: Callable, strict: bool = True) -> Callable:
    """checkify-wrap ``fn`` with float (NaN/Inf) and div checks."""
    checked_fn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        if strict:
            err.throw()
        return out

    return wrapper


def scrub_nonfinite(x: jnp.ndarray) -> jnp.ndarray:
    """Replace NaN/Inf with zeros (conditional_diffusion_laion.py:591-598)."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite check over a pytree (use in loops/tests, not in jit)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values in {name}{key}")
