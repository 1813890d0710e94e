"""Custom VJP for ceil-mode max-pool (round 4): the disjoint-window argmax
backward must produce gradients identical to both XLA's select-and-scatter
(the previous implementation) and torch's MaxPool2d — including on ties,
where all three route the full gradient to the FIRST max in (dy, dx)
row-major window order (reference usage: diffusion.py:101)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusion_tpu.nn.resize import _reduce_window_max, max_pool_ceil


def _grad_pair(x):
    """(custom VJP grad, select-and-scatter grad) for sum(pool(x)**2)."""
    def loss_fast(x):
        return jnp.sum(max_pool_ceil(x) ** 2)

    def loss_ref(x):
        return jnp.sum(_reduce_window_max(x, 2, 2) ** 2)

    return jax.grad(loss_fast)(x), jax.grad(loss_ref)(x)


@pytest.mark.parametrize("shape", [(2, 28, 28, 3), (2, 7, 7, 5), (1, 4, 6, 2)])
def test_grad_matches_select_and_scatter_random(shape):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.float32
    )
    g_fast, g_ref = _grad_pair(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=0, atol=0)


def test_grad_matches_on_ties():
    """Quantized input forces equal values inside windows; both backends
    must still route each window's gradient to the same single position."""
    x = jnp.asarray(
        np.random.default_rng(1).integers(0, 3, (2, 8, 8, 4)), jnp.float32
    )
    g_fast, g_ref = _grad_pair(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=0, atol=0)


def test_forward_unchanged():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 7, 9, 4)), jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool_ceil(x)), np.asarray(_reduce_window_max(x, 2, 2))
    )


def test_grad_matches_torch_on_ties():
    torch = pytest.importorskip("torch")
    x_np = np.random.default_rng(3).integers(0, 3, (2, 6, 7, 4)).astype(
        np.float32
    )

    xt = torch.tensor(
        x_np.transpose(0, 3, 1, 2), requires_grad=True
    )  # NCHW
    pool = torch.nn.MaxPool2d(2, 2, ceil_mode=True)
    (pool(xt) ** 2).sum().backward()
    g_torch = xt.grad.numpy().transpose(0, 2, 3, 1)

    g_fast = jax.grad(lambda x: jnp.sum(max_pool_ceil(x) ** 2))(
        jnp.asarray(x_np)
    )
    np.testing.assert_allclose(np.asarray(g_fast), g_torch, rtol=0, atol=0)
