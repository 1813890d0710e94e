"""Flash-attention kernel correctness vs the dense reference implementation
(both forward and gradients). Runs the Pallas kernels in interpreter mode on
the CPU test mesh; the same kernels compile natively on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusion_tpu.ops.attention import (
    _dense,
    _flash,
    flash_attention_unscaled,
)


def _rand(b, n, d, c, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n,d,c,bq,bk", [(256, 4, 32, 64, 128), (512, 8, 16, 128, 256)])
def test_flash_forward_matches_dense(n, d, c, bq, bk):
    q, k, v = _rand(2, n, d, c)
    dense = _dense(q, k, v)
    flash = _flash(q, k, v, bq, bk)
    # Logit dots run bf16x3 (hi/lo splitting, lo*lo dropped): ~4e-6 relative
    # logit error, amplified by exp into ~1e-4 on attention outputs.
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=2e-4, rtol=5e-4)


def test_flash_gradients_match_dense():
    q, k, v = _rand(1, 256, 4, 8, seed=1)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, 64, 64) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=f"d{name}"
        )


def test_dispatcher_small_n_uses_dense_and_matches():
    q, k, v = _rand(2, 64, 4, 8)
    out = flash_attention_unscaled(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(q, k, v)), atol=1e-5, rtol=1e-5
    )


def test_unscaled_semantics():
    """Logits must NOT be scaled by 1/sqrt(d) (vae_laion.py:58-63 parity)."""
    q, k, v = _rand(1, 64, 16, 8, seed=2)
    out = flash_attention_unscaled(q, k, v)
    logits = jnp.einsum("bnd,bmd->bnm", q, k)  # unscaled
    expected = jnp.einsum("bnm,bmc->bnc", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5)
