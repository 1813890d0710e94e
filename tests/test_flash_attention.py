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


def test_flash_bf16_inputs_match_fp32_dense():
    """bf16 q/k/v (the compute_dtype='bfloat16' models, r5): the kernel takes
    the single-pass logit path (exact for bf16 operands). Reference = dense
    attention on the SAME bf16-rounded operands upcast to fp32, so the
    tolerance measures only the kernel's own arithmetic, not the input
    rounding."""
    q, k, v = _rand(2, 256, 4, 32, seed=3)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    dense = _dense(*(x.astype(jnp.float32) for x in (qb, kb, vb)))
    flash = _flash(qb, kb, vb, 64, 128)
    assert flash.dtype == jnp.bfloat16
    # bf16 output rounding dominates: ~2^-8 relative.
    np.testing.assert_allclose(
        np.asarray(flash, np.float32), np.asarray(dense),
        atol=2e-2, rtol=2e-2,
    )


def test_flash_bf16_gradients_match_dense():
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in _rand(2, 256, 4, 16, seed=4))

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, 64, 128).astype(jnp.float32) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(
            _dense(q.astype(jnp.float32), k.astype(jnp.float32),
                   v.astype(jnp.float32)) ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(qb, kb, vb)
    for a, b in zip(gf, gd):
        assert a.dtype == jnp.bfloat16
        ref = np.asarray(b, np.float32)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), ref,
            atol=0.05 * np.abs(ref).max(), rtol=5e-2,
        )


def test_transposed_entry_point_matches_untransposed():
    """flash_attention_unscaled_t (the SelfAttention2D layout, r5) ==
    flash_attention_unscaled on the same logical operands — both the flash
    (N=2048 > dense threshold... interpret) and dense-fallback (N=256)
    branches."""
    from tinydiffusion_tpu.ops.attention import flash_attention_unscaled_t

    for n, bq, bk in [(256, 64, 128), (2048, 512, 1024)]:
        q, k, v = _rand(2, n, 4, 8, seed=5)
        ref = (flash_attention_unscaled(q, k, v, bq, bk)
               if n > 1024 else _dense(q, k, v))
        out_t = flash_attention_unscaled_t(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), bq, bk
        )
        np.testing.assert_allclose(
            np.asarray(out_t.swapaxes(1, 2)), np.asarray(ref),
            atol=2e-4, rtol=5e-4,
        )
