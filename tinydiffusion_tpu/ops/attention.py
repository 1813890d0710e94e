"""Pallas flash attention (unscaled) for the conv-VAE's spatial self-attention.

The reference computes dense ``softmax(Q K^T) V`` over H*W tokens in one bmm
(vae_laion.py:58-63). At its largest site (128x128 feature map -> N=16384
tokens) the N x N attention matrix is 1 GB fp32 *per image* — the memory hot
spot called out in SURVEY.md §5. This kernel computes the same math without
ever materializing N x N, using the online-softmax (flash) recursion blocked
over keys, with a custom VJP whose backward recomputes probabilities
blockwise from the saved row log-sum-exp.

Semantics parity: logits are **unscaled** (no 1/sqrt(d)), exactly like the
reference. Public shapes: q, k: (B, N, D); v: (B, N, C) -> out (B, N, C).

TPU layout note (why everything is transposed internally): Mosaic pads the
minor (lane) dimension of every VMEM buffer to 128 and the second-to-last
(sublane) to 8. The VAE's head dims are tiny (D = C/8 can be 4), so (N, D)
buffers would pad 4 -> 128 (32x) and a full-sequence K/V residency would
blow past the 16 MB VMEM budget — and (N, 1) lse columns would pad to
(N, 128). Internally ALL operands therefore live minor-dim-N: qt/kt
(B, D, N), vt (B, C, N), out (B, C, N), lse/delta (B, 1, N); the attention
tile is computed as s^T = (bk, bq). Zero relayouts, zero padding blowups.

Dispatch:
- small N or non-divisible block shapes -> dense einsum (XLA fuses this fine
  and autodiff is free);
- TPU + divisible N -> Pallas kernels;
- non-TPU backends run the same kernels in interpreter mode so tests cover
  the kernel logic on CPU.

Measured on TPU v5e at the big site (N=16384, D=4, C=32, B=4; fenced with
obs/profiling.force): fwd+bwd flash is ~17 ms (bf16x3 logits + the fused
single-kernel backward, round 3 — down from 62.5 ms at round 2's
HIGHEST-precision logits + two-kernel backward; dense fwd+bwd was 87.8 ms)
and avoids ~8 GB of stored N^2 softmax residuals, which is what makes
batch-4 256x256 conv-VAE training fit at all. Flash is therefore the
default above the dense threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_DENSE_N_THRESHOLD = 1024  # below this, dense attention is faster + simpler


def _dense(q, k, v):
    logits = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, b, dims, precision=None):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


# Logit matmuls run at bf16x3 precision (hand-rolled operand splitting —
# Mosaic only lowers DEFAULT and HIGHEST): the reference's logits are
# unscaled (magnitudes ~ +-10 even at D=4) and exp() turns a default
# single-pass-bf16 matmul's ~1e-2 absolute logit error into ~2%
# attention-weight error. Splitting each fp32 operand into a bf16 hi + lo
# part and summing the three cross products (hi*hi + hi*lo + lo*hi) reduces
# that to ~2^-22 relative — far below what exp can amplify into the outputs —
# at HALF the MXU passes of HIGHEST (bf16x6). At contraction depth D=4..16
# the logit dots are pure pass-count cost (each pass uses <=16/128 of the
# MXU's depth), so the 6->3 pass cut is a direct win at the N=16384 site.
# Value-side dots keep the default precision — their error is not
# exponentiated.
#
# When the INPUTS are already bf16 (compute_dtype='bfloat16' models, r5),
# the kernels skip the split entirely: a single bf16 x bf16 MXU pass with
# fp32 accumulation is exact for bf16 operands, so the fp32-input bf16x3
# machinery would cost 3x the passes for zero precision gain.
_HI = jax.lax.Precision.HIGHEST  # interpreter/CPU path only (tests)


def _dot3(a, b, dims):
    """fp32 dot via 3 single-pass bf16 MXU products (bf16x3, ~2^-22 rel err).

    Drops only the lo*lo term (~2^-32 relative). fp32 accumulation via
    preferred_element_type in _dot."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        _dot(a_hi, b_hi, dims)
        + _dot(a_hi, b_lo, dims)
        + _dot(a_lo, b_hi, dims)
    )


# ---------------------------------------------------------------------------
# Forward: grid (B, N // block_q). Full-sequence kt/vt stay resident in VMEM
# (largest site: N=16384, D=4, C=32 -> ~2.4 MB); the q block streams over key
# blocks with the online-softmax recursion, all tiles kept minor-dim-N.
# ---------------------------------------------------------------------------


def _fwd_kernel(qt_ref, kt_ref, vt_ref, ot_ref, lse_ref, *, block_k: int):
    # bf16 inputs (the compute_dtype='bfloat16' models): one MXU pass is
    # EXACT for the logit dot (bf16 x bf16 with fp32 accumulation), so the
    # bf16x3 split would pay 3x the passes for zero extra precision.
    bf16_in = qt_ref.dtype == jnp.bfloat16
    qt_raw = qt_ref[0]  # (D, bq), input dtype
    qt = qt_raw.astype(jnp.float32)
    n = kt_ref.shape[-1]
    bq = qt.shape[-1]
    c = vt_ref.shape[1]

    def body(j, carry):
        acc_t, m, l = carry  # (C, bq), (1, bq), (1, bq)
        kt_raw = kt_ref[0, :, pl.ds(j * block_k, block_k)]  # (D, bk)
        vt = vt_ref[0, :, pl.ds(j * block_k, block_k)].astype(jnp.float32)  # (C, bk)
        if bf16_in:
            s_t = _dot(kt_raw, qt_raw, ((0,), (0,)))  # (bk, bq), exact
        else:
            s_t = _dot3(kt_raw.astype(jnp.float32), qt, ((0,), (0,)))  # (bk, bq)
        m_new = jnp.maximum(m, jnp.max(s_t, axis=0, keepdims=True))
        p_t = jnp.exp(s_t - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p_t, axis=0, keepdims=True)
        acc_new = alpha * acc_t + _dot(vt, p_t, ((1,), (0,)))  # (C, bq)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((c, bq), jnp.float32)
    m0 = jnp.full((1, bq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc_t, m, l = jax.lax.fori_loop(0, n // block_k, body, (acc0, m0, l0))
    ot_ref[0] = (acc_t / l).astype(ot_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _fwd(qt, kt, vt, block_q: int, block_k: int):
    b, d, n = qt.shape
    c = vt.shape[1]
    grid = (b, n // block_q)
    out_t, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c, n), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, block_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, n), qt.dtype),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(qt, kt, vt)
    return out_t, lse


# ---------------------------------------------------------------------------
# Backward, ONE fused kernel. delta_i = sum_c dO_ic * O_ic (computed outside,
# cheap). p is recomputed blockwise as exp(s - lse).
#   dq_i = sum_j (p_ij * (dO_i v_j^T - delta_i)) k_j
#   dk_j = sum_i (p_ij * (dO_i v_j^T - delta_i))^T q_i
#   dv_j = sum_i p_ij^T dO_i
# All tiles transposed: s_t (bk, bq); lse/delta rows (1, bq).
#
# A split dq-kernel + dkv-kernel design (the textbook flash backward) visits
# every (i, j) tile pair TWICE, recomputing the logits s_t, the exp, and the
# dp_t dot both times — and at D=4..16 those recomputes ARE the cost (the
# N=16384 conv-VAE site is bound on exactly them, BASELINE.md). Fusing lets
# each tile pair be computed once: the kernel runs grid (b, key blocks),
# holds dk/dv accumulators for its key block, and accumulates the dq
# contribution of every (i, j) pair into a full-row (D, N) output that stays
# resident in VMEM across the key-block grid steps (its index map is
# constant along j, so Pallas never writes it back until the batch row
# changes; D<=16, so the resident row is <=1 MB even at N=16384).
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(
    qt_ref, kt_ref, vt_ref, dot_ref, lse_ref, delta_ref,
    dqt_ref, dkt_ref, dvt_ref, *, block_q
):
    bf16_in = qt_ref.dtype == jnp.bfloat16  # see _fwd_kernel
    kt_raw = kt_ref[0]  # (D, bk), input dtype
    kt = kt_raw.astype(jnp.float32)
    vt = vt_ref[0].astype(jnp.float32)  # (C, bk)
    n = qt_ref.shape[-1]
    d, bk = kt.shape
    c = vt.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _zero_dq():
        dqt_ref[0] = jnp.zeros_like(dqt_ref[0])

    def body(i, carry):
        dkt, dvt = carry
        qt_raw = qt_ref[0, :, pl.ds(i * block_q, block_q)]  # (D, bq)
        qt = qt_raw.astype(jnp.float32)
        dot_blk = dot_ref[0, :, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        lse = lse_ref[0, :, pl.ds(i * block_q, block_q)]  # (1, bq)
        delta = delta_ref[0, :, pl.ds(i * block_q, block_q)]  # (1, bq)
        if bf16_in:
            s_t = _dot(kt_raw, qt_raw, ((0,), (0,)))  # (bk, bq), exact
        else:
            s_t = _dot3(kt, qt, ((0,), (0,)))  # (bk, bq)
        p_t = jnp.exp(s_t - lse)
        dvt_new = dvt + _dot(dot_blk, p_t, ((1,), (1,)))  # (C, bk)
        dp_t = _dot(vt, dot_blk, ((0,), (0,)))  # (bk, bq)
        ds_t = p_t * (dp_t - delta)
        dkt_new = dkt + _dot(qt, ds_t, ((1,), (1,)))  # (D, bk)
        dq_i = _dot(kt, ds_t, ((1,), (0,)))  # (D, bq)
        cur = dqt_ref[0, :, pl.ds(i * block_q, block_q)]
        dqt_ref[0, :, pl.ds(i * block_q, block_q)] = (
            cur + dq_i.astype(dqt_ref.dtype)
        )
        return dkt_new, dvt_new

    dk0 = jnp.zeros((d, bk), jnp.float32)
    dv0 = jnp.zeros((c, bk), jnp.float32)
    dkt, dvt = jax.lax.fori_loop(0, n // block_q, body, (dk0, dv0))
    dkt_ref[0] = dkt.astype(dkt_ref.dtype)
    dvt_ref[0] = dvt.astype(dvt_ref.dtype)


def _bwd(block_q, block_k, residuals, g_t):
    qt, kt, vt, out_t, lse = residuals
    b, d, n = qt.shape
    c = vt.shape[1]
    delta = jnp.sum(
        g_t.astype(jnp.float32) * out_t.astype(jnp.float32), axis=1, keepdims=True
    )  # (B, 1, N)

    dqt, dkt, dvt = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, block_q=block_q),
        grid=(b, n // block_k),
        in_specs=[
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, block_k), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, c, block_k), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, c, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, block_k), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, c, block_k), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, n), qt.dtype),
            jax.ShapeDtypeStruct((b, d, n), kt.dtype),
            jax.ShapeDtypeStruct((b, c, n), vt.dtype),
        ],
        interpret=_use_interpret(),
    )(qt, kt, vt, g_t, lse, delta)
    return dqt, dkt, dvt


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_t(qt, kt, vt, block_q, block_k):
    out_t, _ = _fwd(qt, kt, vt, block_q, block_k)
    return out_t


def _flash_t_fwd(qt, kt, vt, block_q, block_k):
    out_t, lse = _fwd(qt, kt, vt, block_q, block_k)
    return out_t, (qt, kt, vt, out_t, lse)


_flash_t.defvjp(_flash_t_fwd, _bwd)


def _flash(q, k, v, block_q, block_k):
    """Public (B,N,*) layout -> transposed core -> (B,N,C) out."""
    qt = jnp.swapaxes(q, -1, -2)
    kt = jnp.swapaxes(k, -1, -2)
    vt = jnp.swapaxes(v, -1, -2)
    out_t = _flash_t(qt, kt, vt, block_q, block_k)
    return jnp.swapaxes(out_t, -1, -2)


def flash_attention_unscaled(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Unscaled softmax(q k^T) v without materializing the N x N matrix.

    Falls back to dense attention for small or block-misaligned N (the
    dense path is faster there and fully autodiff'd by XLA)."""
    n = q.shape[1]
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    if n <= _DENSE_N_THRESHOLD or n % block_q or n % block_k:
        return _dense(q, k, v)
    return _flash(q, k, v, block_q, block_k)


def _dense_t(qt, kt, vt):
    """Dense attention in the transposed (B, *, N) layout."""
    logits = jnp.einsum("bdn,bdm->bnm", qt, kt,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bcm->bcn", attn.astype(vt.dtype), vt,
                      preferred_element_type=jnp.float32).astype(vt.dtype)


def flash_attention_unscaled_t(
    qt: jnp.ndarray,
    kt: jnp.ndarray,
    vt: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """``flash_attention_unscaled`` taking/returning the kernel's NATIVE
    transposed layout: qt/kt (B, D, N), vt (B, C, N) -> (B, C, N).

    Callers that can produce q/k/v with N minor (SelfAttention2D projects
    from an (B, C, N) feature map directly) skip the four per-site
    (B, N, *) <-> (B, *, N) layout copies the (B, N, *) entry point pays —
    measured as the dominant residue of the conv-VAE 256^2 step
    (BASELINE.md, ~10 layout copies / 2.7 ms of a 29.5 ms device step)."""
    n = qt.shape[-1]
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    if n <= _DENSE_N_THRESHOLD or n % block_q or n % block_k:
        return _dense_t(qt, kt, vt)
    return _flash_t(qt, kt, vt, block_q, block_k)
