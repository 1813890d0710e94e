"""Flash-vs-dense attention benchmark at the conv-VAE's real shapes.

Run on the TPU:  python tools/bench_attention.py
Shapes: the VAE's attention sites at image_size 256 —
(N=16384, D=4, C=32), (N=4096, D=8, C=64) — batch 4 (reference config).
Dense materializes the (B, N, N) matrix (1 GB fp32 per image at N=16384);
flash never does.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusion_tpu.ops.attention import _dense, _flash


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    results = {}
    for n, d, c in [(4096, 8, 64), (16384, 4, 32)]:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((4, n, c)), jnp.float32)

        flash_fwd = timed(jax.jit(lambda q, k, v: _flash(q, k, v, 512, 1024)), q, k, v)
        flash_bwd = timed(
            jax.jit(jax.grad(lambda q, k, v: jnp.sum(_flash(q, k, v, 512, 1024) ** 2),
                             argnums=(0, 1, 2))), q, k, v, iters=3)
        row = {"flash_fwd_ms": round(flash_fwd, 2), "flash_fwdbwd_ms": round(flash_bwd, 2)}
        try:
            dense_fwd = timed(jax.jit(_dense), q, k, v)
            row["dense_fwd_ms"] = round(dense_fwd, 2)
            dense_bwd = timed(
                jax.jit(jax.grad(lambda q, k, v: jnp.sum(_dense(q, k, v) ** 2),
                                 argnums=(0, 1, 2))), q, k, v, iters=3)
            row["dense_fwdbwd_ms"] = round(dense_bwd, 2)
        except Exception as e:
            row["dense"] = f"FAILED: {str(e)[:120]}"
        results[f"N={n},D={d},C={c},B=4"] = row
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
