"""Flash-vs-dense attention benchmark at the conv-VAE's real shapes.

Run on the TPU:  PYTHONPATH="$PYTHONPATH:." python tools/bench_attention.py

Timing methodology: the axon tunnel adds ~1 ms host RTT per dispatch and
appears to cache identical executions, so sub-millisecond kernels are timed
by looping ITERS times INSIDE one jitted program (a fori_loop whose carry
feeds the next iteration, preventing elision) and dividing the wall time.

Dense materializes the (B, N, N) matrix (1 GB fp32 per image at N=16384);
flash never does — expect dense to OOM or crawl at the large site.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusion_tpu.ops.attention import _dense, _flash

ITERS = 20


def timed_inner_loop(attn_fn, q, k, v):
    """Run attn ITERS times inside one program; each iteration's output
    perturbs the next query so nothing can be elided or cached."""

    @jax.jit
    def run(q, k, v):
        def body(_, carry):
            q_cur, acc = carry
            out = attn_fn(q_cur, k, v)
            # feed a tiny function of the output back into q: forces a true
            # sequential dependence at negligible extra cost
            q_next = q_cur + 1e-20 * out[..., : q_cur.shape[-1]]
            return q_next, acc + out[0, 0, 0]

        _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
        return acc

    # warmup/compile on one input; time on a DIFFERENT input (the axon
    # runtime serves repeated identical executions from a cache), and fetch
    # the scalar result to host — block_until_ready does not actually wait
    # on this backend (see obs/profiling.force).
    out = run(q, k, v)
    float(jax.device_get(out))
    q2 = q * 1.0001
    float(jax.device_get(q2[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(q2, k, v)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    results = {}
    for n, d, c in [(4096, 8, 64), (16384, 4, 32)]:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((4, n, c)), jnp.float32)

        row = {
            "flash_fwd_ms": round(
                timed_inner_loop(lambda q, k, v: _flash(q, k, v, 512, 1024), q, k, v), 3
            )
        }
        try:
            row["dense_fwd_ms"] = round(timed_inner_loop(_dense, q, k, v), 3)
        except Exception as e:
            row["dense_fwd"] = f"FAILED: {str(e)[:100]}"
        results[f"N={n},D={d},C={c},B=4"] = row
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
