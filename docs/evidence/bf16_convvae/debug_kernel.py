import jax, jax.numpy as jnp, numpy as np
from tinydiffusion_tpu.ops.attention import _flash_t, _fwd

b, d, c, n = 4, 4, 32, 4096
rng = np.random.default_rng(0)
qt32 = jnp.asarray(0.1 * rng.standard_normal((b, d, n)), jnp.float32)
kt32 = jnp.asarray(0.1 * rng.standard_normal((b, d, n)), jnp.float32)
vt32 = jnp.asarray(rng.standard_normal((b, c, n)), jnp.float32)

for name, dt in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
    qt, kt, vt = (x.astype(dt) for x in (qt32, kt32, vt32))
    try:
        out, lse = jax.jit(lambda a, b_, c_: _fwd(a, b_, c_, 512, 1024))(qt, kt, vt)
        print(name, "fwd OK", out.dtype, bool(jnp.all(jnp.isfinite(out.astype(jnp.float32)))))
    except Exception as e:
        print(name, "fwd FAIL:", repr(e)[:200])
