import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

x32 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 64)), jnp.float32)

def reshape_max(h):
    b, hh, ww, c = h.shape
    return jnp.max(h.reshape(b, hh // 2, 2, ww // 2, 2, c), axis=(2, 4))

for name, dt in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
    x = x32.astype(dt)
    f = jax.jit(lambda a: jnp.sum(nn.max_pool(a, (2, 2), strides=(2, 2)).astype(jnp.float32)))
    g = jax.jit(lambda a: jnp.sum(reshape_max(a).astype(jnp.float32)))
    try:
        print(name, "max_pool sum:", float(f(x)))
    except Exception as e:
        print(name, "max_pool FAIL:", repr(e)[:150])
    try:
        print(name, "reshape_max sum:", float(g(x)))
    except Exception as e:
        print(name, "reshape_max FAIL:", repr(e)[:150])

# and fused with a conv producer like PerceptualNet does
class Mini(nn.Module):
    dtype: object = jnp.bfloat16
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)(h)
        return jnp.sum(h.astype(jnp.float32) ** 2)

for name, dt in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
    m = Mini(dtype=dt)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    xin = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    try:
        v = jax.jit(lambda p, xin: m.apply(p, xin))(p, xin)
        print(name, "conv+pool+conv:", float(v))
    except Exception as e:
        print(name, "conv+pool+conv FAIL:", repr(e)[:150])
