import jax, jax.numpy as jnp, numpy as np, optax
from tinydiffusion_tpu.experiments.vae_laion import (
    VAELaionConfig, ConvVAETrainState, load_images)
from tinydiffusion_tpu.models.vae_conv import ConvVAE, PerceptualNet, conv_vae_loss
from tinydiffusion_tpu.io.checkpoint import restore_checkpoint

cfg = VAELaionConfig(n_records=128, image_size=128, checkpoint_dir="/tmp/v5/ckpt")
S = cfg.image_size

def build(dtype, use_flash):
    model = ConvVAE(latent_dim=cfg.latent_dim, input_channels=3, image_size=S,
                    use_flash_attention=use_flash, dtype=dtype)
    perc = PerceptualNet(dtype=dtype)
    return model, perc

model, perc = build(jnp.bfloat16, True)
perc_params = perc.init(jax.random.PRNGKey(123), jnp.zeros((1, S, S, 3)))["params"]
tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-4))
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)),
                       jax.random.PRNGKey(0), train=False)
state = ConvVAETrainState(
    step=jnp.zeros((), jnp.int32), params=variables["params"],
    batch_stats=variables.get("batch_stats", {}),
    opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(1))
state = restore_checkpoint("/tmp/v5/ckpt/vae_laion_best", state)
images = load_images(cfg)
x = jnp.asarray(images[max(len(images)//10,1):][:4].astype(np.float32) / 255.0)
key = jax.random.PRNGKey(9)

def loss_of(model, perc):
    def f(params, batch_stats, x, key):
        (recon, mu, logvar), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, key, train=True, mutable=["batch_stats"])
        rf = perc.apply({"params": perc_params}, recon.reshape(x.shape))
        tf = perc.apply({"params": perc_params}, x)
        total, comps = conv_vae_loss(recon.reshape(x.shape), x, mu, logvar, rf, tf, 1.0)
        return total, comps
    return f

f = loss_of(model, perc)
print("A jit fwd:", jax.tree.map(float, jax.jit(f)(state.params, state.batch_stats, x, key)[1]))
gB = jax.jit(jax.value_and_grad(f, has_aux=True))
(vB, cB), _ = gB(state.params, state.batch_stats, x, key)
print("B jit grad flash bf16:", float(vB), jax.tree.map(float, cB))
m2, p2 = build(jnp.bfloat16, False)
f2 = loss_of(m2, p2)
(v2, c2), _ = jax.jit(jax.value_and_grad(f2, has_aux=True))(state.params, state.batch_stats, x, key)
print("C jit grad dense bf16:", float(v2), jax.tree.map(float, c2))
m3, p3 = build(jnp.float32, True)
f3 = loss_of(m3, p3)
(v3, c3), _ = jax.jit(jax.value_and_grad(f3, has_aux=True))(state.params, state.batch_stats, x, key)
print("D jit grad flash fp32:", float(v3), jax.tree.map(float, c3))
