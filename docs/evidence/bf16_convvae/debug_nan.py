import jax, jax.numpy as jnp, numpy as np, optax
from tinydiffusion_tpu.experiments.vae_laion import ConvVAETrainState
from tinydiffusion_tpu.models.vae_conv import ConvVAE, PerceptualNet, conv_vae_loss

S = 64
model = ConvVAE(latent_dim=32, input_channels=3, image_size=S,
                use_flash_attention=True, dtype=jnp.bfloat16)
perc = PerceptualNet(dtype=jnp.bfloat16)
perc_params = perc.init(jax.random.PRNGKey(123), jnp.zeros((1, S, S, 3)))["params"]
tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-4))
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)),
                       jax.random.PRNGKey(0), train=False)
state = ConvVAETrainState(
    step=jnp.zeros((), jnp.int32), params=variables["params"],
    batch_stats=variables.get("batch_stats", {}),
    opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(1))
xs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 4, S, S, 3)), jnp.float32)

@jax.jit
def step_probe(state, x):
    rng, z_key = jax.random.split(state.rng)
    def loss_fn(params):
        (recon, mu, logvar), mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, z_key, train=True, mutable=["batch_stats"])
        recon_img = recon.reshape(x.shape)
        rf = perc.apply({"params": perc_params}, recon_img)
        tf = perc.apply({"params": perc_params}, x)
        total, comps = conv_vae_loss(recon_img, x, mu, logvar, rf, tf, 1.0)
        comps["recon_min"] = jnp.min(recon_img)
        comps["recon_max"] = jnp.max(recon_img)
        return total, (mutated["batch_stats"], comps)
    (loss, (new_stats, comps)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    gnorm = optax.global_norm(grads)
    # per-top-level-module max |grad|
    gmax = {k: jnp.max(jnp.abs(jnp.concatenate([jnp.ravel(l) for l in jax.tree_util.tree_leaves(v)])))
            for k, v in grads.items()}
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    pbad = sum(jnp.sum(~jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(new_params))
    sbad = sum(jnp.sum(~jnp.isfinite(l.astype(jnp.float32))) for l in jax.tree_util.tree_leaves(new_stats))
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt, rng=rng)
    return new_state, loss, comps, gnorm, gmax, pbad, sbad

for i in range(8):
    state, loss, comps, gnorm, gmax, pbad, sbad = step_probe(state, xs[i])
    comps = {k: float(v) for k, v in comps.items()}
    gmax = {k: float(v) for k, v in gmax.items()}
    top = sorted(gmax.items(), key=lambda kv: -kv[1])[:4]
    print(f"step {i}: loss={float(loss):.1f} gnorm={float(gnorm):.3e} "
          f"pbad={int(pbad)} sbad={int(sbad)} comps={ {k: round(v,3) for k,v in comps.items()} } top_g={top}")
