"""Conv beta-VAE tests (vae_laion.py:50-230 parity surface): shapes, loss
composition, spectral-norm/BN stat updates, attention contribution,
train-ability at a small image size."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.models.vae_conv import (
    ConvVAE,
    PerceptualNet,
    SelfAttention2D,
    conv_vae_loss,
)

SIZE = 32  # image_size//16 = 2 spatial at the bottleneck; CPU-friendly


@pytest.fixture(scope="module")
def vae():
    model = ConvVAE(latent_dim=16, image_size=SIZE, use_flash_attention=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, SIZE, SIZE, 3)), jax.random.PRNGKey(1),
        train=False,
    )
    return model, variables


@pytest.mark.heavy  # 40s+ module fixture (256-channel init on 1-core CPU) — r5
def test_encode_decode_shapes(vae):
    model, variables = vae
    x = jnp.zeros((2, SIZE, SIZE, 3))
    recon, mu, logvar = model.apply(
        variables, x, jax.random.PRNGKey(0), train=False
    )
    assert recon.shape == (2, SIZE, SIZE, 3)
    assert mu.shape == (2, 16) and logvar.shape == (2, 16)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0


@pytest.mark.heavy
def test_spectral_norm_and_bn_stats_update(vae):
    model, variables = vae
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, SIZE, SIZE, 3)), jnp.float32)
    _, mutated = model.apply(
        variables, x, jax.random.PRNGKey(0), train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = sum(
        int(not np.allclose(np.asarray(a), np.asarray(b))) for a, b in zip(before, after)
    )
    assert changed > 0  # power-iteration u vectors and BN stats moved


def test_attention_gamma_starts_at_zero():
    """gamma init 0 => attention output == input at init (vae_laion.py:64-65)."""
    attn = SelfAttention2D(use_flash=False)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 16)), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_loss_composition():
    rng = np.random.default_rng(0)
    recon = jnp.asarray(rng.uniform(0.01, 0.99, (2, 8, 8, 3)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    logvar = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    rf = jnp.asarray(rng.standard_normal((2, 2, 2, 8)), jnp.float32)
    tf = jnp.asarray(rng.standard_normal((2, 2, 2, 8)), jnp.float32)
    total, comp = conv_vae_loss(recon, x, mu, logvar, rf, tf, beta=2.0)
    # BCE(sum) + 0.1*perc(sum) + beta*KLD (vae_laion.py:205-230)
    np.testing.assert_allclose(
        float(total),
        float(comp["bce"] + 0.1 * comp["perceptual"] + 2.0 * comp["kld"]),
        rtol=1e-6,
    )
    assert float(comp["kld"]) > 0 or abs(float(comp["kld"])) < 100


@pytest.mark.slow
def test_conv_vae_trains(vae):
    model, variables = vae
    perceptual = PerceptualNet()
    perc_params = perceptual.init(jax.random.PRNGKey(9), jnp.zeros((1, SIZE, SIZE, 3)))[
        "params"
    ]
    tx = optax.adam(1e-3)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, SIZE, SIZE, 3)), jnp.float32)

    @jax.jit
    def step(params, stats, opt_state, key):
        def loss_fn(p):
            (recon, mu, logvar), mut = model.apply(
                {"params": p, "batch_stats": stats}, x, key, train=True,
                mutable=["batch_stats"],
            )
            rf = perceptual.apply({"params": perc_params}, recon)
            tf = perceptual.apply({"params": perc_params}, x)
            total, _ = conv_vae_loss(recon, x, mu, logvar, rf, tf)
            return total, mut["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats2, opt2, loss

    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, k = jax.random.split(key)
        params, stats, opt_state, loss = step(params, stats, opt_state, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.heavy
def test_logvar_clamped_at_extreme_inputs(vae):
    """Round-2 stabilization: the reference's unbounded logvar NaNs out
    mid-training at the 256x256 recipe; encode must clamp to [-30, 10]
    (the SD AutoencoderKL convention, tightened at the top end after
    instrumented runs showed logvar walking to +20 and the eval decode of
    z ~ mu + e^10*eps overflowing) so exp(logvar) stays tame."""
    model, variables = vae
    x = jnp.full((2, SIZE, SIZE, 3), 1e6, jnp.float32)
    mu, logvar = model.apply(variables, x, train=False, method=ConvVAE.encode)
    assert float(logvar.max()) <= 10.0
    assert float(logvar.min()) >= -30.0
    assert np.isfinite(np.asarray(jnp.exp(logvar))).all()


@pytest.mark.heavy
def test_conv_vae_bf16_compute_trains():
    """compute_dtype='bfloat16' (the r5 shipped config): params/loss stay
    fp32, activations run bf16; two train steps produce finite decreasing
    loss and fp32 gradients/params throughout."""
    import optax

    from tinydiffusion_tpu.experiments.vae_laion import (
        ConvVAETrainState,
        make_conv_vae_train_step,
    )
    from tinydiffusion_tpu.models.vae_conv import PerceptualNet

    model = ConvVAE(latent_dim=16, image_size=SIZE, use_flash_attention=False,
                    dtype=jnp.bfloat16)
    perc = PerceptualNet(dtype=jnp.bfloat16)
    perc_params = perc.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, SIZE, SIZE, 3)),
                           jax.random.PRNGKey(0), train=False)
    # every param leaf must be fp32 (bf16 is compute-only)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32, leaf.dtype
    tx = optax.adam(1e-3)
    state = ConvVAETrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(2),
    )
    step = make_conv_vae_train_step(model, perc, perc_params, tx, beta=1.0)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 0.9, (4, SIZE, SIZE, 3)),
        jnp.float32,
    )
    losses = []
    for _ in range(3):
        state, loss, components = step(state, x)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # loss is an fp32 accumulation even under bf16 compute
    assert loss.dtype == jnp.float32
    assert losses[-1] < losses[0], losses
