"""MNIST VAE tests: shapes, loss parity vs torch formula, training smoke
(reference: vae.py:37-76)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.models.vae_mnist import VAEMnist, vae_loss


@pytest.fixture(scope="module")
def vae():
    model = VAEMnist()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 1)), jax.random.PRNGKey(1)
    )["params"]
    return model, params


def test_forward_shapes(vae):
    model, params = vae
    x = jnp.zeros((4, 28, 28, 1))
    recon, mu, logvar = model.apply({"params": params}, x, jax.random.PRNGKey(0))
    assert recon.shape == (4, 784)
    assert mu.shape == (4, 20) and logvar.shape == (4, 20)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid head


def test_encode_decode_roundtrip_shapes(vae):
    model, params = vae
    x = jnp.zeros((4, 28, 28, 1))
    mu, logvar = model.apply({"params": params}, x, method=VAEMnist.encode)
    z = model.apply(
        {"params": params}, mu, logvar, jax.random.PRNGKey(0),
        method=VAEMnist.reparameterize,
    )
    out = model.apply({"params": params}, z, method=VAEMnist.decode)
    assert out.shape == (4, 784)


def test_loss_matches_torch(vae):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (8, 784)).astype(np.float32)
    recon = rng.uniform(0.01, 0.99, (8, 784)).astype(np.float32)
    mu = rng.standard_normal((8, 20)).astype(np.float32)
    logvar = rng.standard_normal((8, 20)).astype(np.float32)

    ours = float(
        vae_loss(jnp.asarray(recon), jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar))
    )
    xt = torch.from_numpy(x)
    target = (xt + 1) / 2
    bce = F.binary_cross_entropy(torch.from_numpy(recon), target, reduction="sum")
    t_mu, t_lv = torch.from_numpy(mu), torch.from_numpy(logvar)
    kld = -0.5 * torch.sum(1 + t_lv - t_mu.pow(2) - t_lv.exp())
    theirs = float(bce + kld)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_vae_trains(vae):
    model, params = vae
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (16, 28, 28, 1)), jnp.float32
    )

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            recon, mu, logvar = model.apply({"params": p}, x, key)
            return vae_loss(recon, x, mu, logvar)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
