"""MNIST MLP VAE — parity with reference vae.py:16-76.

Architecture: 784 -> 400 ReLU -> (mu: 400->20, logvar: 400->20);
reparameterize ``mu + eps * exp(0.5 * logvar)``; decoder 20 -> 400 ReLU ->
784 sigmoid. Loss = ``BCE(recon, (x+1)/2, sum) + KLD`` with
``KLD = -0.5 * sum(1 + logvar - mu^2 - exp(logvar))`` (vae.py:71-76).

Config defaults mirror ``VAEConfig`` (vae.py:16-26): latent 20, hidden 400,
batch 128, 100 epochs, lr 1e-3.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tinydiffusion_tpu.nn.layers import torch_bias_init, torch_kernel_init


@dataclasses.dataclass
class VAEConfig:
    """vae.py:16-26 defaults (device/checkpoint fields handled by the
    experiment layer, not the model)."""

    latent_dim: int = 20
    hidden_dim: int = 400
    input_dim: int = 784
    batch_size: int = 128
    epochs: int = 100
    learning_rate: float = 1e-3
    checkpoint_dir: str = "checkpoints"
    n_images_to_log: int = 8


class VAEMnist(nn.Module):
    latent_dim: int = 20
    hidden_dim: int = 400
    input_dim: int = 784
    dtype: Any = jnp.float32

    def setup(self):
        def dense(features, fan_in, name):
            return nn.Dense(
                features,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in),
                dtype=self.dtype,
                name=name,
            )

        self.fc1 = dense(self.hidden_dim, self.input_dim, "fc1")
        self.fc21 = dense(self.latent_dim, self.hidden_dim, "fc21")  # mean
        self.fc22 = dense(self.latent_dim, self.hidden_dim, "fc22")  # log-variance
        self.fc3 = dense(self.hidden_dim, self.latent_dim, "fc3")
        self.fc4 = dense(self.input_dim, self.hidden_dim, "fc4")

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.reshape(-1, self.input_dim)
        h1 = nn.relu(self.fc1(x))
        return self.fc21(h1), self.fc22(h1)

    def reparameterize(
        self, mu: jnp.ndarray, logvar: jnp.ndarray, key: jax.Array
    ) -> jnp.ndarray:
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, std.shape, dtype=std.dtype)
        return mu + eps * std

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h3 = nn.relu(self.fc3(z))
        return nn.sigmoid(self.fc4(h3))

    def __call__(self, x: jnp.ndarray, key: jax.Array):
        mu, logvar = self.encode(x)
        z = self.reparameterize(mu, logvar, key)
        return self.decode(z), mu, logvar


def vae_loss(
    recon_x: jnp.ndarray, x: jnp.ndarray, mu: jnp.ndarray, logvar: jnp.ndarray
) -> jnp.ndarray:
    """``BCE(recon, (x+1)/2, reduction="sum") + KLD`` (vae.py:71-76).

    The input x arrives normalized to [-1, 1]; the target is un-normalized
    back to [0, 1]. BCE clamps the log terms at -100 exactly like
    torch.binary_cross_entropy — an fp32 epsilon-clip on p is NOT a guard
    (1 - 1e-12 rounds back to exactly 1.0 and a saturated sigmoid emits
    exact 0/1 in fp32, so log1p(-p) would still hit -inf).
    """
    target = (x.reshape(recon_x.shape) + 1.0) / 2.0
    log_p = jnp.maximum(jnp.log(recon_x), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-recon_x), -100.0)
    bce = -jnp.sum(target * log_p + (1.0 - target) * log_1mp)
    kld = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar))
    return bce + kld
