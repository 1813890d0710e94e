"""Latent-space MLP "UNet" denoiser — parity with latent_diffusion.py:16-128.

eps-predictor on the 20-d MNIST-VAE latent. Stem ``Linear(20, 512)``;
encoder double ``Linear+BatchNorm1d+ReLU`` blocks 512->256, 256->128,
128->64; bottleneck 64; time/class embedding as in the conditional UNet
(raw-t MLP + class embedding, added); time projections to 64/128/256.

Decoder quirk preserved (latent_diffusion.py:123-125): time is added to the
*decoder input* before concatenating the encoder skip —
``dec3(cat(b + t1, e3))``, ``dec2(cat(d3 + t2, e2))``,
``dec1(cat(d2 + t3, e1))`` — unlike the pixel UNets which add time to the
skip path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tinydiffusion_tpu.nn.layers import TimeEmbedMLP, torch_bias_init, torch_kernel_init


class _DenseBNRelu(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
            dtype=self.dtype,
            name="fc",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class _DoubleDenseBlock(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = _DenseBNRelu(self.hidden, dtype=self.dtype, name="block1")(x, train)
        x = _DenseBNRelu(self.out, dtype=self.dtype, name="block2")(x, train)
        return x


class MLPUNetLatent(nn.Module):
    """Class-conditional MLP UNet over VAE latents (latent_diffusion.py:16-128)."""

    time_dim: int = 256
    num_classes: int = 10
    latent_dim: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        x = x.astype(self.dtype)
        t_emb = TimeEmbedMLP(self.time_dim, dtype=self.dtype, name="time_embedding")(t)
        y_emb = nn.Embed(
            self.num_classes,
            self.time_dim,
            embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype,
            name="class_embedding",
        )(y)
        emb = t_emb + y_emb

        x0 = nn.Dense(
            512,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.latent_dim),
            dtype=self.dtype,
            name="initial_fc",
        )(x)

        e1 = _DoubleDenseBlock(512, 256, dtype=self.dtype, name="enc1")(x0, train)
        e2 = _DoubleDenseBlock(256, 128, dtype=self.dtype, name="enc2")(e1, train)
        e3 = _DoubleDenseBlock(128, 64, dtype=self.dtype, name="enc3")(e2, train)
        b = _DenseBNRelu(64, dtype=self.dtype, name="bottleneck")(e3, train)

        def proj(features, name):
            return nn.Dense(
                features,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(self.time_dim),
                dtype=self.dtype,
                name=name,
            )(emb)

        t1, t2, t3 = proj(64, "time_proj1"), proj(128, "time_proj2"), proj(256, "time_proj3")

        d3 = _DoubleDenseBlock(128, 128, dtype=self.dtype, name="dec3")(
            jnp.concatenate([b + t1, e3], axis=-1), train
        )
        d2 = _DoubleDenseBlock(256, 256, dtype=self.dtype, name="dec2")(
            jnp.concatenate([d3 + t2, e2], axis=-1), train
        )
        d1 = _DoubleDenseBlock(512, 512, dtype=self.dtype, name="dec1")(
            jnp.concatenate([d2 + t3, e1], axis=-1), train
        )
        out = nn.Dense(
            self.latent_dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(512),
            dtype=self.dtype,
            name="final_fc",
        )(d1)
        return out.astype(jnp.float32)
