"""Latent image codec seam — parity with the reference's frozen SD-VAE usage.

Reference (conditional_diffusion_laion.py:605-612, 460-461, 589): frozen
Stable Diffusion v1.4 ``AutoencoderKL``; encode
``vae.encode(x).latent_dist.sample() * scaling_factor`` -> (B, 4, 32, 32)
latents from 256x256 images; decode ``vae.decode(x / scaling_factor).sample``.

Two executable codecs behind one seam (``encode(images, key=None)`` /
``decode(latents)``, both jit-traceable):

- ``SDVAEFlaxCodec`` (compat/sdvae.py): the real AutoencoderKL architecture
  as pure jnp over a converted diffusers-format state dict — the 'sd' path.
  Weights are unreachable offline (zero egress AND no diffusers package),
  but the code path is proven by a parity test against a randomly
  initialized torch replica (tests/test_pretrained_seams.py) and runs
  inside the jitted LAION train step.
- ``LinearPatchCodec``: the offline default — a fixed seeded orthonormal
  projection of 8x8x3 patches to 4 channels (decode = transpose, an exact
  pseudo-inverse on the projected subspace), with the SD scaling factor
  0.18215. Linear and deterministic — NOT a learned VAE — but preserves
  every contract the pipeline relies on: (B,32,32,4) latents, frozen
  weights, the scaling-factor dance, and an honest decode for sample
  visualization.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from tinydiffusion_tpu.compat.sdvae import SD_SCALING_FACTOR, SDVAEFlaxCodec

__all__ = ["LinearPatchCodec", "SDVAEFlaxCodec", "get_latent_codec",
           "SD_SCALING_FACTOR"]


class LinearPatchCodec:
    """Fixed orthonormal patch projection codec (see module docstring)."""

    def __init__(
        self,
        image_size: int = 256,
        latent_size: int = 32,
        latent_channels: int = 4,
        channels: int = 3,
        scaling_factor: float = SD_SCALING_FACTOR,
        seed: int = 7,
    ):
        assert image_size % latent_size == 0
        self.patch = image_size // latent_size
        self.image_size = image_size
        self.latent_size = latent_size
        self.latent_channels = latent_channels
        self.channels = channels
        self.scaling_factor = scaling_factor
        d = self.patch * self.patch * channels
        g = np.random.default_rng(seed).standard_normal((d, d))
        q, _ = np.linalg.qr(g)
        # Orthonormal columns: W^T W = I_k, so decode = W @ z reconstructs the
        # projected component exactly.
        self.w = jnp.asarray(q[:, :latent_channels], jnp.float32)  # (d, k)

    def _to_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        p, s = self.patch, self.latent_size
        x = x.reshape(b, s, p, s, p, self.channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, s, s, p, p, C)
        return x.reshape(b, s, s, p * p * self.channels)

    def _from_patches(self, patches: jnp.ndarray) -> jnp.ndarray:
        b = patches.shape[0]
        p, s = self.patch, self.latent_size
        x = patches.reshape(b, s, s, p, p, self.channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, s * p, s * p, self.channels)

    def encode(
        self, images: jnp.ndarray, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """(B, H, W, 3) in [-1,1] -> (B, 32, 32, 4) scaled latents.

        ``key`` is accepted for seam compatibility with the stochastic
        SD-VAE encode (latent_dist.sample()); this codec is deterministic."""
        del key
        patches = self._to_patches(images)
        z = jnp.einsum("bhwd,dk->bhwk", patches, self.w)
        return z * self.scaling_factor

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, 32, 32, 4) scaled latents -> (B, H, W, 3) approx in [-1,1]."""
        z = latents / self.scaling_factor
        patches = jnp.einsum("bhwk,dk->bhwd", z, self.w)
        return self._from_patches(patches)

    def calibrate(self, images: jnp.ndarray) -> float:
        """Set the scaling factor so latents are unit-variance over ``images``
        — the same reason SD's AutoencoderKL ships scaling_factor 0.18215:
        DDPM's noise schedule assumes x_0 at roughly unit scale, and badly
        scaled latents skew the effective SNR at every timestep."""
        import numpy as np

        z = self.encode(images) / self.scaling_factor  # unscaled latents
        std = float(np.asarray(z).std())
        self.scaling_factor = 1.0 / max(std, 1e-6)
        return self.scaling_factor


def get_latent_codec(name: str = "auto", image_size: int = 256):
    """'sd' | 'patch' | 'auto' (sd if loadable, else the patch substitute).

    The 'sd' path returns the JAX-native ``SDVAEFlaxCodec`` (converted
    AutoencoderKL weights, jit-traceable) — never a host-side torch wrapper."""
    if name == "patch":
        return LinearPatchCodec(image_size=image_size)
    if name == "sd":
        return SDVAEFlaxCodec.from_pretrained()
    try:
        return SDVAEFlaxCodec.from_pretrained()
    except Exception:
        import logging

        logging.getLogger("tinydiffusion.codec").warning(
            "SD-VAE weights unavailable (offline) — using LinearPatchCodec substitute"
        )
        return LinearPatchCodec(image_size=image_size)
