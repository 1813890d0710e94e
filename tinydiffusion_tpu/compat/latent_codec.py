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
        # projected component exactly. ``calibrate`` replaces these random
        # directions with data PCA axes (much higher decode fidelity).
        self.w = jnp.asarray(q[:, :latent_channels], jnp.float32)  # (d, k)
        self.mean = jnp.zeros((d,), jnp.float32)
        # Per-channel scale (k,): uniform scaling_factor until calibrated,
        # then 1/sqrt(eigenvalue) whitening per latent channel.
        self.scale = jnp.full((latent_channels,), scaling_factor, jnp.float32)

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
        patches = self._to_patches(images) - self.mean
        z = jnp.einsum("bhwd,dk->bhwk", patches, self.w)
        return z * self.scale

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, 32, 32, 4) scaled latents -> (B, H, W, 3) approx in [-1,1]."""
        z = latents / self.scale
        patches = jnp.einsum("bhwk,dk->bhwd", z, self.w) + self.mean
        return self._from_patches(patches)

    def calibrate(self, images: jnp.ndarray) -> float:
        """Fit the frozen projection to data: patch-PCA axes + mean +
        per-channel whitening.

        Two jobs, mirroring why SD's AutoencoderKL works as a diffusion
        codec: (1) the projection keeps the HIGHEST-variance patch
        directions (random orthonormal axes keep an arbitrary 4/192 of
        patch energy — measured 0.52 L1 roundtrip error at 256^2, washing
        out every decoded sample; PCA axes keep per-patch mean color +
        dominant gradients), and (2) latents land exactly unit-variance
        per channel, the scale DDPM's noise schedule assumes (SD ships
        scaling_factor 0.18215 for the same reason). Stays a fixed frozen
        linear codec after this one fit. Returns the mean per-channel
        scale for logging."""
        import numpy as np

        patches = np.asarray(self._to_patches(jnp.asarray(images)), np.float64)
        flat = patches.reshape(-1, patches.shape[-1])  # (N, d)
        mean = flat.mean(axis=0)
        centered = flat - mean
        cov = centered.T @ centered / max(len(centered) - 1, 1)
        eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
        top = eigvecs[:, ::-1][:, : self.latent_channels]  # (d, k), descending
        var = eigvals[::-1][: self.latent_channels]
        self.mean = jnp.asarray(mean, jnp.float32)
        self.w = jnp.asarray(top, jnp.float32)
        self.scale = jnp.asarray(1.0 / np.sqrt(np.maximum(var, 1e-12)), jnp.float32)
        self.scaling_factor = float(np.mean(np.asarray(self.scale)))
        return self.scaling_factor

    def state_dict(self) -> dict:
        """The calibrated basis (w/mean/scale) as JSON-serializable lists.

        A denoiser trained on calibrated latents is only meaningful in THIS
        basis — persist it alongside the model checkpoint (the experiment
        stores it in the sidecar) and restore with ``load_state_dict``
        instead of re-fitting on whatever data the resuming run happens to
        see (the SD-VAE analog: its scaling_factor ships with the weights,
        conditional_diffusion_laion.py:605-612)."""
        return {
            "w": np.asarray(self.w).tolist(),
            "mean": np.asarray(self.mean).tolist(),
            "scale": np.asarray(self.scale).tolist(),
            "scaling_factor": self.scaling_factor,
        }

    def load_state_dict(self, d: dict) -> None:
        w = jnp.asarray(d["w"], jnp.float32)
        assert w.shape == self.w.shape, (
            f"codec basis shape {w.shape} != expected {self.w.shape} "
            "(checkpoint from a different image/latent geometry)"
        )
        self.w = w
        self.mean = jnp.asarray(d["mean"], jnp.float32)
        self.scale = jnp.asarray(d["scale"], jnp.float32)
        self.scaling_factor = float(d["scaling_factor"])


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
