"""Text-conditional latent UNet — parity with conditional_diffusion_laion.py:223-332.

eps-predictor on SD-VAE-style latents (4 x 32 x 32), time_dim 768:
- **sinusoidal** timestep embedding -> 2-layer SiLU MLP
  (conditional_diffusion_laion.py:223-232, 239-243);
- conditioning ``emb = t_emb + text_embeds`` (309) — the text embedding is a
  768-d vector per sample (CLIP last-token in the reference, 216-219);
- UNet channels 4->32->64->128->256 with plain ``MaxPool2d(2)`` (302):
  32->16->8->4 are powers of two so there are NO resize hacks;
- time injected via 1x1 projections added to the skips; decoder concat
  widths 512/384/192 (276-297); head ``Conv2d(64, 4, 3)`` (298);
- upsampling is align-corners bilinear 2x (303).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tinydiffusion_tpu.core.embeddings import sinusoidal_time_embedding
from tinydiffusion_tpu.nn.layers import (
    ConvBNRelu,
    DoubleConvBlock,
    torch_bias_init,
    torch_kernel_init,
)
from tinydiffusion_tpu.nn.resize import max_pool_ceil, upsample_bilinear_2x


class LatentUNet(nn.Module):
    """Context-conditioned latent UNet (B, H, W, C_latent) -> eps."""

    time_dim: int = 768
    in_channels: int = 4
    base_width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        w = self.base_width
        x = x.astype(self.dtype)

        t_emb_sin = sinusoidal_time_embedding(t, self.time_dim).astype(self.dtype)
        h = nn.Dense(
            self.time_dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.time_dim),
            dtype=self.dtype,
            name="time_mlp_fc1",
        )(t_emb_sin)
        h = nn.silu(h)
        t_emb = nn.Dense(
            self.time_dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.time_dim),
            dtype=self.dtype,
            name="time_mlp_fc2",
        )(h)
        emb = (t_emb + context.astype(self.dtype))[:, None, None, :]  # (B,1,1,768)

        x0 = nn.Conv(
            w, (3, 3), padding=1,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.in_channels * 9),
            dtype=self.dtype, name="initial_conv",
        )(x)

        e1 = DoubleConvBlock(2 * w, dtype=self.dtype, name="enc1")(x0, train)  # 32
        e2 = DoubleConvBlock(4 * w, dtype=self.dtype, name="enc2")(
            max_pool_ceil(e1), train
        )  # 16
        e3 = DoubleConvBlock(8 * w, dtype=self.dtype, name="enc3")(
            max_pool_ceil(e2), train
        )  # 8
        b = ConvBNRelu(8 * w, dtype=self.dtype, name="bottleneck")(
            max_pool_ceil(e3), train
        )  # 4

        def proj(features, name):
            return nn.Dense(
                features,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(self.time_dim),
                dtype=self.dtype,
                name=name,
            )(emb)

        t1, t2, t3 = proj(2 * w, "time_proj1"), proj(4 * w, "time_proj2"), proj(
            8 * w, "time_proj3"
        )

        d3 = DoubleConvBlock(8 * w, dtype=self.dtype, name="dec3")(
            jnp.concatenate([upsample_bilinear_2x(b), e3 + t3], axis=-1), train
        )
        d2 = DoubleConvBlock(4 * w, dtype=self.dtype, name="dec2")(
            jnp.concatenate([upsample_bilinear_2x(d3), e2 + t2], axis=-1), train
        )
        d1 = DoubleConvBlock(2 * w, dtype=self.dtype, name="dec1")(
            jnp.concatenate([upsample_bilinear_2x(d2), e1 + t1], axis=-1), train
        )
        out = nn.Conv(
            self.in_channels, (3, 3), padding=1,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(2 * w * 9),
            dtype=self.dtype, name="final_conv",
        )(d1)
        return out.astype(jnp.float32)
