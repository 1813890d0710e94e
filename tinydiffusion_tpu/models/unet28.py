"""Pixel-space UNet epsilon-predictor for 28x28 images.

Capability parity with the reference ``NoiseModel`` (diffusion.py:11-162)
and its class-conditional variant (conditional_diffusion.py:14-171):

- time embedding: raw integer timestep -> ``Linear(1,256)->SiLU->Linear``
  (diffusion.py:21-25, 111-113 — deliberately unnormalized, kept for parity);
- optional ``Embedding(num_classes, 256)`` added to the time embedding
  (conditional_diffusion.py:31, 115-125);
- stem ``Conv(1->64)``; encoder stages 128/256/512 of double
  conv+BN+ReLU with ceil-mode max-pool 28->14->7->4 (diffusion.py:32-59, 101);
- bottleneck single conv block at 512 (diffusion.py:62-64);
- time injected via 1x1 projections to 128/256/512 *added to the encoder
  skips* before each decoder stage (diffusion.py:105-107, 130-139);
- decoder: align-corners bilinear 2x upsample, skip resized align-corners to
  8/16/32, concat, double conv 256/128/64; final resize 32->28 and
  ``Conv(64->1)`` head (diffusion.py:68-98, 135-160).

TPU-native: NHWC layout, bfloat16-capable compute dtype, the align-corners
resizes are separable matmuls (see nn/resize.py) so every op in the forward
lands on MXU or fuses into it.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tinydiffusion_tpu.nn.layers import (
    ConvBNRelu,
    DoubleConvBlock,
    TimeEmbedMLP,
    torch_bias_init,
    torch_kernel_init,
)
from tinydiffusion_tpu.nn.resize import (
    max_pool_ceil,
    resize_bilinear_align_corners,
    upsample_bilinear_2x,
)


class UNet28(nn.Module):
    """UNet denoiser for (B, 28, 28, C) images; eps-prediction.

    ``num_classes=None`` -> unconditional (diffusion.py);
    ``num_classes=10``  -> class-conditional (conditional_diffusion.py).
    """

    time_dim: int = 256
    num_classes: int | None = None
    out_channels: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        w = self.base_width
        x = x.astype(self.dtype)

        # Conditioning vector: raw-t MLP (+ class embedding if conditional).
        emb = TimeEmbedMLP(self.time_dim, dtype=self.dtype, name="time_embedding")(t)
        if self.num_classes is not None:
            assert y is not None, "class-conditional model requires labels y"
            y_emb = nn.Embed(
                self.num_classes,
                self.time_dim,
                embedding_init=nn.initializers.normal(1.0),  # torch nn.Embedding: N(0,1)
                dtype=self.dtype,
                name="class_embedding",
            )(y)
            emb = emb + y_emb
        emb = emb[:, None, None, :]  # (B,1,1,time_dim) for spatial broadcast

        # Stem (B,28,28,C) -> (B,28,28,64).
        x0 = nn.Conv(
            w,
            (3, 3),
            padding=1,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1] * 9),
            dtype=self.dtype,
            name="initial_conv",
        )(x)

        # Encoder.
        e1 = DoubleConvBlock(2 * w, dtype=self.dtype, name="enc1")(x0, train)  # 28
        e2 = DoubleConvBlock(4 * w, dtype=self.dtype, name="enc2")(
            max_pool_ceil(e1), train
        )  # 14
        e3 = DoubleConvBlock(8 * w, dtype=self.dtype, name="enc3")(
            max_pool_ceil(e2), train
        )  # 7
        b = ConvBNRelu(8 * w, dtype=self.dtype, name="bottleneck")(
            max_pool_ceil(e3), train
        )  # 4

        # Time projections onto each skip (1x1 convs in the reference,
        # diffusion.py:105-107; Dense over the channel dim is the same map).
        def time_proj(features: int, name: str) -> jnp.ndarray:
            return nn.Dense(
                features,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(self.time_dim),
                dtype=self.dtype,
                name=name,
            )(emb)

        t1 = time_proj(2 * w, "time_proj1")
        t2 = time_proj(4 * w, "time_proj2")
        t3 = time_proj(8 * w, "time_proj3")

        # Decoder with align-corners size adjustments (28 is not a power of
        # two: 4->8 vs e3@7, 8->16 vs e2@14, 16->32 vs e1@28; diffusion.py:135-159).
        up_b = upsample_bilinear_2x(b)  # (B,8,8,512)
        e3_adj = resize_bilinear_align_corners(e3 + t3, (8, 8))
        d3 = DoubleConvBlock(4 * w, dtype=self.dtype, name="dec3")(
            jnp.concatenate([up_b, e3_adj], axis=-1), train
        )

        up_d3 = upsample_bilinear_2x(d3)  # (B,16,16,256)
        e2_adj = resize_bilinear_align_corners(e2 + t2, (16, 16))
        d2 = DoubleConvBlock(2 * w, dtype=self.dtype, name="dec2")(
            jnp.concatenate([up_d3, e2_adj], axis=-1), train
        )

        up_d2 = upsample_bilinear_2x(d2)  # (B,32,32,128)
        e1_adj = resize_bilinear_align_corners(e1 + t1, (32, 32))
        d1 = DoubleConvBlock(w, dtype=self.dtype, name="dec1")(
            jnp.concatenate([up_d2, e1_adj], axis=-1), train
        )

        d1 = resize_bilinear_align_corners(d1, (28, 28))
        out = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=1,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(w * 9),
            dtype=self.dtype,
            name="final_conv",
        )(d1)
        return out.astype(jnp.float32)
