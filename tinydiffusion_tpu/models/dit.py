"""Diffusion Transformer (DiT-style) denoiser — parity with
diffusion_transformer.py:16-109, generalized to token sequences.

Reference semantics preserved:
- ``TransformerBlock`` = MultiheadAttention (4 heads, attention dropout) with
  **post**-LayerNorm residuals: ``x = norm1(x + dropout(attn(x)))`` then
  ``x = norm2(x + ff(x))`` with GELU FF ``dim -> 4*dim -> dim`` + dropout
  (diffusion_transformer.py:16-35);
- timestep normalized ``t / 1000`` into the 2-layer SiLU MLP
  (diffusion_transformer.py:87);
- class embedding added to the time embedding, the sum added to the
  projected input token (diffusion_transformer.py:88-97);
- learned positional encoding parameter broadcast over tokens
  (diffusion_transformer.py:66, 99);
- head ``LayerNorm -> Linear(dim, latent_dim)`` (diffusion_transformer.py:77-79).

The reference feeds ONE token (its unsqueeze(0) with batch_first=False makes
sequence length 1, so self-attention degenerates to the value+output
projections — diffusion_transformer.py:99-106). This module runs on
``(B, S, D)`` token sequences with S=1 reproducing the reference exactly;
``num_tokens > 1`` generalizes to patchified latents (BASELINE.json north
star) with a per-token learned positional table.

TPU notes: attention/FF are pure matmuls (MXU); post-LN keeps everything
fusable; dropout uses the functional flax rng, off in eval (sampling) mode.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tinydiffusion_tpu.nn.layers import TimeEmbedMLP, torch_bias_init, torch_kernel_init


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim,
            out_features=self.dim,
            dropout_rate=self.dropout,  # attention-weight dropout, as torch MHA
            deterministic=not train,
            kernel_init=torch_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention",
        )(x, x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)

        h = nn.Dense(
            self.ff_dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.dim),
            dtype=self.dtype,
            name="ff1",
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.ff_dim),
            dtype=self.dtype,
            name="ff2",
        )(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)
        return x


class DiT(nn.Module):
    """Latent-space diffusion transformer (diffusion_transformer.py:38-109)."""

    time_dim: int = 256
    num_classes: int = 10
    latent_dim: int = 20
    num_heads: int = 4
    num_layers: int = 4
    dropout: float = 0.05
    num_tokens: int = 1  # reference: a single token (seq-len-1 attention)
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
        batch = x.shape[0]

        # t / 1000 then the 2-layer MLP (diffusion_transformer.py:87).
        emb = TimeEmbedMLP(
            self.time_dim, normalize=1000.0, dtype=self.dtype, name="time_embedding"
        )(t)
        y_emb = nn.Embed(
            self.num_classes,
            self.time_dim,
            embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype,
            name="class_embedding",
        )(y)
        emb = emb + y_emb  # (B, D)

        if x.ndim == 2:
            # (B, latent_dim) -> single token or evenly split into tokens.
            assert x.shape[-1] % self.num_tokens == 0
            x = x.reshape(batch, self.num_tokens, x.shape[-1] // self.num_tokens)
        tokens = nn.Dense(
            self.time_dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
            dtype=self.dtype,
            name="input_proj",
        )(x)  # (B, S, D)

        tokens = tokens + emb[:, None, :]  # conditioning added to every token
        pos = self.param(
            "pos_encoding",
            nn.initializers.normal(1.0),
            (1, self.num_tokens if self.num_tokens > 1 else 1, self.time_dim),
            self.dtype,
        )
        tokens = tokens + pos

        for i in range(self.num_layers):
            tokens = TransformerBlock(
                self.time_dim,
                self.num_heads,
                self.time_dim * 4,
                self.dropout,
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, train)

        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(tokens)
        out = nn.Dense(
            self.latent_dim // self.num_tokens,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.time_dim),
            dtype=self.dtype,
            name="final_proj",
        )(out)  # (B, S, latent_dim/S)
        return out.reshape(batch, self.latent_dim).astype(jnp.float32)
