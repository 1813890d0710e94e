"""Timestep embeddings.

Three distinct conventions coexist in the reference and all are preserved:

1. **Raw integer MLP** (diffusion.py:21-25, 111-113): feed the raw timestep
   as a float scalar through ``Linear(1, D) -> SiLU -> Linear(D, D)`` with no
   normalization. Implemented by the models via ``nn.Dense`` on ``t[:, None]``.
2. **Normalized t/T MLP** (diffusion_transformer.py:87): same MLP but on
   ``t / num_timesteps``.
3. **Sinusoidal** (conditional_diffusion_laion.py:223-232): half sin / half
   cos with frequencies ``exp(-ln(10000) * i / (half - 1))`` and a zero pad
   for odd dims — implemented here as a pure function.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding matching conditional_diffusion_laion.py:223-232.

    Args:
      t: integer or float timesteps, shape ``[B]``.
      dim: embedding dimension.

    Returns:
      ``[B, dim]`` float32 embedding: ``concat(sin(t * f), cos(t * f))`` with
      ``f_i = exp(-ln(10000) * i / (half - 1))``, zero-padded if ``dim`` is odd.
    """
    half = dim // 2
    # Frequencies are static: compute host-side in float64 then cast, so the
    # table is both more accurate than a runtime fp32 exp and constant-folded
    # by XLA into the program.
    freqs = jnp.asarray(
        np.exp(-np.log(10000.0) * np.arange(half) / (half - 1)), dtype=jnp.float32
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
