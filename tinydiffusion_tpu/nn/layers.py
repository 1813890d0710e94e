"""Shared Flax building blocks with PyTorch-parity semantics.

Covers the blocks the reference duplicates across scripts:
- ``Conv3x3 + BatchNorm2d + ReLU`` (x2) encoder/decoder blocks
  (diffusion.py:32-95),
- the raw-timestep MLP embedding ``Linear(1,D) -> SiLU -> Linear(D,D)``
  (diffusion.py:21-25),
- torch-default initializers (kaiming_uniform(a=sqrt(5)) for kernels and
  U(+-1/sqrt(fan_in)) for biases) so training dynamics match the reference.

BatchNorm parity notes: torch's ``momentum=0.1`` means
``running = 0.9*running + 0.1*batch``; flax's ``momentum`` is the
running-stat coefficient, so we use 0.9. Torch updates running_var with the
unbiased batch variance while flax uses biased — irrelevant in eval mode
with imported stats, and a negligible (1/(N-1)) difference during training.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)) — torch's default for
# both Conv2d and Linear weights.
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    """torch default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvBNRelu(nn.Module):
    """``Conv2d(k=3, p=1) -> BatchNorm2d -> ReLU`` (diffusion.py:32-39)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        fan_in = x.shape[-1] * self.kernel_size * self.kernel_size
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class DoubleConvBlock(nn.Module):
    """Two stacked ConvBNRelu at the same width — one UNet stage
    (diffusion.py:32-59 encoder / 68-95 decoder)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ConvBNRelu(self.features, dtype=self.dtype, name="block1")(x, train)
        x = ConvBNRelu(self.features, dtype=self.dtype, name="block2")(x, train)
        return x


class TimeEmbedMLP(nn.Module):
    """``Linear(in, D) -> SiLU -> Linear(D, D)`` time embedding.

    With ``normalize=None`` this reproduces the reference's raw-integer
    embedding (diffusion.py:21-25, 111-113: the timestep enters as an
    unnormalized float scalar). ``normalize=1000`` gives the DiT variant
    (diffusion_transformer.py:87: ``t / 1000``).
    """

    dim: int
    normalize: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t = t.astype(self.dtype)[:, None]
        if self.normalize is not None:
            t = t / self.normalize
        h = nn.Dense(
            self.dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(1),
            dtype=self.dtype,
            name="fc1",
        )(t)
        h = nn.silu(h)
        h = nn.Dense(
            self.dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.dim),
            dtype=self.dtype,
            name="fc2",
        )(h)
        return h


class MLP(nn.Module):
    """Plain Dense stack with torch-default init (helper for VAE/latent nets)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    activate_final: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(x.shape[-1]),
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x
