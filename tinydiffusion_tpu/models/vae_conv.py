"""Conv beta-VAE with self-attention + spectral norm — parity with
vae_laion.py:50-230.

Components (reference lines):
- ``SelfAttention`` (50-65): 1x1-conv q (C->C/8), k (C->C/8), v (C->C);
  **unscaled** ``softmax(Q K^T)``; learnable scalar ``gamma`` init 0;
  ``out = gamma * attn V + x``. At 128x128 resolution this is dense
  attention over H*W = 16,384 tokens — the memory hot spot (SURVEY.md §5),
  served by the Pallas flash-attention kernel (ops/attention.py) on TPU with
  a plain-einsum fallback.
- ``ResidualBlock`` (69-85): two spectral-normed bias-free 3x3 convs + BN,
  additive residual.
- Encoder (95-130): 4 stride-2 spectral-normed 4x4 convs 3->32->64->128->256
  with a ResBlock each and SelfAttention after stages 1-2;
  ``fc_mu``/``fc_logvar``: Linear(256*(S/16)^2, latent).
- Decoder (133-168): Linear(latent, 256*(S/16)^2) then 4 spectral-normed
  stride-2 transposed convs 256->128->64->32->3 with ResBlocks and
  SelfAttention after stages 1-2, final sigmoid.
- Loss (205-230): ``BCE(sum) + 0.1 * perceptual_MSE(sum) + beta * KLD``.
  The reference's perceptual net is a frozen pretrained VGG16 ``features[:16]``
  (170-176) — unavailable offline, so the default here is a structurally
  identical frozen conv stack with deterministic random weights (documented
  substitute; the loss plumbing, freezing, and scaling are identical).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tinydiffusion_tpu.nn.layers import torch_bias_init, torch_kernel_init


@dataclasses.dataclass
class ConvVAEConfig:
    """vae_laion.py:25-40 defaults."""

    latent_dim: int = 128
    hidden_channels: int = 64
    input_channels: int = 3
    image_size: int = 256
    batch_size: int = 4
    epochs: int = 100
    learning_rate: float = 1e-4
    checkpoint_dir: str = "checkpoints"
    image_cache_dir: str = "data/laion"
    failed_urls_cache: str = "data/failed_urls.json"
    n_images_to_log: int = 8
    log_interval: int = 10
    beta: float = 1.0


def _dense_attention(qt: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray) -> jnp.ndarray:
    """Unscaled dense attention over tokens: softmax(q k^T) v, in the
    transposed layout — qt, kt: (B, D, N); vt: (B, C, N) -> (B, C, N).

    Matches vae_laion.py:58-63 exactly (no 1/sqrt(d) scaling).
    Logits/softmax run fp32 even for bf16 inputs — the logits are UNSCALED
    (magnitudes ~ +-10) and exp() amplifies bf16 logit error into ~% -level
    attention-weight error (same rationale as the flash kernel's fp32 logit
    accumulation, ops/attention.py)."""
    logits = jnp.einsum("bdn,bdm->bnm", qt, kt,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bcm->bcn", attn.astype(vt.dtype), vt,
                      preferred_element_type=jnp.float32).astype(vt.dtype)


class _Proj1x1T(nn.Module):
    """1x1 projection applied to a TRANSPOSED (B, C, N) feature map,
    emitting (B, F, N) — numerically the same dot as ``nn.Conv(F, (1, 1))``
    on NHWC, with identical param names/shapes (kernel (1, 1, C, F), bias
    (F,)), but its output is already in the attention kernel's native
    minor-dim-N layout, so no per-operand transpose is needed."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt: jnp.ndarray) -> jnp.ndarray:
        c = xt.shape[1]
        kernel = self.param(
            "kernel", torch_kernel_init, (1, 1, c, self.features)
        )
        bias = self.param("bias", torch_bias_init(c), (self.features,))
        w = kernel.reshape(c, self.features).astype(self.dtype)
        out = jnp.einsum("cf,bcn->bfn", w, xt.astype(self.dtype))
        return out + bias.astype(self.dtype)[:, None]


class SelfAttention2D(nn.Module):
    """vae_laion.py:50-65 on NHWC feature maps.

    TPU layout note: the whole block runs in the transposed (B, *, N)
    layout — ONE transpose of the input feature map in, one transpose of
    the attention output back out. Projecting q/k/v in (B, N, *) and
    transposing each operand for the minor-dim-N flash kernel cost 4
    layout copies per site (x2 with their VJPs), the conv-VAE step's
    dominant non-MXU residue (BASELINE.md)."""

    use_flash: bool = True  # Pallas kernel on TPU when shapes allow
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        d = max(c // 8, 1)
        xt = x.reshape(b, h * w, c).swapaxes(1, 2)  # (B, C, N) — one copy

        qt = _Proj1x1T(d, dtype=self.dtype, name="query")(xt)
        kt = _Proj1x1T(d, dtype=self.dtype, name="key")(xt)
        vt = _Proj1x1T(c, dtype=self.dtype, name="value")(xt)

        attn_t = None
        if self.use_flash:
            try:
                from tinydiffusion_tpu.ops.attention import (
                    flash_attention_unscaled_t,
                )

                attn_t = flash_attention_unscaled_t(qt, kt, vt)
            except Exception:
                attn_t = None  # fall back to dense einsum path
        if attn_t is None:
            attn_t = _dense_attention(qt, kt, vt)

        attn_out = attn_t.swapaxes(1, 2).reshape(b, h, w, c)  # one copy back
        # The PARAM stays fp32 (like every other param under bf16 compute);
        # only the multiply runs in the compute dtype.
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * attn_out + x


class ResidualBlockSN(nn.Module):
    """vae_laion.py:69-85: SN conv -> BN -> ReLU -> SN conv -> BN, + residual."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        residual = x
        h = nn.SpectralNorm(
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                kernel_init=torch_kernel_init, dtype=self.dtype, name="conv1",
            )
        )(x, update_stats=train)
        # use_fast_variance=False: the fast path's var = E[x^2] - E[x]^2
        # cancels catastrophically on near-constant channels (bf16-rounded
        # activations make these common after ~20 train steps) and can go
        # slightly NEGATIVE -> rsqrt(var + eps) = NaN, fusion-order
        # dependent (measured r5: eager fwd finite, jit fwd NaN, jit grad
        # finite, same state/batch/key). The two-pass E[(x-mean)^2] is
        # non-negative by construction — and is what torch's batch_norm
        # computes, so this is also the closer-parity choice.
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_fast_variance=False, dtype=self.dtype, name="bn1",
        )(h)
        h = nn.relu(h)
        h = nn.SpectralNorm(
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                kernel_init=torch_kernel_init, dtype=self.dtype, name="conv2",
            )
        )(h, update_stats=train)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_fast_variance=False, dtype=self.dtype, name="bn2",
        )(h)
        return h + residual


class PerceptualNet(nn.Module):
    """Frozen feature extractor for the perceptual loss.

    Structure mirrors VGG16 ``features[:16]`` (conv1_1..conv3_3 + 2 pools,
    vae_laion.py:170-176): 3x3 convs 64,64 | pool | 128,128 | pool | 256,256,256.
    Weights are deterministic random (seeded by flax init) and NEVER trained —
    a documented offline substitute for the pretrained VGG16, preserving the
    loss structure, freezing, and scale.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        widths = [(64, 64), (128, 128), (256, 256, 256)]
        h = x
        for stage, ws in enumerate(widths):
            for i, f in enumerate(ws):
                h = nn.Conv(
                    f, (3, 3), padding=1,
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype, name=f"conv{stage}_{i}",
                )(h)
                h = nn.relu(h)
            if stage < 2:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return h


class ConvVAE(nn.Module):
    """vae_laion.py:88-168 (encoder/decoder; loss in ``conv_vae_loss``)."""

    latent_dim: int = 128
    input_channels: int = 3
    image_size: int = 256
    use_flash_attention: bool = True
    dtype: Any = jnp.float32

    @property
    def _spatial(self) -> int:
        return self.image_size // 16

    def setup(self):
        widths = [32, 64, 128, 256]
        self.enc_convs = [
            nn.SpectralNorm(
                nn.Conv(
                    w, (4, 4), strides=(2, 2), padding=1,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init((self.input_channels if i == 0 else widths[i - 1]) * 16),
                    dtype=self.dtype, name=f"enc_conv{i}",
                )
            )
            for i, w in enumerate(widths)
        ]
        self.enc_res = [
            ResidualBlockSN(w, dtype=self.dtype, name=f"enc_res{i}")
            for i, w in enumerate(widths)
        ]
        self.enc_attn = [
            SelfAttention2D(
                use_flash=self.use_flash_attention, dtype=self.dtype, name=f"enc_attn{i}"
            )
            for i in range(2)  # after stages 1-2 only (vae_laion.py:100-113)
        ]
        flat = 256 * self._spatial * self._spatial
        self.fc_mu = nn.Dense(
            self.latent_dim, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(flat), name="fc_mu",
        )
        self.fc_logvar = nn.Dense(
            self.latent_dim, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(flat), name="fc_logvar",
        )
        self.decoder_input = nn.Dense(
            flat, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.latent_dim), name="decoder_input",
        )
        dec_widths = [128, 64, 32, self.input_channels]
        self.dec_convs = [
            nn.SpectralNorm(
                nn.ConvTranspose(
                    w, (4, 4), strides=(2, 2), padding="SAME",
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init((256 if i == 0 else dec_widths[i - 1]) * 16),
                    dtype=self.dtype, name=f"dec_conv{i}",
                )
            )
            for i, w in enumerate(dec_widths)
        ]
        self.dec_res = [
            ResidualBlockSN(w, dtype=self.dtype, name=f"dec_res{i}")
            for i, w in enumerate(dec_widths[:3])
        ]
        self.dec_attn = [
            SelfAttention2D(
                use_flash=self.use_flash_attention, dtype=self.dtype, name=f"dec_attn{i}"
            )
            for i in range(2)  # after stages 1-2 (vae_laion.py:134-150)
        ]

    def encode(self, x: jnp.ndarray, train: bool = True):
        h = x.astype(self.dtype)
        for i in range(4):
            h = self.enc_convs[i](h, update_stats=train)
            h = nn.relu(h)
            h = self.enc_res[i](h, train)
            if i < 2:
                h = self.enc_attn[i](h)
        h = h.reshape(h.shape[0], -1)
        # The reference leaves logvar unbounded and NaNs out mid-training at
        # the full 256x256 recipe (its own NaN-component print at
        # vae_laion.py:220-227 is the tell). Clamp like SD's AutoencoderKL
        # DiagonalGaussianDistribution, but at +10 instead of SD's +20:
        # instrumented 256^2 runs show logvar transiently WALKING TO the +20
        # bound (KLD spikes to ~2e8 and the eval path, which decodes a
        # z ~ mu + e^10 * eps sample, overflows to Inf). Healthy logvar here
        # is <= ~1.5, so +10 (std e^5) is still far out of the signal range
        # while keeping the blow-up decodable. No-op for torch-parity tests.
        return self.fc_mu(h), jnp.clip(self.fc_logvar(h), -30.0, 10.0)

    def reparameterize(self, mu, logvar, key):
        std = jnp.exp(0.5 * logvar)
        return mu + jax.random.normal(key, std.shape, std.dtype) * std

    def decode(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        s = self._spatial
        h = self.decoder_input(z).reshape(-1, s, s, 256).astype(self.dtype)
        for i in range(4):
            h = self.dec_convs[i](h, update_stats=train)
            if i < 3:
                h = nn.relu(h)
                h = self.dec_res[i](h, train)
                if i < 2:
                    h = self.dec_attn[i](h)
        return nn.sigmoid(h.astype(jnp.float32))

    def __call__(self, x: jnp.ndarray, key: jax.Array, train: bool = True):
        mu, logvar = self.encode(x, train)
        z = self.reparameterize(mu, logvar, key)
        return self.decode(z, train), mu, logvar


def conv_vae_loss(
    recon_x: jnp.ndarray,
    x: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    recon_features: jnp.ndarray,
    target_features: jnp.ndarray,
    beta: float = 1.0,
) -> Tuple[jnp.ndarray, dict]:
    """vae_laion.py:205-230: BCE(sum) + 0.1*perceptual MSE(sum) + beta*KLD.

    Returns (total, components) — the components replace the reference's
    host-side NaN print (220-227) with structured metrics the caller can
    check and log.
    """
    # The loss is ALWAYS accumulated in fp32 regardless of the model's
    # compute dtype: these are sums over up to 256*64*64 elements, and a
    # bf16 accumulation would lose ~3 decimal digits (the model under
    # compute_dtype='bfloat16' hands bf16 mu/logvar/features here; the
    # converts fuse into the producing ops).
    x = x.astype(jnp.float32)
    recon_x = recon_x.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    recon_features = recon_features.astype(jnp.float32)
    target_features = target_features.astype(jnp.float32)
    # torch F.binary_cross_entropy clamps the log terms at -100 (its
    # documented "log(0) = -inf" guard) — an fp32 epsilon-clip on p does NOT
    # work (1 - 1e-12 rounds back to exactly 1.0, and a saturated sigmoid
    # really does emit exact 0/1 in fp32), so clamp the logs like torch.
    log_p = jnp.maximum(jnp.log(recon_x), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-recon_x), -100.0)
    bce = -jnp.sum(x * log_p + (1.0 - x) * log_1mp)
    perc = jnp.sum((recon_features - target_features) ** 2)
    kld = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar))
    total = bce + 0.1 * perc + beta * kld
    # logvar_max / mu_absmax ride along as cheap on-device reductions: the
    # 256x256 recipe shows episodic latent blow-ups BETWEEN log points
    # (huge-but-finite train batches, Inf eval) and these pin down which
    # term walked off without any extra host sync.
    return total, {
        "bce": bce, "perceptual": perc, "kld": kld,
        "logvar_max": jnp.max(logvar), "mu_absmax": jnp.max(jnp.abs(mu)),
    }
