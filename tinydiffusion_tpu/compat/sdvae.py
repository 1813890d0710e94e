"""JAX-native Stable Diffusion AutoencoderKL — the executable 'sd' codec seam.

The reference freezes diffusers' ``AutoencoderKL`` ("CompVis/stable-diffusion
-v1-4", subfolder="vae") and calls ``vae.encode(x).latent_dist.sample() *
scaling_factor`` / ``vae.decode(x / scaling_factor).sample``
(conditional_diffusion_laion.py:605-612, 460-461, 589). Round 1 wrapped the
torch model on the host, which cannot run inside the jitted train step
(np.asarray under trace) — and this environment has no diffusers package at
all. This module is the real fix: the AutoencoderKL architecture implemented
as pure jnp functions over a converted parameter pytree, so encode/decode
trace, jit, shard, and fuse like any other framework op.

Architecture (diffusers AutoencoderKL, SD v1.x config):
- Encoder: conv_in -> 4 DownEncoderBlock2D (2 ResnetBlock2D each; stride-2
  asym-padded downsample conv between blocks) -> mid (resnet, 1-head scaled
  attention, resnet) -> GroupNorm/SiLU/conv_out -> 1x1 quant_conv; moments
  split into (mean, logvar), logvar clamped to [-30, 20].
- Decoder: 1x1 post_quant_conv -> conv_in -> mid -> 4 UpDecoderBlock2D
  (3 resnets each; nearest-2x upsample + conv between blocks) ->
  GroupNorm/SiLU/conv_out.
- ResnetBlock2D: GN(32, eps 1e-6)/SiLU/conv3x3 twice + (1x1 shortcut when
  channels change).

Weight source: any diffusers-format state dict (``convert_diffusers_vae``
handles the OIHW->HWIO / (out,in)->(in,out) transposes). Offline, weights
are unreachable; the parity test feeds a randomly-initialized torch replica
with identical state_dict naming (tests/torch_sdvae_ref.py).

All feature maps are NHWC; math is fp32 by default (the frozen codec is a
small fraction of step time and latent fidelity feeds the DDPM SNR profile).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SD_SCALING_FACTOR = 0.18215

# SD v1.x VAE hyperparameters (diffusers config.json for CompVis/sd-v1-4 vae).
SD_VAE_CONFIG = {
    "block_out_channels": (128, 256, 512, 512),
    "layers_per_block": 2,
    "latent_channels": 4,
    "norm_num_groups": 32,
}


# --------------------------------------------------------------------------
# Converter: diffusers/torch state dict -> nested JAX param tree.
# --------------------------------------------------------------------------


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_diffusers_vae(state_dict) -> dict:
    """Nested param tree from a diffusers AutoencoderKL state dict.

    Conv kernels transpose OIHW -> HWIO, linear weights (out, in) -> (in,
    out); 1-D norm params pass through. Keys keep diffusers' names so the
    tree is self-documenting against the upstream checkpoint format.
    """
    tree: dict = {}
    for key, value in state_dict.items():
        arr = _to_np(value)
        if key.endswith(".weight"):
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif arr.ndim == 2:
                arr = arr.T  # (out, in) -> (in, out)
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


# --------------------------------------------------------------------------
# Pure-jnp building blocks (NHWC; params use diffusers leaf names).
# --------------------------------------------------------------------------


def _conv(x, p, stride: int = 1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"]


def _group_norm(x, p, groups: int, eps: float = 1e-6):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, groups, c // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, h, w, c) * p["weight"] + p["bias"]


def _resnet_block(x, p, groups: int):
    h = _group_norm(x, p["norm1"], groups)
    h = jax.nn.silu(h)
    h = _conv(h, p["conv1"])
    h = _group_norm(h, p["norm2"], groups)
    h = jax.nn.silu(h)
    h = _conv(h, p["conv2"])
    if "conv_shortcut" in p:
        x = _conv(x, p["conv_shortcut"], padding=0)
    return x + h


def _attn_block(x, p, groups: int):
    """Mid-block self-attention: 1 head over H*W tokens, scaled 1/sqrt(C)
    (diffusers Attention with heads=1 at the VAE bottleneck)."""
    b, h, w, c = x.shape
    y = _group_norm(x, p["group_norm"], groups).reshape(b, h * w, c)
    q = y @ p["to_q"]["weight"] + p["to_q"]["bias"]
    k = y @ p["to_k"]["weight"] + p["to_k"]["bias"]
    v = y @ p["to_v"]["weight"] + p["to_v"]["bias"]
    logits = jnp.einsum("bnc,bmc->bnm", q, k) / jnp.sqrt(jnp.asarray(c, q.dtype))
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnm,bmc->bnc", attn, v)
    out = out @ p["to_out"]["0"]["weight"] + p["to_out"]["0"]["bias"]
    return x + out.reshape(b, h, w, c)


def _mid_block(x, p, groups: int):
    x = _resnet_block(x, p["resnets"]["0"], groups)
    x = _attn_block(x, p["attentions"]["0"], groups)
    return _resnet_block(x, p["resnets"]["1"], groups)


def vae_encode_moments(params: dict, x: jnp.ndarray, config: dict = SD_VAE_CONFIG):
    """(B, H, W, 3) in [-1,1] -> moments (B, H/8, W/8, 2*latent_channels)."""
    groups = config["norm_num_groups"]
    n_blocks = len(config["block_out_channels"])
    enc = params["encoder"]
    h = _conv(x, enc["conv_in"])
    for i in range(n_blocks):
        block = enc["down_blocks"][str(i)]
        for j in range(config["layers_per_block"]):
            h = _resnet_block(h, block["resnets"][str(j)], groups)
        if i < n_blocks - 1:
            # Downsample2D pads asymmetrically (0,1,0,1) then 3x3 stride 2.
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv(h, block["downsamplers"]["0"]["conv"], stride=2, padding=0)
    h = _mid_block(h, enc["mid_block"], groups)
    h = _group_norm(h, enc["conv_norm_out"], groups)
    h = jax.nn.silu(h)
    h = _conv(h, enc["conv_out"])
    return _conv(h, params["quant_conv"], padding=0)


def vae_decode(params: dict, z: jnp.ndarray, config: dict = SD_VAE_CONFIG):
    """(B, h, w, latent_channels) unscaled latents -> (B, 8h, 8w, 3)."""
    groups = config["norm_num_groups"]
    n_blocks = len(config["block_out_channels"])
    dec = params["decoder"]
    h = _conv(z, params["post_quant_conv"], padding=0)
    h = _conv(h, dec["conv_in"])
    h = _mid_block(h, dec["mid_block"], groups)
    for i in range(n_blocks):
        block = dec["up_blocks"][str(i)]
        for j in range(config["layers_per_block"] + 1):
            h = _resnet_block(h, block["resnets"][str(j)], groups)
        if i < n_blocks - 1:
            # Upsample2D: nearest 2x then conv 3x3.
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = _conv(h, block["upsamplers"]["0"]["conv"])
    h = _group_norm(h, dec["conv_norm_out"], groups)
    h = jax.nn.silu(h)
    return _conv(h, dec["conv_out"])


def gaussian_sample(moments: jnp.ndarray, key: Optional[jax.Array]):
    """DiagonalGaussianDistribution semantics: split moments into
    (mean, logvar), clamp logvar to [-30, 20]; sample with ``key`` or return
    the mode when ``key`` is None."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


class SDVAEFlaxCodec:
    """Latent codec over converted AutoencoderKL weights — runs under jit.

    encode: images (B, H, W, 3) in [-1,1] -> scaled latents
    (B, H/8, W/8, 4); with ``key`` the latent is the reparameterized sample
    (the reference's ``latent_dist.sample()``), without it the mode.
    decode: scaled latents -> images in [-1,1] (caller applies the
    ``(x/2+0.5).clamp`` display transform, conditional_diffusion_laion.py:589-595).
    """

    def __init__(self, params: dict, config: dict = SD_VAE_CONFIG,
                 scaling_factor: float = SD_SCALING_FACTOR):
        self.params = params
        self.config = dict(config)
        self.scaling_factor = scaling_factor

    @classmethod
    def from_torch_state_dict(cls, state_dict, config: dict = SD_VAE_CONFIG,
                              scaling_factor: float = SD_SCALING_FACTOR):
        return cls(convert_diffusers_vae(state_dict), config, scaling_factor)

    @classmethod
    def from_pretrained(cls, model_name: str = "CompVis/stable-diffusion-v1-4"):
        """Reference path: needs diffusers + reachable weights; this
        environment has neither (documented substitute: LinearPatchCodec)."""
        from diffusers import AutoencoderKL  # type: ignore

        vae = AutoencoderKL.from_pretrained(model_name, subfolder="vae").eval()
        cfg = {
            "block_out_channels": tuple(vae.config.block_out_channels),
            "layers_per_block": int(vae.config.layers_per_block),
            "latent_channels": int(vae.config.latent_channels),
            "norm_num_groups": int(vae.config.norm_num_groups),
        }
        return cls.from_torch_state_dict(
            vae.state_dict(), cfg, float(vae.config.scaling_factor)
        )

    def encode(self, images: jnp.ndarray, key: Optional[jax.Array] = None):
        moments = vae_encode_moments(self.params, images, self.config)
        return gaussian_sample(moments, key) * self.scaling_factor

    def decode(self, latents: jnp.ndarray):
        return vae_decode(self.params, latents / self.scaling_factor, self.config)
