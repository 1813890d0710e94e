"""PyTorch state_dict -> Flax param-pytree converters.

The BASELINE.json acceptance criterion is: *given identical weights and noise
seeds, generated images match the PyTorch reference within numerical
tolerance*. These converters are the weight-import seam: they map a torch
``state_dict`` (as a ``{name: np.ndarray}`` dict — call ``.numpy()`` on the
tensors first, keeping everything here torch-free) onto our model layouts.

Layout rules:
- ``nn.Conv2d``:  OIHW  -> flax HWIO (transpose 2,3,1,0)
- ``nn.Linear``:  (out, in) -> flax (in, out) (transpose)
- 1x1 ``Conv2d`` used as a channel map (the reference's time_proj layers,
  diffusion.py:105-107) -> flax Dense (squeeze spatial, transpose)
- ``nn.BatchNorm``: weight/bias -> params.scale/bias; running_mean/var ->
  batch_stats.mean/var
- ``nn.Embedding``: direct copy
- ``nn.MultiheadAttention``: packed in_proj (3D, D) -> split q/k/v, each
  reshaped to flax's (D, heads, head_dim); out_proj -> (heads, head_dim, D).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(sd: Dict[str, np.ndarray], name: str) -> dict:
    return {
        "kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{name}.bias"],
    }


def _linear(sd: Dict[str, np.ndarray], name: str) -> dict:
    return {"kernel": np.transpose(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}


def _conv1x1_as_dense(sd: Dict[str, np.ndarray], name: str) -> dict:
    w = sd[f"{name}.weight"]  # (out, in, 1, 1)
    return {"kernel": np.transpose(w[:, :, 0, 0]), "bias": sd[f"{name}.bias"]}


def _bn(sd: Dict[str, np.ndarray], name: str) -> Tuple[dict, dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _time_mlp(sd: Dict[str, np.ndarray], name: str) -> dict:
    """torch Sequential(Linear, SiLU, Linear) -> TimeEmbedMLP {fc1, fc2}."""
    return {"fc1": _linear(sd, f"{name}.0"), "fc2": _linear(sd, f"{name}.2")}


def _double_conv_block(sd: Dict[str, np.ndarray], name: str):
    """torch Sequential(Conv, BN, ReLU, Conv, BN, ReLU) -> DoubleConvBlock."""
    p1, s1 = _bn(sd, f"{name}.1")
    p2, s2 = _bn(sd, f"{name}.4")
    params = {
        "block1": {"conv": _conv(sd, f"{name}.0"), "bn": p1},
        "block2": {"conv": _conv(sd, f"{name}.3"), "bn": p2},
    }
    stats = {"block1": {"bn": s1}, "block2": {"bn": s2}}
    return params, stats


def _double_dense_block(sd: Dict[str, np.ndarray], name: str):
    """torch Sequential(Linear, BN, ReLU, Linear, BN, ReLU) -> _DoubleDenseBlock."""
    p1, s1 = _bn(sd, f"{name}.1")
    p2, s2 = _bn(sd, f"{name}.4")
    params = {
        "block1": {"fc": _linear(sd, f"{name}.0"), "bn": p1},
        "block2": {"fc": _linear(sd, f"{name}.3"), "bn": p2},
    }
    stats = {"block1": {"bn": s1}, "block2": {"bn": s2}}
    return params, stats


def import_unet28(sd: Dict[str, np.ndarray], conditional: bool = False):
    """Reference NoiseModel (diffusion.py:11-162 / conditional_diffusion.py:14-171)
    -> UNet28 {params, batch_stats}."""
    params: dict = {"time_embedding": _time_mlp(sd, "time_embedding")}
    stats: dict = {}
    if conditional:
        params["class_embedding"] = {"embedding": sd["class_embedding.weight"]}
    params["initial_conv"] = _conv(sd, "initial_conv")
    for blk in ["enc1", "enc2", "enc3", "dec3", "dec2", "dec1"]:
        params[blk], stats[blk] = _double_conv_block(sd, blk)
    bp, bs = _bn(sd, "bottleneck.1")
    params["bottleneck"] = {"conv": _conv(sd, "bottleneck.0"), "bn": bp}
    stats["bottleneck"] = {"bn": bs}
    params["final_conv"] = _conv(sd, "final_conv")
    for i in (1, 2, 3):
        params[f"time_proj{i}"] = _conv1x1_as_dense(sd, f"time_proj{i}")
    return {"params": params, "batch_stats": stats}


def import_vae_mnist(sd: Dict[str, np.ndarray]):
    """Reference VAE (vae.py:37-67) -> VAEMnist params."""
    return {
        "params": {
            name: _linear(sd, name) for name in ["fc1", "fc21", "fc22", "fc3", "fc4"]
        }
    }


def import_mlp_unet(sd: Dict[str, np.ndarray]):
    """Reference latent NoiseModel (latent_diffusion.py:16-128) -> MLPUNetLatent."""
    params: dict = {
        "time_embedding": _time_mlp(sd, "time_embedding"),
        "class_embedding": {"embedding": sd["class_embedding.weight"]},
        "initial_fc": _linear(sd, "initial_fc"),
        "final_fc": _linear(sd, "final_fc"),
    }
    stats: dict = {}
    for blk in ["enc1", "enc2", "enc3", "dec3", "dec2", "dec1"]:
        params[blk], stats[blk] = _double_dense_block(sd, blk)
    bp, bs = _bn(sd, "bottleneck.1")
    params["bottleneck"] = {"fc": _linear(sd, "bottleneck.0"), "bn": bp}
    stats["bottleneck"] = {"bn": bs}
    for i, width in zip((1, 2, 3), (64, 128, 256)):
        params[f"time_proj{i}"] = _linear(sd, f"time_proj{i}")
    return {"params": params, "batch_stats": stats}


def _mha(sd: Dict[str, np.ndarray], name: str, num_heads: int) -> dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[f"{name}.in_proj_weight"]  # (3D, D)
    b = sd[f"{name}.in_proj_bias"]  # (3D,)
    d = w.shape[1]
    head_dim = d // num_heads
    out = {}
    for i, proj in enumerate(["query", "key", "value"]):
        wi = w[i * d : (i + 1) * d]  # (D, D), rows are outputs
        bi = b[i * d : (i + 1) * d]
        # flax kernel: (in, heads, head_dim)
        out[proj] = {
            "kernel": np.transpose(wi).reshape(d, num_heads, head_dim),
            "bias": bi.reshape(num_heads, head_dim),
        }
    wo = sd[f"{name}.out_proj.weight"]  # (D, D)
    out["out"] = {
        # flax out kernel: (heads, head_dim, D); torch: rows=outputs, cols=inputs
        "kernel": np.transpose(wo).reshape(num_heads, head_dim, d),
        "bias": sd[f"{name}.out_proj.bias"],
    }
    return out


def _layernorm(sd: Dict[str, np.ndarray], name: str) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def import_dit(sd: Dict[str, np.ndarray], num_layers: int = 4, num_heads: int = 4):
    """Reference DiT NoiseModel (diffusion_transformer.py:38-109) -> DiT params."""
    params: dict = {
        "time_embedding": _time_mlp(sd, "time_embedding"),
        "class_embedding": {"embedding": sd["class_embedding.weight"]},
        "input_proj": _linear(sd, "input_proj"),
        "pos_encoding": sd["pos_encoding"],
        "final_norm": _layernorm(sd, "final_layer.0"),
        "final_proj": _linear(sd, "final_layer.1"),
    }
    for i in range(num_layers):
        t = f"transformer_blocks.{i}"
        params[f"block{i}"] = {
            "attention": _mha(sd, f"{t}.attention", num_heads),
            "norm1": _layernorm(sd, f"{t}.norm1"),
            "norm2": _layernorm(sd, f"{t}.norm2"),
            "ff1": _linear(sd, f"{t}.ff.0"),
            "ff2": _linear(sd, f"{t}.ff.2"),
        }
    return {"params": params}
