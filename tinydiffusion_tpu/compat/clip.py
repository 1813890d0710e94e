"""JAX-native CLIP text encoder — the executable 'clip' conditioning seam.

The reference conditions the LAION diffusion on CLIP ViT-L/14 text
embeddings: tokenizer pads to model max length, and the per-prompt embedding
is ``last_hidden_state[:, -1, :]`` (LAST token only, 768-d, under no_grad —
conditional_diffusion_laion.py:207-219, 608-611). Round 1 wrapped the torch
model host-side; this module ports the text transformer to pure jnp over a
converted parameter pytree so the encoder runs jitted on TPU, and is parity
-tested against a randomly-initialized ``transformers.CLIPTextModel`` of the
same architecture (no network needed — tests/test_pretrained_seams.py).

Architecture (transformers CLIPTextModel): token + learned position
embeddings; N pre-LN transformer layers (multi-head attention with a causal
mask, quick-GELU MLP); final LayerNorm.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """Subset of transformers' CLIPTextConfig needed for the forward.

    Defaults are openai/clip-vit-large-patch14 (the reference's checkpoint).
    """

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_clip_text(state_dict) -> dict:
    """Nested param tree from a transformers CLIPTextModel state dict.

    Linear weights transpose (out, in) -> (in, out); embedding tables and
    norm params pass through. Keys keep transformers' names.
    """
    tree: dict = {}
    for key, value in state_dict.items():
        if key.startswith("text_model."):
            key = key[len("text_model."):]
        arr = _to_np(value)
        if (
            key.endswith(".weight")
            and arr.ndim == 2
            and "embedding" not in key
        ):
            arr = arr.T
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def _layer_norm(x, p, eps: float):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _linear(x, p):
    return x @ p["weight"] + p["bias"]


def _attention(x, p, n_heads: int, causal_mask):
    b, n, c = x.shape
    hd = c // n_heads
    scale = hd ** -0.5
    # transformers scales q before the matmul.
    q = (_linear(x, p["q_proj"]) * scale).reshape(b, n, n_heads, hd)
    k = _linear(x, p["k_proj"]).reshape(b, n, n_heads, hd)
    v = _linear(x, p["v_proj"]).reshape(b, n, n_heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) + causal_mask
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
    return _linear(out, p["out_proj"])


def _act(x, name: str):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


@partial(jax.jit, static_argnums=(2,))
def clip_text_forward(
    params: dict, input_ids: jnp.ndarray, config: CLIPTextConfig
) -> jnp.ndarray:
    """(B, N) int token ids -> last_hidden_state (B, N, hidden_size)."""
    b, n = input_ids.shape
    emb = params["embeddings"]
    x = (
        emb["token_embedding"]["weight"][input_ids]
        + emb["position_embedding"]["weight"][:n]
    )
    # Causal mask, additive (transformers uses dtype-min for masked slots).
    causal = jnp.triu(
        jnp.full((n, n), jnp.finfo(x.dtype).min, x.dtype), k=1
    )[None, None]
    eps = config.layer_norm_eps
    for i in range(config.num_hidden_layers):
        layer = params["encoder"]["layers"][str(i)]
        residual = x
        h = _layer_norm(x, layer["layer_norm1"], eps)
        x = residual + _attention(
            h, layer["self_attn"], config.num_attention_heads, causal
        )
        residual = x
        h = _layer_norm(x, layer["layer_norm2"], eps)
        h = _act(_linear(h, layer["mlp"]["fc1"]), config.hidden_act)
        x = residual + _linear(h, layer["mlp"]["fc2"])
    return _layer_norm(x, params["final_layer_norm"], eps)


class CLIPTextFlaxEncoder:
    """Drop-in for the text-encoder seam: ``encode(texts) -> (B, dim)``.

    Tokenization stays on host (it is string processing); the transformer
    runs as one jitted program; pooling is the reference's faithful
    last-token quirk (conditional_diffusion_laion.py:219).
    """

    def __init__(self, params: dict, tokenizer, config: CLIPTextConfig):
        self.params = params
        self.tokenizer = tokenizer
        self.config = config
        self.dim = config.hidden_size

    @classmethod
    def from_local(
        cls,
        weights_path: str,
        vocab_file: str,
        merges_file: str,
        config: "CLIPTextConfig" = None,
    ) -> "CLIPTextFlaxEncoder":
        """Fully offline construction: a torch-saved CLIPTextModel state
        dict + local tokenizer files (compat/clip_tokenizer.py) — no hub
        access anywhere on the path."""
        import torch

        from tinydiffusion_tpu.compat.clip_tokenizer import CLIPBPETokenizer

        state_dict = torch.load(weights_path, map_location="cpu",
                                weights_only=True)
        config = config or CLIPTextConfig()
        tokenizer = CLIPBPETokenizer.from_files(
            vocab_file, merges_file,
            model_max_length=config.max_position_embeddings,
        )
        return cls(convert_clip_text(state_dict), tokenizer, config)

    @classmethod
    def from_pretrained(cls, model_name: str = "openai/clip-vit-large-patch14"):
        """Reference path — needs reachable transformers weights + tokenizer
        files (zero egress here; substitute is HashTextEncoder)."""
        from transformers import CLIPTextModel, CLIPTokenizer

        model = CLIPTextModel.from_pretrained(model_name).eval()
        tokenizer = CLIPTokenizer.from_pretrained(model_name)
        mc = model.config
        config = CLIPTextConfig(
            vocab_size=mc.vocab_size,
            hidden_size=mc.hidden_size,
            intermediate_size=mc.intermediate_size,
            num_hidden_layers=mc.num_hidden_layers,
            num_attention_heads=mc.num_attention_heads,
            max_position_embeddings=mc.max_position_embeddings,
            layer_norm_eps=mc.layer_norm_eps,
            hidden_act=mc.hidden_act,
        )
        return cls(convert_clip_text(model.state_dict()), tokenizer, config)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        inputs = self.tokenizer(
            list(texts),
            padding="max_length",
            max_length=self.tokenizer.model_max_length,
            truncation=True,
            return_tensors="np",
        )
        hidden = clip_text_forward(
            self.params, jnp.asarray(inputs["input_ids"]), self.config
        )
        # LAST token only — faithful quirk (conditional_diffusion_laion.py:219).
        return np.asarray(hidden[:, -1, :], np.float32)
