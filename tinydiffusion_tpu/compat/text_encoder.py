"""Text conditioning — parity with the reference's CLIP usage plus an
offline substitute.

Reference (conditional_diffusion_laion.py:207-219, 608-611): CLIP ViT-L/14
tokenizer + text encoder; the per-prompt embedding is
``last_hidden_state[:, -1, :]`` — the LAST token only, 768-d, computed under
no_grad.

This environment has zero egress and no HF cache, so the default encoder is
a deterministic hash-based substitute: each whitespace token maps to a fixed
seeded Gaussian vector (md5 of the token seeds the RNG), and the text
embedding is ``normalize(mean(token_vecs) + 0.5 * last_token_vec)`` — texts
sharing words get nearby embeddings and the last token is emphasized to echo
the reference's last-token pooling. It is a documented SUBSTITUTE, not CLIP:
swap in ``name="clip"`` when the pretrained weights are reachable; every
consumer goes through the same ``encode(texts) -> (B, dim) float32`` seam.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np


class HashTextEncoder:
    """Deterministic offline text embedder (see module docstring)."""

    def __init__(self, dim: int = 768):
        self.dim = dim
        self._cache: dict = {}

    def _token_vec(self, token: str) -> np.ndarray:
        if token not in self._cache:
            seed = int.from_bytes(
                hashlib.md5(token.encode("utf-8")).digest()[:8], "little"
            )
            self._cache[token] = np.random.default_rng(seed).standard_normal(
                self.dim
            ).astype(np.float32)
        return self._cache[token]

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            tokens = text.lower().split() or ["<empty>"]
            vecs = np.stack([self._token_vec(t) for t in tokens])
            emb = vecs.mean(0) + 0.5 * vecs[-1]  # last-token emphasis
            out[i] = emb / max(np.linalg.norm(emb) / np.sqrt(self.dim), 1e-6)
        return out


def get_text_encoder(name: str = "auto", dim: int = 768,
                     clip_local_dir: str = ""):
    """'clip' | 'hash' | 'auto' (clip if loadable, else hash substitute).

    The 'clip' path returns the JAX-native ``CLIPTextFlaxEncoder``
    (compat/clip.py: converted CLIP-L weights, jitted forward, last-token
    pooling) — parity-tested against transformers' CLIPTextModel. With
    ``clip_local_dir`` (containing ``clip_text.pth``, ``vocab.json``,
    ``merges.txt``) construction is fully offline, tokenizer included
    (compat/clip_tokenizer.py)."""
    import os

    from tinydiffusion_tpu.compat.clip import CLIPTextFlaxEncoder

    if name == "hash":
        return HashTextEncoder(dim)
    if clip_local_dir and name in ("clip", "auto"):
        return CLIPTextFlaxEncoder.from_local(
            os.path.join(clip_local_dir, "clip_text.pth"),
            os.path.join(clip_local_dir, "vocab.json"),
            os.path.join(clip_local_dir, "merges.txt"),
        )
    if name == "clip":
        return CLIPTextFlaxEncoder.from_pretrained()
    try:
        return CLIPTextFlaxEncoder.from_pretrained()
    except Exception:
        import logging

        logging.getLogger("tinydiffusion.text").warning(
            "CLIP weights unavailable (offline) — using deterministic hash "
            "text-encoder substitute"
        )
        return HashTextEncoder(dim)
