"""Offline CLIP BPE tokenizer parity vs transformers.CLIPTokenizer.

The oracle is the REAL ``transformers.CLIPTokenizer`` constructed from
LOCALLY-written vocab/merges files (its constructor takes file paths — no
network), so the full string→ids→embedding path of the 'clip' seam executes
end-to-end: reference usage at
/root/reference/conditional_diffusion_laion.py:209-218, 608-611.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tinydiffusion_tpu.compat.clip_tokenizer import (
    BOS_TOKEN,
    EOS_TOKEN,
    CLIPBPETokenizer,
    byte_to_unicode,
)

# Merges chosen to exercise multi-round merging, word-final </w> merges,
# mid-word merges, and the contraction pattern ('s as its own regex token).
TINY_MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "n"),
    ("an", "d</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("o", "n</w>"),
    ("'", "s</w>"),
    ("s", "i"),
    ("si", "t"),
    ("sit", "s</w>"),
    ("7", "</w>"),
    ("th", "e"),
]


def _build_vocab():
    symbols = list(byte_to_unicode().values())
    tokens = symbols + [s + "</w>" for s in symbols]
    for a, b in TINY_MERGES:
        merged = a + b
        if merged not in tokens:
            tokens.append(merged)
    tokens += [BOS_TOKEN, EOS_TOKEN]
    return {tok: i for i, tok in enumerate(tokens)}


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliptok")
    vocab_file = str(d / "vocab.json")
    merges_file = str(d / "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(_build_vocab(), f, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in TINY_MERGES:
            f.write(f"{a} {b}\n")
    return vocab_file, merges_file


@pytest.fixture(scope="module")
def oracle(tok_files):
    from transformers import CLIPTokenizer

    return CLIPTokenizer(*tok_files, model_max_length=77)


@pytest.fixture(scope="module")
def ours(tok_files):
    return CLIPBPETokenizer.from_files(*tok_files)


PROMPTS = [
    "The cat sits on the mat",
    "The CAT'S    hat!!",                      # case, contraction, repeat ws
    "a photo of 7 cats and 9 dogs",            # digits tokenized singly
    "café naïve résumé",   # accents kept (no stripping)
    "猫 sits　here",                   # CJK spacing + ideographic ws
    "rocket \U0001f680 to the moon",           # 4-byte utf-8
    "tabs\tand\nnewlines\r mixed",
    "  leading and trailing   ",
    "punct-only !?#@ tokens...",
    "",                                        # empty -> just bos+eos
    "word " * 120,                             # > 77 tokens -> truncation
    "ing the thing clothes",                   # mid-word th/the merges
]


def test_tokenize_parity(oracle, ours):
    for text in PROMPTS:
        assert ours.tokenize(text) == oracle.tokenize(text), repr(text)


def test_call_parity_padded_truncated(oracle, ours):
    ref = oracle(
        PROMPTS, padding="max_length", max_length=oracle.model_max_length,
        truncation=True, return_tensors="np",
    )
    got = ours(PROMPTS)
    np.testing.assert_array_equal(got["input_ids"], ref["input_ids"])
    np.testing.assert_array_equal(
        got["attention_mask"], ref["attention_mask"]
    )
    # Framing: bos first, eos terminates, eos-padding after.
    assert got["input_ids"][0, 0] == ours.bos_token_id
    assert got["input_ids"].shape == (len(PROMPTS), 77)


def test_decode_roundtrip(ours):
    ids = ours.encode("the cat sits on the mat")
    assert ours.decode(ids) == "the cat sits on the mat"


@pytest.mark.heavy
def test_encoder_string_to_embedding_end_to_end(oracle, ours, tok_files):
    """Drives CLIPTextFlaxEncoder.encode — strings in, (B, dim) out — against
    the reference's exact torch pipeline (tokenize, forward, last-token pool:
    conditional_diffusion_laion.py:209-219)."""
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    from tinydiffusion_tpu.compat.clip import (
        CLIPTextConfig,
        CLIPTextFlaxEncoder,
        convert_clip_text,
    )

    arch = dict(
        vocab_size=len(_build_vocab()),
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=77,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(HFCLIPTextConfig(**arch)).eval()

    texts = PROMPTS[:6]
    inputs = oracle(
        texts, padding="max_length", max_length=77, truncation=True,
        return_tensors="pt",
    )
    with torch.no_grad():
        ref = hf(inputs.input_ids).last_hidden_state[:, -1, :].numpy()

    cfg = CLIPTextConfig(
        **arch,
        layer_norm_eps=hf.config.layer_norm_eps,
        hidden_act=hf.config.hidden_act,
    )
    encoder = CLIPTextFlaxEncoder(convert_clip_text(hf.state_dict()), ours, cfg)
    got = encoder.encode(texts)
    assert got.shape == ref.shape == (len(texts), 32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
