"""Offline CLIP byte-level BPE tokenizer — closes the string→ids half of the
'clip' conditioning seam.

The reference tokenizes prompts with ``transformers.CLIPTokenizer``
(/root/reference/conditional_diffusion_laion.py:213-218, 608-611):
byte-level BPE over a 49152-256-2+1-merge table, word-final ``</w>`` marker,
``<|startoftext|> ids <|endoftext|>`` framing, padded to the 77-token model
max length with the eos token. ``CLIPTokenizer.from_pretrained`` needs the
hub (zero egress here), but the algorithm needs only the two data files —
this module implements it standalone so ``CLIPBPETokenizer.from_files(
vocab.json, merges.txt)`` makes the whole string→embedding path executable
the moment the files are placed on disk.

Text cleanup mirrors transformers' CLIPTokenizer exactly, including its
environment split: with ``ftfy`` importable it fixes mojibake then collapses
whitespace and lowercases; without it (this image) it runs the
BERT-BasicTokenizer-style pass — control-char removal, CJK spacing, NFC
normalization, whitespace split + lowercase, NO accent stripping, NO
punctuation splitting. Parity is asserted token-for-token against a
``transformers.CLIPTokenizer`` constructed from local files
(tests/test_clip_tokenizer.py).
"""

from __future__ import annotations

import json
import unicodedata
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np

BOS_TOKEN = "<|startoftext|>"
EOS_TOKEN = "<|endoftext|>"


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """The GPT-2/CLIP reversible byte→printable-unicode table.

    Printable latin/latin-1 bytes map to themselves; the rest are displaced
    up past U+0100 so no BPE symbol is whitespace or a control character.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {}
    offset = 0
    for b in range(256):
        if b in keep:
            table[b] = chr(b)
        else:
            table[b] = chr(256 + offset)
            offset += 1
    return table


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _basic_clean(text: str) -> str:
    """transformers' no-ftfy path: BasicTokenizer(strip_accents=False,
    do_split_on_punc=False) then rejoin with single spaces."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        out.append(" " if _is_whitespace(ch) else ch)
    text = "".join(out)
    text = "".join(
        f" {ch} " if _is_cjk(ord(ch)) else ch for ch in text
    )
    text = unicodedata.normalize("NFC", text)
    return " ".join(tok.lower() for tok in text.split())


def _ftfy_clean(text: str, fix_text) -> str:
    """transformers' ftfy path: fix_text + whitespace collapse + lower."""
    import re as _re

    return _re.sub(r"\s+", " ", fix_text(text)).strip().lower()


class CLIPBPETokenizer:
    """CLIP's byte-level BPE from local ``vocab.json`` + ``merges.txt``.

    The calling surface is the subset of ``transformers.CLIPTokenizer`` the
    reference uses: ``tokenizer(texts, padding="max_length",
    max_length=tokenizer.model_max_length, truncation=True)`` returning
    ``input_ids`` and ``attention_mask`` (conditional_diffusion_laion.py:
    209-218).
    """

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: Sequence[Tuple[str, str]],
        model_max_length: int = 77,
    ):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.model_max_length = model_max_length
        self.byte_encoder = byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.bos_token_id = self.encoder[BOS_TOKEN]
        self.eos_token_id = self.encoder[EOS_TOKEN]
        self.pad_token_id = self.eos_token_id  # CLIP pads with eos
        self.unk_token = EOS_TOKEN
        self._bpe_cache: Dict[str, str] = {
            BOS_TOKEN: BOS_TOKEN, EOS_TOKEN: EOS_TOKEN,
        }
        try:
            import ftfy

            self._fix_text = ftfy.fix_text
        except ImportError:
            self._fix_text = None
        # CLIP's word pattern needs \p{L}/\p{N}; the `regex` module ships
        # with transformers.
        import regex

        self._pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str,
                   model_max_length: int = 77) -> "CLIPBPETokenizer":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().strip().split("\n")
        # First line is the "#version:" header; CLIP reads exactly
        # 49152-256-2 merge rows from the published file.
        merges = [
            tuple(line.split()) for line in lines[1: 49152 - 256 - 2 + 1]
        ]
        return cls(vocab, merges, model_max_length)

    def _bpe(self, token: str) -> str:
        """Greedy lowest-rank pair merging with CLIP's word-final </w>."""
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        if not token:
            return token
        symbols: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(symbols) > 1:
            best = None
            best_rank = None
            for pair in zip(symbols, symbols[1:]):
                rank = self.ranks.get(pair)
                if rank is not None and (best_rank is None or rank < best_rank):
                    best, best_rank = pair, rank
            if best is None:
                break
            merged: List[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    merged.append(best[0] + best[1])
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        result = " ".join(symbols)
        self._bpe_cache[token] = result
        return result

    def tokenize(self, text: str) -> List[str]:
        if self._fix_text is not None:
            text = _ftfy_clean(text, self._fix_text)
        else:
            text = _basic_clean(text)
        tokens: List[str] = []
        for word in self._pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            tokens.extend(self._bpe(mapped).split(" "))
        return tokens

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        unk = self.encoder[self.unk_token]
        return [self.encoder.get(t, unk) for t in tokens]

    def encode(self, text: str, max_length: int = None) -> List[int]:
        """bos + bpe ids + eos, truncated to ``max_length`` total."""
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if max_length is not None:
            ids = ids[: max(max_length - 2, 0)]
        return [self.bos_token_id] + ids + [self.eos_token_id]

    def __call__(
        self,
        texts,
        padding: str = "max_length",
        max_length: int = None,
        truncation: bool = True,
        return_tensors: str = "np",
    ) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        if max_length is None:
            max_length = self.model_max_length
        rows = []
        for text in texts:
            ids = self.encode(text, max_length if truncation else None)
            rows.append(ids)
        width = max_length if padding == "max_length" else max(
            len(r) for r in rows
        )
        input_ids = np.full((len(rows), width), self.pad_token_id, np.int64)
        mask = np.zeros((len(rows), width), np.int64)
        for i, ids in enumerate(rows):
            input_ids[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        specials = {self.bos_token_id, self.eos_token_id}
        parts = [
            self.decoder[i]
            for i in ids
            if not (skip_special_tokens and i in specials)
        ]
        text = "".join(parts)
        raw = bytearray(
            self.byte_decoder[c] for c in text if c in self.byte_decoder
        )
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()
