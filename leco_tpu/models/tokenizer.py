"""Pure-Python CLIP BPE tokenizer.

Replaces the HF `CLIPTokenizer` the reference pulls from the hub
(model_util.py:38-58 — note the reference downloads the tokenizer from fixed
hub names regardless of the model path; here the vocab/merges are read from
the checkpoint's own `tokenizer/` directory, or any directory containing
`vocab.json` + `merges.txt`, so the loader works fully offline).

Encoding semantics match `tokenizer(prompts, padding="max_length",
max_length=77, truncation=True)` (train_util.py:60-70): lowercase + NFC,
byte-level BPE with '</w>' end-of-word markers, BOS + tokens[:75] + EOS,
padded to 77 with the pad token (EOS for SD1/2; id 0 for SDXL's second
tokenizer, model_util.py:150).
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
import unicodedata
from typing import Optional

import numpy as np

try:  # `regex` supports \p{L}; it ships as a transformers dependency
    import regex as re

    _PATTERN = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        re.IGNORECASE,
    )
except ImportError:  # pragma: no cover
    import re

    _PATTERN = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|\w+|\d|[^\s\w\d]+""",
        re.IGNORECASE,
    )


@functools.lru_cache()
def _bytes_to_unicode():
    """GPT-2 byte <-> unicode table (reversible, no control chars)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _whitespace_clean(text: str) -> str:
    import re as _re

    return _re.sub(r"\s+", " ", text).strip()


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return unicodedata.normalize("NFC", text.strip())


class CLIPTokenizer:
    """Byte-level BPE tokenizer with CLIP semantics."""

    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        model_max_length: int = 77,
        pad_token_id: Optional[int] = None,
        bos_token: str = "<|startoftext|>",
        eos_token: str = "<|endoftext|>",
    ):
        self.vocab = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.model_max_length = model_max_length
        self.byte_encoder = _bytes_to_unicode()
        self.bos_token_id = vocab[bos_token]
        self.eos_token_id = vocab[eos_token]
        self.pad_token_id = (
            pad_token_id if pad_token_id is not None else self.eos_token_id
        )
        self._bpe_cache: dict[str, tuple[str, ...]] = {}
        # native C++ merge engine (leco_tpu/native/bpe.cpp); pure-Python
        # fallback when unavailable
        self._native = None
        try:
            from leco_tpu.native import NativeBPE

            self._native = NativeBPE(vocab, merges)
        except Exception:
            self._native = None

    # ----------------------------------------------------------- constructors
    @classmethod
    def from_pretrained(
        cls, path: str, pad_token_id: Optional[int] = None
    ) -> "CLIPTokenizer":
        """Load from a directory containing vocab.json + merges.txt
        (a diffusers `tokenizer/` subfolder works)."""
        for sub in ("", "tokenizer"):
            d = os.path.join(path, sub) if sub else path
            if os.path.exists(os.path.join(d, "vocab.json")):
                path = d
                break
        with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges_path = os.path.join(path, "merges.txt")
        if os.path.exists(merges_path):
            with open(merges_path, encoding="utf-8") as f:
                lines = f.read().split("\n")
        else:  # OpenAI's gzip distribution
            with gzip.open(
                os.path.join(path, "bpe_simple_vocab_16e6.txt.gz"), "rt"
            ) as f:
                lines = f.read().split("\n")
        merges = [
            tuple(line.split()) for line in lines if line and not line.startswith("#")
        ]
        merges = [m for m in merges if len(m) == 2]
        return cls(vocab, merges, pad_token_id=pad_token_id)

    # ------------------------------------------------------------------- BPE
    def _bpe(self, token: str) -> tuple[str, ...]:
        if token in self._bpe_cache:
            return self._bpe_cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word[:-1], word[1:]))
        if not pairs:
            return (token + "</w>",)
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word[:-1], word[1:]))
        self._bpe_cache[token] = word
        return word

    def tokenize(self, text: str) -> list[int]:
        """Text -> BPE ids (no special tokens)."""
        text = _whitespace_clean(_basic_clean(text)).lower()
        ids: list[int] = []
        for token in _PATTERN.findall(text):
            if token in self.vocab and token.startswith("<|"):
                # special-token literals ("<|startoftext|>"/"<|endoftext|>")
                # map to their ids directly, matching HF's added-token split
                ids.append(self.vocab[token])
                continue
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            if self._native is not None:
                try:
                    ids.extend(self._native.encode_word(token))
                    continue
                except KeyError:
                    pass  # fall through to the Python path
            for piece in self._bpe(token):
                ids.append(self.vocab[piece])
        return ids

    def __call__(self, prompts: list[str] | str) -> np.ndarray:
        """Pad-to-77, truncating: [BOS] + ids[:75] + [EOS] + pad.
        Returns int32 array (B, 77). Mirrors train_util.text_tokenize."""
        if isinstance(prompts, str):
            prompts = [prompts]
        n = self.model_max_length
        out = np.full((len(prompts), n), self.pad_token_id, dtype=np.int32)
        for row, text in enumerate(prompts):
            ids = self.tokenize(text)[: n - 2]
            seq = [self.bos_token_id] + ids + [self.eos_token_id]
            out[row, : len(seq)] = seq
        return out


def make_tiny_tokenizer(words: list[str], model_max_length: int = 77):
    """Synthetic tokenizer for tests: whole-word vocab, no merges needed
    beyond character pairs; every listed word maps to one token."""
    byte_enc = _bytes_to_unicode()

    def enc(w):
        return "".join(byte_enc[b] for b in w.encode("utf-8"))

    vocab: dict[str, int] = {}
    merges: list[tuple[str, str]] = []
    # single characters (with and without </w>)
    chars = sorted({c for w in words for c in enc(w)})
    for c in chars:
        vocab.setdefault(c, len(vocab))
        vocab.setdefault(c + "</w>", len(vocab))
    # build merges so each word becomes one token
    for w in words:
        e = enc(w)
        pieces = list(e[:-1]) + [e[-1] + "</w>"]
        while len(pieces) > 1:
            merged = pieces[0] + pieces[1]
            merges.append((pieces[0], pieces[1]))
            vocab.setdefault(merged, len(vocab))
            pieces = [merged] + pieces[2:]
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return CLIPTokenizer(vocab, merges, model_max_length=model_max_length)
