"""Commentary/text ingest: deterministic hashing tokenizer (new capability).

Feeds the transformer text branch (BASELINE.json config 4).  Self-contained
by design: a normalizing whitespace tokenizer with stable FNV-1a hashing into
the configured vocab (id 0 reserved for padding), so tokenization needs no
external vocab file and is reproducible across hosts.
"""

from __future__ import annotations

import re

import numpy as np

_WORD = re.compile(r"[a-z0-9']+")


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def tokenize(texts: list[str], vocab_size: int, max_len: int) -> np.ndarray:
    """(N,) strings → (N, max_len) int32 token ids; 0 = padding."""
    out = np.zeros((len(texts), max_len), dtype=np.int32)
    for i, text in enumerate(texts):
        words = _WORD.findall(text.lower())[:max_len]
        for j, w in enumerate(words):
            out[i, j] = 1 + _fnv1a(w) % (vocab_size - 1)
    return out
