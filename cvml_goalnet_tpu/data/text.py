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
    if vocab_size < 2:
        # id 0 is the padding slot, so hashing needs ≥ 1 real id — a
        # vocab_size of 1 would otherwise die in an opaque modulo-by-zero
        raise ValueError(f"text_vocab_size must be >= 2 (got {vocab_size}); "
                         "id 0 is reserved for padding")
    out = np.zeros((len(texts), max_len), dtype=np.int32)
    for i, text in enumerate(texts):
        words = _WORD.findall(text.lower())[:max_len]
        for j, w in enumerate(words):
            out[i, j] = 1 + _fnv1a(w) % (vocab_size - 1)
    return out


def load_commentary_jsonl(path: str) -> list[tuple[int, str]]:
    """Parse a commentary sidecar (``<video>.commentary.jsonl``).

    One JSON object per line: ``{"frame": <raw frame index>, "text": "..."}``.
    Returns (frame, text) pairs sorted by frame.  This is the text-modality
    ingestion the reference lacks entirely (BASELINE.json config 4 adds it).
    """
    import json

    entries: list[tuple[int, str]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            entries.append((int(obj["frame"]), str(obj["text"])))
    entries.sort(key=lambda e: e[0])
    return entries


def commentary_per_frame(
    entries: list[tuple[int, str]], n_condensed: int, skip_frames: int
) -> list[str]:
    """Align commentary lines to condensed frames.

    Condensed frame ``i`` corresponds to raw frame ``i * skip_frames``; it
    carries the most recent commentary line at or before that raw frame
    (commentary persists until superseded — natural for live commentary).
    Frames before the first line get the empty string.
    """
    out: list[str] = []
    j = -1
    for i in range(n_condensed):
        raw = i * skip_frames
        while j + 1 < len(entries) and entries[j + 1][0] <= raw:
            j += 1
        out.append(entries[j][1] if j >= 0 else "")
    return out
