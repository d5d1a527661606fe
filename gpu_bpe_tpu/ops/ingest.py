"""Corpus ingestion: symbol streams, padding, and unique-word deduplication.

The TPU trainer operates on a flat u32 symbol stream with word-start flags —
the exact representation of the reference trainer (trainer.js:157-170) — plus
an optional per-position weight array enabling the *deduplicated word
multiset* formulation: because merges never cross word boundaries and act on
each word instance identically, global pair counts equal
``Σ_unique_words freq(w) · in-word counts``. Deduplication makes per-merge
cost proportional to unique-word mass instead of corpus size, which is the
headline algorithmic win over the reference (it recounts the full corpus
every merge).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import TOKEN_MASK, WORD_START_BIT


@dataclass
class SymbolStream:
    """Flat training input: symbols (tok|WS) + per-position weights."""

    symbols: np.ndarray  # uint32 [N]
    weights: np.ndarray  # int32  [N] — word frequency at each position
    n: int  # valid prefix length
    total_bytes: int  # original (non-deduplicated) corpus size in symbols

    @property
    def dedup_ratio(self) -> float:
        return self.total_bytes / max(self.n, 1)


def make_stream(
    data: bytes | np.ndarray,
    word_starts: np.ndarray | None,
    dedup: bool = True,
) -> SymbolStream:
    """Build a SymbolStream from pre-tokenized bytes + word-start mask.

    With ``dedup=True``, identical words collapse to one copy with a frequency
    weight (exact — see module docstring). With no mask, the stream is a
    single "word" starting at position 0 and dedup is skipped.
    """
    if isinstance(data, (bytes, bytearray)):
        tokens = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.uint32)
    else:
        tokens = np.asarray(data, dtype=np.uint32) & np.uint32(TOKEN_MASK)
    n_total = len(tokens)

    if word_starts is None or not dedup or n_total == 0:
        symbols = tokens.copy()
        if word_starts is not None:
            symbols[word_starts.astype(bool)] |= np.uint32(WORD_START_BIT)
        elif n_total:
            symbols[0] |= np.uint32(WORD_START_BIT)
        return SymbolStream(
            symbols=symbols,
            weights=np.ones(n_total, dtype=np.int32),
            n=n_total,
            total_bytes=n_total,
        )

    starts = word_starts.astype(bool).copy()
    if n_total:
        starts[0] = True  # position 0 always starts a word (rule 1)

    # Split into words and deduplicate via byte-string keys.
    boundaries = np.flatnonzero(starts)
    ends = np.append(boundaries[1:], n_total)
    byte_view = tokens.astype(np.uint8).tobytes()
    counts: dict[bytes, int] = {}
    for s, e in zip(boundaries.tolist(), ends.tolist()):
        w = byte_view[s:e]
        counts[w] = counts.get(w, 0) + 1

    words = list(counts.items())
    total_unique = sum(len(w) for w, _ in words)
    symbols = np.empty(total_unique, dtype=np.uint32)
    weights = np.empty(total_unique, dtype=np.int32)
    pos = 0
    for w, freq in words:
        ln = len(w)
        symbols[pos : pos + ln] = np.frombuffer(w, dtype=np.uint8)
        symbols[pos] |= np.uint32(WORD_START_BIT)
        weights[pos : pos + ln] = freq
        pos += ln
    return SymbolStream(symbols=symbols, weights=weights, n=total_unique, total_bytes=n_total)


def pad_stream(stream: SymbolStream, multiple: int = 1024) -> SymbolStream:
    """Pad to a static capacity (tail symbols = 0, which never form pairs).

    Headroom of at least COMPACT_EVERY+2 zeros past the stream guarantees the
    hole-skipping roll chains in ops/train_step.py never wrap onto live data.
    """
    headroom = 16
    cap = max(((stream.n + headroom + multiple - 1) // multiple) * multiple, multiple)
    symbols = np.zeros(cap, dtype=np.uint32)
    weights = np.zeros(cap, dtype=np.int32)
    symbols[: stream.n] = stream.symbols[: stream.n]
    weights[: stream.n] = stream.weights[: stream.n]
    return SymbolStream(symbols=symbols, weights=weights, n=stream.n, total_bytes=stream.total_bytes)
