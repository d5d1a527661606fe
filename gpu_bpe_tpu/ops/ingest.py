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

    # Vectorized dedup: bucket words by length, dedupe each bucket with
    # np.unique over fixed-width rows (C-speed; the previous Python dict
    # loop dominated ingestion on multi-GB corpora). Deterministic output
    # order: (length asc, bytes asc).
    boundaries = np.flatnonzero(starts)
    ends = np.append(boundaries[1:], n_total)
    lengths = ends - boundaries
    bytes_arr = tokens.astype(np.uint8)

    out_syms: list[np.ndarray] = []
    out_wts: list[np.ndarray] = []
    total_unique = 0
    for ln in np.unique(lengths):
        ln = int(ln)
        sel = boundaries[lengths == ln]
        if ln == 0:
            continue
        # [k, ln] matrix of word bytes via strided gather
        mat = bytes_arr[sel[:, None] + np.arange(ln)[None, :]]
        uniq, cnt = np.unique(mat, axis=0, return_counts=True)
        k = len(uniq)
        sym = uniq.astype(np.uint32)
        sym[:, 0] |= np.uint32(WORD_START_BIT)
        out_syms.append(sym.reshape(-1))
        out_wts.append(np.repeat(cnt.astype(np.int32), ln))
        total_unique += k * ln

    if not out_syms:
        return SymbolStream(
            symbols=np.zeros(0, np.uint32), weights=np.zeros(0, np.int32),
            n=0, total_bytes=n_total,
        )
    symbols = np.concatenate(out_syms)
    weights = np.concatenate(out_wts)
    return SymbolStream(symbols=symbols, weights=weights, n=total_unique, total_bytes=n_total)


def pad_stream(stream: SymbolStream, multiple: int = 1024) -> SymbolStream:
    """Pad to a power-of-two capacity (tail symbols = 0, which never pair).

    Power-of-two buckets mean every corpus size hits the same compiled-shape
    ladder (a fresh TPU compile of the batched merge step costs tens of
    seconds; the persistent compilation cache then serves ALL corpora).
    Headroom of at least COMPACT_EVERY+2 zeros past the stream guarantees
    the hole-skipping roll chains in ops/train_step.py never wrap onto live
    data.
    """
    headroom = 16
    cap = max(multiple, 2048)
    while cap < stream.n + headroom:
        cap <<= 1
    symbols = np.zeros(cap, dtype=np.uint32)
    weights = np.zeros(cap, dtype=np.int32)
    symbols[: stream.n] = stream.symbols[: stream.n]
    weights[: stream.n] = stream.weights[: stream.n]
    return SymbolStream(symbols=symbols, weights=weights, n=stream.n, total_bytes=stream.total_bytes)
