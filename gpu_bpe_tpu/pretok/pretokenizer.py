"""PreTokenizer: NFC normalization + classification + word-start masks.

Framework equivalent of the reference PreTokenizer
(`/root/reference/src/wasm/pre_tokenizer.mjs:402-510`), with both entry points:

* ``pre_tokenize(text)``  — string path: NFC normalize → classify → boundaries
  → UTF-8 encode with codepoint→byte boundary mapping.
* ``pre_tokenize_bytes(data)`` — byte-native path: NFC over bytes → lenient
  UTF-8 decode → classify → boundaries → byte-level mask.

Both return ``(bytes, word_starts)`` where ``word_starts`` is a parallel
uint8 mask (1 = word start). Failure chain mirrors the reference: if
normalization fails or returns empty, raw input is used.
"""

from __future__ import annotations

import logging

import numpy as np

from ..unicode import get_backend, utf8_byte_lengths, utf8_to_codepoints
from .boundaries import find_word_boundaries

logger = logging.getLogger(__name__)

_EMPTY = (b"", np.zeros(0, dtype=np.uint8))


class PreTokenizer:
    """GPT-4-style word boundary detection over Unicode property tables."""

    def __init__(self, backend=None):
        self.backend = backend or get_backend()
        # native rule engine when available (identical output to the numpy
        # implementation — pinned by tests/test_pretok.py)
        self._boundaries = getattr(self.backend, "find_word_boundaries", None) or find_word_boundaries

    # ── String path (pre_tokenizer.mjs:426-448) ──────────────────────
    def pre_tokenize(self, text: str) -> tuple[bytes, np.ndarray]:
        if not text:
            return _EMPTY
        try:
            normalized = self.backend.normalize(text, "NFC")
        except Exception as e:  # noqa: BLE001 — mirrors reference fallback
            logger.warning("PreTokenizer: normalize failed, using raw text: %s", e)
            normalized = text
        if not normalized:
            logger.warning("PreTokenizer: normalize returned empty string, using raw text")
            normalized = text

        cps = np.array([ord(c) for c in normalized], dtype=np.uint32)
        classes = self.backend.classify_codepoints(cps)
        cp_starts = self._boundaries(cps, classes)

        data = normalized.encode("utf-8")
        lens = utf8_byte_lengths(cps)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        word_starts = np.zeros(len(data), dtype=np.uint8)
        word_starts[offsets[cp_starts.astype(bool)]] = 1
        return data, word_starts

    # ── Byte-native path (pre_tokenizer.mjs:459-509) ─────────────────
    def pre_tokenize_bytes(self, data: bytes) -> tuple[bytes, np.ndarray]:
        data = bytes(data)
        if not data:
            return _EMPTY

        # Fused native path (C++ decoder): NFC + classify + byte offsets in
        # one pass; identical results to the staged path below.
        prepare = getattr(self.backend, "pretokenize_prepare", None)
        if prepare is not None:
            try:
                # reuse=True: scratch views are consumed before this method
                # returns (boundaries + mask below), so the pooled buffers
                # are safe — and skip the huge re-fault every call
                normalized, cps, classes, offsets = prepare(data, reuse=True)
                if normalized:
                    cp_starts = self._boundaries(cps, classes)
                    scatter = getattr(self.backend, "byte_word_starts", None)
                    if scatter is not None:
                        word_starts = scatter(offsets, cp_starts, len(normalized))
                    else:
                        word_starts = np.zeros(len(normalized), dtype=np.uint8)
                        sel = offsets[cp_starts.astype(bool)]
                        word_starts[sel[sel < len(normalized)]] = 1
                    return normalized, word_starts
            except UnicodeDecodeError:
                pass  # invalid UTF-8 → staged path with raw-bytes fallback

        try:
            normalized = self.backend.normalize_bytes(data, "NFC")
        except Exception as e:  # noqa: BLE001
            logger.warning("PreTokenizer: normalize_bytes failed, using raw bytes: %s", e)
            normalized = data
        if not normalized:
            logger.warning("PreTokenizer: normalize_bytes returned empty, using raw bytes")
            normalized = data

        cps = utf8_to_codepoints(normalized)
        classes = self.backend.classify_codepoints(cps)
        cp_starts = self._boundaries(cps, classes)

        # Codepoint-level boundaries → byte-level mask. The reference maps via
        # utf8ByteLength of the DECODED codepoints (pre_tokenizer.mjs:499-508);
        # for invalid input the mapping may drift — replicated deliberately,
        # with out-of-range writes dropped (JS typed-array OOB semantics).
        lens = utf8_byte_lengths(cps)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        word_starts = np.zeros(len(normalized), dtype=np.uint8)
        sel = offsets[cp_starts.astype(bool)]
        sel = sel[sel < len(normalized)]
        word_starts[sel] = 1
        return normalized, word_starts
