"""Test oracle: literal sequential port of the reference boundary loop.

This is a deliberate, labeled TRANSLATION of the reference rule engine
(`/root/reference/src/wasm/pre_tokenizer.mjs:226-292` findWordBoundaries +
:83-110 matchContraction), kept OUT of the production package on purpose:
its only job is to validate that the vectorized implementation in
``gpu_bpe_tpu.pretok.boundaries`` reproduces the sequential reference loop
position-for-position (tests/test_pretok.py).
"""

from __future__ import annotations

import numpy as np

from gpu_bpe_tpu.pretok.boundaries import _APOSTROPHES, _TRANSITION
from gpu_bpe_tpu.unicode.fallback import CharClass

_SINGLE_SUFFIXES = {0x73, 0x53, 0x74, 0x54, 0x6D, 0x4D, 0x64, 0x44}
_TWO_SUFFIXES = [(0x72, 0x52, 0x65, 0x45), (0x76, 0x56, 0x65, 0x45), (0x6C, 0x4C, 0x6C, 0x4C)]


def _match_contraction(cps: np.ndarray, classes: np.ndarray, i: int) -> int:
    n = len(cps)
    if i + 1 >= n:
        return 0
    nxt = cps[i + 1]
    after_non_letter = i + 2 >= n or classes[i + 2] != CharClass.LETTER
    if nxt in _SINGLE_SUFFIXES and after_non_letter:
        return 2
    if i + 2 < n:
        nxt2 = cps[i + 2]
        after2_non_letter = i + 3 >= n or classes[i + 3] != CharClass.LETTER
        for lo1, hi1, lo2, hi2 in _TWO_SUFFIXES:
            if (nxt == lo1 or nxt == hi1) and (nxt2 == lo2 or nxt2 == hi2) and after2_non_letter:
                return 3
    return 0


def find_word_boundaries_reference(cps: np.ndarray, classes: np.ndarray) -> np.ndarray:
    """Literal sequential port of the reference loop — test oracle only."""
    cps = np.asarray(cps, dtype=np.int64)
    classes = np.asarray(classes, dtype=np.int64)
    n = len(cps)
    starts = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return starts
    starts[0] = 1
    i = 1
    while i < n:
        prev = classes[i - 1]
        curr = classes[i]
        if curr == CharClass.NEWLINE or prev == CharClass.NEWLINE:
            starts[i] = 1
            i += 1
            continue
        if curr == CharClass.WHITESPACE:
            if prev != CharClass.WHITESPACE:
                starts[i] = 1
            i += 1
            continue
        if prev == CharClass.WHITESPACE:
            i += 1
            continue
        if prev == CharClass.LETTER and cps[i] in _APOSTROPHES:
            consumed = _match_contraction(cps, classes, i)
            if consumed > 0:
                i += consumed
                continue
        if _TRANSITION[prev, curr]:
            starts[i] = 1
            i += 1
            continue
        if curr == CharClass.DIGIT and prev == CharClass.DIGIT:
            run_start = i - 1
            while run_start > 0 and classes[run_start - 1] == CharClass.DIGIT:
                run_start -= 1
            if (i - run_start) % 3 == 0:
                starts[i] = 1
            i += 1
            continue
        i += 1
    return starts
