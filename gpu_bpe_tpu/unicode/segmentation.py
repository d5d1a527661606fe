"""Text segmentation counts (grapheme / word / sentence).

Capability parity with the reference WASM decoder's segmentation API
(`decoder.mjs:423-427`: countGraphemes / countWords / countSentences).
Grapheme clustering implements the UAX #29 core rules (extend, ZWJ emoji
sequences, regional-indicator pairing, Hangul syllable composition).
"""

from __future__ import annotations

import unicodedata

_REGIONAL = (0x1F1E6, 0x1F1FF)
_ZWJ = 0x200D


def _is_extend(cp: int) -> bool:
    cat = unicodedata.category(chr(cp))
    return cat in ("Mn", "Me", "Mc") or cp == 0xFE0F or cp == 0xFE0E or 0x1F3FB <= cp <= 0x1F3FF


def _hangul_type(cp: int) -> str | None:
    if 0x1100 <= cp <= 0x115F or 0xA960 <= cp <= 0xA97C:
        return "L"
    if 0x1160 <= cp <= 0x11A7 or 0xD7B0 <= cp <= 0xD7C6:
        return "V"
    if 0x11A8 <= cp <= 0x11FF or 0xD7CB <= cp <= 0xD7FB:
        return "T"
    if 0xAC00 <= cp <= 0xD7A3:
        return "LV" if (cp - 0xAC00) % 28 == 0 else "LVT"
    return None


def count_graphemes(s: str) -> int:
    if not s:
        return 0
    try:
        # exact UAX #29 clusters when the regex module is present (it is
        # in this image); keeps the fallback chain consistent with the
        # native backend's exact rule engine
        import regex

        return len(regex.findall(r"\X", s))
    except ImportError:
        pass
    cps = [ord(c) for c in s]
    n = len(cps)
    count = 1
    for i in range(1, n):
        prev, curr = cps[i - 1], cps[i]
        # CRLF stays one cluster
        if prev == 0x0D and curr == 0x0A:
            continue
        # Control/newline always breaks
        if prev in (0x0A, 0x0D) or curr in (0x0A, 0x0D):
            count += 1
            continue
        if _is_extend(curr) or curr == _ZWJ:
            continue
        if prev == _ZWJ:
            # emoji ZWJ sequence continues
            continue
        if _REGIONAL[0] <= curr <= _REGIONAL[1] and _REGIONAL[0] <= prev <= _REGIONAL[1]:
            # pair regional indicators (only even-length runs pair; track run)
            run = 0
            j = i - 1
            while j >= 0 and _REGIONAL[0] <= cps[j] <= _REGIONAL[1]:
                run += 1
                j -= 1
            if run % 2 == 1:
                continue
        ph, ch = _hangul_type(prev), _hangul_type(curr)
        if ph and ch:
            if ph == "L" and ch in ("L", "V", "LV", "LVT"):
                continue
            if ph in ("LV", "V") and ch in ("V", "T"):
                continue
            if ph in ("LVT", "T") and ch == "T":
                continue
        count += 1
    return count


def count_words(s: str) -> int:
    """Word count: alphanumeric runs (UAX #29 simplified)."""
    in_word = False
    count = 0
    for c in s:
        cat = unicodedata.category(c)
        is_wordish = cat[0] in ("L", "N") or c in ("'", "’", "_")
        if is_wordish and not in_word:
            count += 1
        in_word = is_wordish
    return count


_SENTENCE_TERMINATORS = frozenset(".!?‼‽⁇⁈⁉。！．？")


def count_sentences(s: str) -> int:
    count = 0
    pending = False  # saw content since last terminator
    for c in s:
        if c in _SENTENCE_TERMINATORS:
            if pending:
                count += 1
            pending = False
        elif not c.isspace():
            pending = True
    if pending:
        count += 1
    return count
