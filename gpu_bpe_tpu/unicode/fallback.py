"""Pure-Python Unicode backend (fallback when the C++ extension is absent).

Provides the property predicates, NFC normalization and batch classification
consumed by the pre-tokenizer — the same API surface as the reference's WASM
decoder library (`/root/reference/src/wasm/decoder.mjs:238-355`). The C++
extension (`gpu_bpe_tpu/unicode/cpp`) implements the identical interface; this
module mirrors the reference's own JS fallback chain
(pre_tokenizer.mjs:430-441,464-492).

Table source: CPython's ``unicodedata`` (Unicode 15.0 in this interpreter vs
the reference's 17.0 — differences affect only codepoints assigned after 15.0;
documented in docs/CONFORMANCE.md).
"""

from __future__ import annotations

import sys
import unicodedata
from functools import lru_cache

import numpy as np

MAX_CODEPOINT = 0x110000

# Unicode White_Space property (PropList.txt) — stable across recent versions.
WHITESPACE_CODEPOINTS = frozenset(
    list(range(0x09, 0x0E))
    + [0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)

# Newlines get their own class (pre_tokenizer.mjs:44).
NEWLINE_CODEPOINTS = frozenset([0x0A, 0x0D, 0x85, 0x2028, 0x2029])


class CharClass:
    """Broad character classes for pre-tokenization (pre_tokenizer.mjs:34-42)."""

    LETTER = 0
    DIGIT = 1
    WHITESPACE = 2
    PUNCTUATION = 3
    SYMBOL = 4
    NEWLINE = 5
    OTHER = 6


@lru_cache(maxsize=4)
def _ref_field(key: str):
    """A field of the reference-extracted property data (None if absent)."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "data" / "ref_properties.json"
    if not path.exists():
        return None
    return json.loads(path.read_text()).get(key)


@lru_cache(maxsize=2)
def _ref_runs(key: str):
    runs = _ref_field(key)
    if runs is None:
        return None
    return [r[0] for r in runs], [r[1] for r in runs]


@lru_cache(maxsize=1)
def _suspicious_ranges():
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "data" / "ref_suspicious_extra.json"
    ranges = json.loads(path.read_text())["ranges"] if path.exists() else []
    return [r[0] for r in ranges], [r[1] for r in ranges]


@lru_cache(maxsize=1)
def _confusable_table() -> dict[int, tuple[int, int]]:
    """The reference's exact UTS #39 prototype map: cp -> (proto_first_cp,
    proto_len). Extracted from decoder.wasm (unicode/data/ref_confusables.json,
    see scripts/extract_confusables.py)."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "data" / "ref_confusables.json"
    entries = json.loads(path.read_text())["entries"]
    return {int(k): (v, plen) for k, (v, plen) in entries.items()}


def _classify_codepoint(cp: int) -> int:
    if cp in NEWLINE_CODEPOINTS:
        return CharClass.NEWLINE
    cat = unicodedata.category(chr(cp))
    head = cat[0]
    if head in ("L", "M"):  # marks stay with letters (pre_tokenizer.mjs:128)
        return CharClass.LETTER
    if head == "N":
        return CharClass.DIGIT
    if cp in WHITESPACE_CODEPOINTS:
        return CharClass.WHITESPACE
    if head == "P":
        return CharClass.PUNCTUATION
    if head == "S":
        return CharClass.SYMBOL
    return CharClass.OTHER


@lru_cache(maxsize=1)
def class_table() -> np.ndarray:
    """Dense uint8 class table over the full codepoint space (1.1 MB).

    Sourced from the reference decoder.wasm's own category data
    (unicode/data/ref_properties.json, sweep-extracted — identical to the
    native C++ tables), else the ``regex`` module's Unicode 17.0 data,
    else unicodedata (15.0)."""
    try:
        return _class_table_ref()
    except (FileNotFoundError, KeyError):
        pass
    try:
        return _class_table_regex()
    except ImportError:
        table = np.empty(MAX_CODEPOINT, dtype=np.uint8)
        classify = _classify_codepoint
        for cp in range(MAX_CODEPOINT):
            table[cp] = classify(cp)
        return table


# reference Category-enum index -> two-letter name / coarse group head,
# mirroring gen_tables.CATEGORIES
_CAT_NAMES = (
    "Cn Lu Ll Lt Lm Lo Mn Mc Me Nd Nl No Pc Pd Ps Pe Pi Pf Po Sm Sc Sk So "
    "Zs Zl Zp Cc Cf Cs Co"
).split()
_CAT_HEADS = "".join(c[0] for c in _CAT_NAMES)


@lru_cache(maxsize=1)
def _ref_categories():
    """Dense per-cp two-letter category strings from the reference's
    sweep-extracted data (None when the data file is absent)."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "data" / "ref_properties.json"
    if not path.exists():
        return None
    runs = json.loads(path.read_text())["category"]
    out = ["Cn"] * MAX_CODEPOINT
    for i, (start, cat) in enumerate(runs):
        end = runs[i + 1][0] if i + 1 < len(runs) else MAX_CODEPOINT
        name = _CAT_NAMES[cat]
        for cp in range(start, min(end, MAX_CODEPOINT)):
            out[cp] = name
    return out


def _class_table_ref() -> np.ndarray:
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "data" / "ref_properties.json"
    runs = json.loads(path.read_text())["category"]
    table = np.full(MAX_CODEPOINT, CharClass.OTHER, dtype=np.uint8)
    group_to_class = {
        "L": CharClass.LETTER, "M": CharClass.LETTER, "N": CharClass.DIGIT,
        "P": CharClass.PUNCTUATION, "S": CharClass.SYMBOL,
    }
    for i, (start, cat) in enumerate(runs):
        end = runs[i + 1][0] if i + 1 < len(runs) else MAX_CODEPOINT
        cls = group_to_class.get(_CAT_HEADS[cat])
        if cls is not None:
            table[start:end] = cls
    table[sorted(WHITESPACE_CODEPOINTS)] = CharClass.WHITESPACE
    table[sorted(NEWLINE_CODEPOINTS)] = CharClass.NEWLINE
    return table


def _class_table_regex() -> np.ndarray:
    import regex

    all_text = "".join(map(chr, range(MAX_CODEPOINT)))
    table = np.full(MAX_CODEPOINT, CharClass.OTHER, dtype=np.uint8)

    def apply(pattern: str, value: int) -> None:
        pat = regex.compile(pattern + "+", regex.V1)
        for m in pat.finditer(all_text):
            table[m.start() : m.end()] = value

    apply(r"\p{L}", CharClass.LETTER)
    apply(r"\p{M}", CharClass.LETTER)  # marks stay with letters
    apply(r"\p{N}", CharClass.DIGIT)
    apply(r"\p{P}", CharClass.PUNCTUATION)
    apply(r"\p{S}", CharClass.SYMBOL)
    # whitespace / newline classes override category-derived ones
    table[sorted(WHITESPACE_CODEPOINTS)] = CharClass.WHITESPACE
    table[sorted(NEWLINE_CODEPOINTS)] = CharClass.NEWLINE
    return table


class PyUnicodeBackend:
    """Python implementation of the Unicode backend interface.

    Interface parity with decoder.mjs: predicates, case mapping, NFC/NFD/NFKC/
    NFKD normalization (string + raw UTF-8 bytes), and batch classification.
    """

    name = "python-unicodedata"

    @property
    def unicode_version(self) -> str:
        return unicodedata.unidata_version

    # ── Codepoint properties (decoder.mjs:238-263) ──────────────────
    @staticmethod
    def get_category(cp: int) -> str:
        cats = _ref_categories()
        if cats is not None:
            return cats[cp]
        return unicodedata.category(chr(cp))

    def is_letter(self, cp: int) -> bool:
        return self.get_category(cp).startswith("L")

    def is_mark(self, cp: int) -> bool:
        return self.get_category(cp).startswith("M")

    def is_digit(self, cp: int) -> bool:
        return self.get_category(cp) == "Nd"

    def is_number(self, cp: int) -> bool:
        return self.get_category(cp).startswith("N")

    def is_punctuation(self, cp: int) -> bool:
        return self.get_category(cp).startswith("P")

    def is_symbol(self, cp: int) -> bool:
        return self.get_category(cp).startswith("S")

    def is_whitespace(self, cp: int) -> bool:
        return cp in WHITESPACE_CODEPOINTS

    def is_separator(self, cp: int) -> bool:
        return self.get_category(cp).startswith("Z")

    def is_control(self, cp: int) -> bool:
        return self.get_category(cp) == "Cc"

    def is_format(self, cp: int) -> bool:
        return self.get_category(cp) == "Cf"

    def is_uppercase(self, cp: int) -> bool:
        return self.get_category(cp) == "Lu"

    def is_lowercase(self, cp: int) -> bool:
        return self.get_category(cp) == "Ll"

    def is_titlecase(self, cp: int) -> bool:
        return self.get_category(cp) == "Lt"

    def is_alphanumeric(self, cp: int) -> bool:
        return self.is_letter(cp) or self.is_number(cp)

    def is_valid(self, cp: int) -> bool:
        return 0 <= cp < MAX_CODEPOINT and not (0xD800 <= cp <= 0xDFFF)

    def is_surrogate(self, cp: int) -> bool:
        return 0xD800 <= cp <= 0xDFFF

    def is_noncharacter(self, cp: int) -> bool:
        return (0xFDD0 <= cp <= 0xFDEF) or (cp & 0xFFFE) == 0xFFFE

    def is_assigned(self, cp: int) -> bool:
        return self.get_category(cp) != "Cn"

    def is_private_use(self, cp: int) -> bool:
        return self.get_category(cp) == "Co"

    def get_numeric_value(self, cp: int) -> float:
        return unicodedata.numeric(chr(cp), float("nan"))

    def get_digit_value(self, cp: int) -> int:
        return unicodedata.digit(chr(cp), -1)

    def get_name(self, cp: int) -> str:
        return unicodedata.name(chr(cp), "")

    def from_name(self, name: str) -> int:
        try:
            return ord(unicodedata.lookup(name))
        except KeyError:
            return -1

    # ── Case mapping (decoder.mjs:275-297) ──────────────────────────
    def to_upper(self, cp: int) -> int:
        u = chr(cp).upper()
        return ord(u) if len(u) == 1 else cp

    def to_lower(self, cp: int) -> int:
        l = chr(cp).lower()
        return ord(l) if len(l) == 1 else cp

    def to_title(self, cp: int) -> int:
        t = chr(cp).title()
        return ord(t[0]) if t else cp

    def case_fold(self, cp: int) -> int:
        f = chr(cp).casefold()
        return ord(f) if len(f) == 1 else cp

    def to_upper_full(self, cp: int) -> list[int]:
        return [ord(c) for c in chr(cp).upper()]

    def to_lower_full(self, cp: int) -> list[int]:
        return [ord(c) for c in chr(cp).lower()]

    def case_fold_full(self, cp: int) -> list[int]:
        return [ord(c) for c in chr(cp).casefold()]

    def string_to_upper(self, s: str) -> str:
        return s.upper()

    def string_to_lower(self, s: str) -> str:
        return s.lower()

    def string_case_fold(self, s: str) -> str:
        return s.casefold()

    # ── Normalization (decoder.mjs:309-362) ─────────────────────────
    _FORMS = ("NFC", "NFD", "NFKC", "NFKD")

    def set_ref_hangul(self, enabled: bool) -> None:
        """Reference-compat Hangul mode (see CppUnicodeBackend.set_ref_hangul):
        Hangul syllables and conjoining jamo pass through normalization
        untouched, like the reference's wasm. Implemented here by splitting
        on Hangul runs and normalizing the segments between them (Hangul
        has ccc=0 and no table decompositions, so segments are independent)."""
        self._ref_hangul = enabled

    @property
    def ref_hangul(self) -> bool:
        return getattr(self, "_ref_hangul", False) or bool(
            __import__("os").environ.get("GPU_BPE_TPU_REF_HANGUL")
        )

    @staticmethod
    def _is_hangul_inert_cp(o: int) -> bool:
        # syllables + conjoining jamo (the cps the algorithmic step touches)
        return 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF

    def normalize(self, text: str, form: int | str = "NFC") -> str:
        if isinstance(form, int):
            form = self._FORMS[form]
        if self.ref_hangul and any(self._is_hangul_inert_cp(ord(c)) for c in text):
            out: list[str] = []
            seg: list[str] = []
            for ch in text:
                if self._is_hangul_inert_cp(ord(ch)):
                    if seg:
                        out.append(unicodedata.normalize(form, "".join(seg)))
                        seg = []
                    out.append(ch)
                else:
                    seg.append(ch)
            if seg:
                out.append(unicodedata.normalize(form, "".join(seg)))
            return "".join(out)
        return unicodedata.normalize(form, text)

    def normalize_bytes(self, data: bytes, form: int | str = "NFC") -> bytes:
        """UTF-8 bytes → normalized UTF-8 bytes. Raises on invalid UTF-8
        (callers mimic the reference's raw-bytes fallback)."""
        return self.normalize(bytes(data).decode("utf-8", errors="strict"), form).encode("utf-8")

    def is_normalized(self, text: str, form: int | str = "NFC") -> bool:
        if isinstance(form, int):
            form = self._FORMS[form]
        return unicodedata.is_normalized(form, text)

    def decompose(self, cp: int) -> str:
        return unicodedata.decomposition(chr(cp))

    def combining_class(self, cp: int) -> int:
        return unicodedata.combining(chr(cp))

    def is_combining(self, cp: int) -> bool:
        return unicodedata.combining(chr(cp)) != 0

    # ── Batch classification (decoder.mjs:343-355) ──────────────────
    def classify_codepoints(self, codepoints: np.ndarray) -> np.ndarray:
        """Vectorized per-codepoint CharClass lookup."""
        cps = np.asarray(codepoints, dtype=np.int64)
        cps = np.clip(cps, 0, MAX_CODEPOINT - 1)
        return class_table()[cps]

    def classify_bytes(self, data: bytes) -> tuple[np.ndarray, int]:
        """UTF-8 bytes → per-codepoint CharClass array (decoder.mjs:343-355)."""
        from .utf8 import utf8_to_codepoints

        cps = utf8_to_codepoints(data)
        classes = self.classify_codepoints(cps)
        return classes, len(cps)

    # ── Scripts / identifiers / security (reference-extracted data) ──
    def get_script(self, cp: int) -> int:
        runs = _ref_runs("script")
        if runs is None:
            return 0
        import bisect

        i = bisect.bisect_right(runs[0], cp) - 1
        return runs[1][i] if i >= 0 else 0

    def get_script_name(self, script_id: int) -> str:
        names = _ref_field("script_names") or []
        return names[script_id] if 0 <= script_id < len(names) else ""

    def get_block_name(self, cp: int) -> str:
        blocks = _ref_field("blocks")
        if not blocks:
            return ""
        import bisect

        i = bisect.bisect_right([b[0] for b in blocks], cp) - 1
        return blocks[i][1] if i >= 0 else ""

    def _in_ranges(self, key: str, cp: int) -> bool:
        ranges = _ref_field(key) or []
        import bisect

        i = bisect.bisect_right([r[0] for r in ranges], cp) - 1
        return i >= 0 and cp <= ranges[i][1]

    def is_identifier_start(self, cp: int) -> bool:
        return self._in_ranges("identifier_start", cp)

    def is_identifier_continue(self, cp: int) -> bool:
        return self._in_ranges("identifier_continue", cp)

    def is_suspicious(self, s: str) -> bool:
        """Reference semantics (same rule as the native backend)."""
        if not s:
            return False
        susp = _suspicious_ranges()
        import bisect

        def extra(cp: int) -> bool:
            i = bisect.bisect_right(susp[0], cp) - 1
            return i >= 0 and cp <= susp[1][i]

        base = self.get_script(ord(s[0]))
        script_clause = base not in (1, 2)
        for i, ch in enumerate(s):
            cp = ord(ch)
            if cp > 0x7F and self.has_confusable_mapping(cp):
                return True
            if extra(cp):
                return True
            if script_clause and i > 0:
                sc = self.get_script(cp)
                if sc != base and sc not in (1, 2):
                    return True
        return False

    # ── Segmentation counts (decoder.mjs:423-427) ───────────────────
    def count_graphemes(self, s: str) -> int:
        from .segmentation import count_graphemes

        return count_graphemes(s)

    def count_words(self, s: str) -> int:
        from .segmentation import count_words

        return count_words(s)

    def count_sentences(self, s: str) -> int:
        from .segmentation import count_sentences

        return count_sentences(s)

    # ── UTF validation ───────────────────────────────────────────────
    def is_valid_utf8(self, data: bytes) -> bool:
        try:
            bytes(data).decode("utf-8", errors="strict")
            return True
        except UnicodeDecodeError:
            return False

    def utf8_length(self, s: str) -> int:
        return len(s.encode("utf-8"))

    def char_count(self, s: str) -> int:
        return len(s)

    def to_codepoints(self, s: str) -> np.ndarray:
        return np.array([ord(c) for c in s], dtype=np.uint32)

    # ── extended parity surface (pure-Python versions) ───────────────
    def is_alphabetic(self, cp: int) -> bool:
        cat = unicodedata.category(chr(cp))
        return cat.startswith("L") or cat == "Nl"

    def is_numeric(self, cp: int) -> bool:
        return unicodedata.category(chr(cp)).startswith("N")

    def to_title_full(self, cp: int) -> list[int]:
        return [ord(c) for c in chr(cp).title()]

    def string_to_title(self, s: str) -> str:
        return s.title()

    def case_compare(self, a: str, b: str) -> int:
        fa, fb = a.casefold(), b.casefold()
        return -1 if fa < fb else (1 if fa > fb else 0)

    @staticmethod
    def _confusable_proto(cp: int) -> int:
        ent = _confusable_table().get(cp)
        return ent[0] if ent else cp

    def check_confusables(self, a: str, b: str) -> bool:
        # reference semantics: equal length + positionwise prototype equality
        if len(a) != len(b):
            return False
        return all(
            self._confusable_proto(ord(x)) == self._confusable_proto(ord(y))
            for x, y in zip(a, b)
        )

    def check_confusables_widened(self, a: str, b: str) -> bool:
        return self.get_skeleton(a) == self.get_skeleton(b)

    @classmethod
    def _proto_widened(cls, cp: int) -> int:
        # only single-cp prototypes: multi-char entries carry just their
        # first cp (reference binary dead-strips continuations) and NFKD
        # already expands those characters correctly
        ent = _confusable_table().get(cp)
        return ent[0] if ent and ent[1] == 1 else cp

    def get_skeleton(self, s: str) -> str:
        k = unicodedata.normalize("NFKD", s).casefold()
        return "".join(
            chr(self._proto_widened(ord(c))) for c in k if unicodedata.combining(c) == 0
        )

    def is_confusable(self, a: int, b: int) -> bool:
        # reference semantics: distinct codepoints sharing a prototype
        return a != b and self._confusable_proto(a) == self._confusable_proto(b)

    def has_confusable_mapping(self, cp: int) -> bool:
        return cp in _confusable_table()

    def confusable_proto_len(self, cp: int) -> int:
        ent = _confusable_table().get(cp)
        return ent[1] if ent else 1

    @staticmethod
    def _cp_ill_formed(cp: int) -> bool:
        return (
            cp > 0x10FFFF
            or 0xD800 <= cp <= 0xDFFF
            or 0xFDD0 <= cp <= 0xFDEF
            or (cp & 0xFFFE) == 0xFFFE
        )

    def sanitize(self, data: bytes) -> bytes:
        return bytes(data).decode("utf-8", errors="replace").encode("utf-8")

    def sanitize_codepoints(self, s: str) -> str:
        return "".join(c for c in s if not self._cp_ill_formed(ord(c)))

    def is_well_formed(self, data: bytes) -> bool:
        return self.is_valid_utf8(data)

    def is_well_formed_codepoints(self, s) -> bool:
        cps = [ord(c) for c in s] if isinstance(s, str) else list(s)
        return not any(self._cp_ill_formed(cp) for cp in cps)

    def is_valid_utf16(self, units) -> bool:
        try:
            np.asarray(units, dtype=np.uint16).tobytes().decode("utf-16-le", errors="strict")
            return True
        except UnicodeDecodeError:
            return False

    def utf16_to_utf32(self, units) -> np.ndarray:
        s = np.asarray(units, dtype=np.uint16).tobytes().decode("utf-16-le")
        return self.to_codepoints(s)

    def utf32_to_utf16(self, cps) -> np.ndarray:
        s = "".join(chr(int(c)) for c in np.asarray(cps, dtype=np.uint32))
        return np.frombuffer(s.encode("utf-16-le"), dtype=np.uint16).copy()

    def utf32_to_utf8(self, cps) -> bytes:
        return "".join(chr(int(c)) for c in np.asarray(cps, dtype=np.uint32)).encode("utf-8")

    def utf8_to_utf16(self, data: bytes) -> np.ndarray:
        s = bytes(data).decode("utf-8")
        return np.frombuffer(s.encode("utf-16-le"), dtype=np.uint16).copy()

    def utf16_to_utf8(self, units) -> bytes:
        return np.asarray(units, dtype=np.uint16).tobytes().decode("utf-16-le").encode("utf-8")

    def is_grapheme_boundary(self, s: str, pos: int) -> bool:
        if pos <= 0 or pos >= len(s):
            return True
        prev, cur = s[pos - 1], s[pos]
        if prev == "\r" and cur == "\n":
            return False
        if prev in "\r\n" or cur in "\r\n":
            return True
        if unicodedata.combining(cur) or unicodedata.category(cur).startswith("M"):
            return False
        if prev == "‍" or cur in "‍︎️":
            return False
        if "\U0001f3fb" <= cur <= "\U0001f3ff":
            return False
        return True

    def is_word_boundary(self, s: str, pos: int) -> bool:
        if pos <= 0 or pos >= len(s):
            return True

        def wordish(c):
            cat = unicodedata.category(c)
            return cat.startswith(("L", "N")) or c in "'_’"

        return wordish(s[pos - 1]) != wordish(s[pos])

    def is_sentence_boundary(self, s: str, pos: int) -> bool:
        if pos <= 0 or pos >= len(s):
            return True
        return s[pos - 1] in ".!?‼‽⁇⁈⁉。！．？"

    def next_grapheme(self, s: str, pos: int) -> int:
        for i in range(pos + 1, len(s)):
            if self.is_grapheme_boundary(s, i):
                return i
        return len(s)

    def next_word(self, s: str, pos: int) -> int:
        for i in range(pos + 1, len(s)):
            if self.is_word_boundary(s, i):
                return i
        return len(s)

    def next_sentence(self, s: str, pos: int) -> int:
        for i in range(pos + 1, len(s)):
            if self.is_sentence_boundary(s, i):
                return i
        return len(s)

    def normalize_codepoints(self, cps, form: int | str = "NFC") -> np.ndarray:
        if isinstance(form, int):
            form = self._FORMS[form]
        s = "".join(chr(int(c)) for c in np.asarray(cps, dtype=np.uint32))
        return self.to_codepoints(unicodedata.normalize(form, s))

    def quick_check(self, s: str, form: int | str = "NFC") -> bool:
        if isinstance(form, int):
            form = self._FORMS[form]
        return unicodedata.is_normalized(form, s)


def _selftest() -> None:  # pragma: no cover
    b = PyUnicodeBackend()
    assert b.is_letter(ord("a"))
    assert b.classify_codepoints(np.array([0x0A]))[0] == CharClass.NEWLINE
    print("ok", b.unicode_version, file=sys.stderr)


if __name__ == "__main__":  # pragma: no cover
    _selftest()
