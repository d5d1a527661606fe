"""Native decoder library vs Python unicodedata: exact agreement."""

import unicodedata

import numpy as np
import pytest

from gpu_bpe_tpu.unicode.fallback import MAX_CODEPOINT, PyUnicodeBackend, class_table


@pytest.fixture(scope="module")
def cpp():
    from gpu_bpe_tpu.unicode.cpp_backend import CppUnicodeBackend

    return CppUnicodeBackend()


NFC_SAMPLES = [
    "hello world",
    "étude déjà-vu naïve",
    "étude",  # decomposed acute
    "ä́",  # multiple combining marks (ordering)
    "ḍ̇",  # ḋ + dot below → reorder + compose
    "한국어 조합",  # precomposed Hangul
    "각",  # Hangul jamo L+V+T → composes to 각
    "ağır ğışçöü İstanbul",
    "北京 москва الشرق",
    "🙂👨‍👩‍👧‍👦",
    "Ǻx",  # A + ring + acute
    "ﬁle",  # fi ligature (compat char, NFC-invariant)
    "q̣̇",  # q + dot above + dot below (canonical ordering swap)
    "ཷ",  # NFC-stable odd codepoint
    "Å",  # Angstrom sign → Å under NFC
]


class TestNFC:
    @pytest.mark.parametrize("s", NFC_SAMPLES)
    def test_nfc_matches_unicodedata(self, cpp, s):
        expected = unicodedata.normalize("NFC", s)
        assert cpp.normalize(s, "NFC") == expected

    @pytest.mark.parametrize("s", NFC_SAMPLES)
    def test_nfd_matches_unicodedata(self, cpp, s):
        expected = unicodedata.normalize("NFD", s)
        assert cpp.normalize(s, "NFD") == expected

    def test_nfc_random_bmp(self, cpp, rng):
        # random BMP strings (excluding surrogates)
        for _ in range(50):
            cps = rng.integers(0x20, 0xD7FF, size=64)
            s = "".join(chr(int(c)) for c in cps)
            assert cpp.normalize(s, "NFC") == unicodedata.normalize("NFC", s)

    @pytest.mark.parametrize("form", ["NFKC", "NFKD"])
    @pytest.mark.parametrize(
        "s",
        NFC_SAMPLES
        + [
            "ﬁle ﬂow ﬀ",  # Latin ligatures expand under K-forms
            "①②③ ㊤ ㎒ ㎞",  # enclosed/squared compat chars
            "ﷺ",  # U+FDFA: longest expansion in Unicode (18 cps)
            "²³ ¼½¾ ⅓",  # super/subscripts and fractions
            "ＡＢＣ１２３ ｶﾞｷﾞ",  # fullwidth + halfwidth katakana w/ voicing
            "㈱ ㌀ ｟｠",
        ],
    )
    def test_compat_forms_match_unicodedata(self, cpp, form, s):
        assert cpp.normalize(s, form) == unicodedata.normalize(form, s)

    def test_compat_random_bmp(self, cpp, rng):
        # skip cps whose post-15.0 mappings were recovered from the
        # reference binary: unicodedata (15.0) cannot see those
        from gpu_bpe_tpu.unicode.cpp.gen_tables import (
            EXTRA_CANONICAL, EXTRA_COMPAT,
        )

        recovered = set(EXTRA_CANONICAL) | set(EXTRA_COMPAT)
        for _ in range(50):
            cps = [int(c) for c in rng.integers(0x20, 0xD7FF, size=64)
                   if int(c) not in recovered]
            s = "".join(map(chr, cps))
            for form in ("NFKC", "NFKD"):
                assert cpp.normalize(s, form) == unicodedata.normalize(form, s)

    def test_invalid_utf8_raises(self, cpp):
        with pytest.raises(UnicodeDecodeError):
            cpp.normalize_bytes(b"\xff\xfe")

    def test_is_normalized(self, cpp):
        assert cpp._lib.decoder_is_normalized_utf8(b"abc", 3, 0)
        assert not cpp._lib.decoder_is_normalized_utf8("é".encode(), 3, 0)


class TestClassification:
    def test_all_codepoints_match_python_table(self, cpp):
        table = class_table()
        cps = np.arange(MAX_CODEPOINT, dtype=np.uint32)
        native = cpp.classify_codepoints(cps)
        mismatches = np.flatnonzero(native != table)
        assert len(mismatches) == 0, f"first mismatches: {mismatches[:10]}"

    def test_classify_bytes(self, cpp):
        py = PyUnicodeBackend()
        data = "ağır café 123, \n🙂".encode()
        c1, n1 = cpp.classify_bytes(data)
        c2, n2 = py.classify_bytes(data)
        assert n1 == n2
        assert c1.tolist() == c2.tolist()


class TestProperties:
    def test_predicates_sample(self, cpp):
        py = PyUnicodeBackend()
        sample = list(range(0, 0x500)) + [0x2019, 0x4E2D, 0x1F600, 0x10FFFF]
        for cp in sample:
            for pred in ("is_letter", "is_mark", "is_digit", "is_number",
                         "is_punctuation", "is_symbol", "is_whitespace"):
                assert getattr(cpp, pred)(cp) == getattr(py, pred)(cp), (pred, hex(cp))

    def test_case_mapping_sample(self, cpp):
        for cp in list(range(0x41, 0x7B)) + [0xE9, 0x130, 0x131, 0x410, 0x3B1]:
            c = chr(cp)
            up = c.upper()
            lo = c.lower()
            if len(up) == 1:
                assert cpp.to_upper(cp) == ord(up)
            if len(lo) == 1:
                assert cpp.to_lower(cp) == ord(lo)

    def test_compose(self, cpp):
        assert cpp.compose(ord("e"), 0x301) == ord("é")
        # reference semantics: 0 (not -1) means "no composition"
        assert cpp.compose(ord("q"), 0x301) == 0

    def test_version(self, cpp):
        # classification/properties data is Unicode 17.0, adopted directly
        # from the reference decoder.wasm via the oracle sweep
        assert cpp.unicode_version.startswith("17.0")


class TestUnicode17Data:
    """Post-15.0 codepoints must classify per Unicode 17.0 (the reference
    decoder.wasm ships 17.0 tables; unicodedata here is 15.0 — these cps
    are all Cn to it)."""

    def test_new_script_letters(self, cpp):
        for cp in (0x105C0,  # TODHRI (16.0)
                   0x11BC0,  # SUNUWAR (16.0)
                   0x16D40,  # KIRAT RAI (16.0)
                   0x11DB0,  # TOLONG SIKI (17.0)
                   0x10940,  # SIDETIC (17.0)
                   0x16EA0):  # BERIA ERFE (17.0)
            assert cpp.is_letter(cp), hex(cp)
            assert unicodedata.category(chr(cp)) == "Cn"  # invisible to 15.0

    def test_new_digits_classify(self, cpp):
        import numpy as np

        garay = np.arange(0x10D40, 0x10D4A, dtype=np.uint32)  # Nd (16.0)
        assert cpp.classify_codepoints(garay).tolist() == [1] * 10  # DIGIT

    def test_post_15_case_pairs(self, cpp):
        # Garay is bicameral (16.0): pairs recovered from 17.0 case orbits
        assert cpp.to_lower(0x10D50) == 0x10D70
        assert cpp.to_upper(0x10D70) == 0x10D50
        assert cpp.case_fold(0x10D50) == 0x10D70

    def test_python_fallback_agrees(self, cpp):
        # class_table (python fallback) sources the same 17.0 data, so the
        # degradation chain cannot change word boundaries
        from gpu_bpe_tpu.unicode.fallback import class_table

        table = class_table()
        for cp in (0x105C0, 0x10D40, 0x11DB0, 0x16EA0):
            assert int(table[cp]) == int(cpp.classify_codepoints([cp])[0])

    def test_reference_identifier_sets(self, cpp):
        # the reference's identifier sets are range-generalized: unassigned
        # 0x378 is "identifier start" there, and U+00B7 (XID_Continue in
        # UAX #31) is excluded; the true XID sets survive as extras
        assert cpp.is_identifier_start(0x378)
        assert not cpp.is_xid_start(0x378)
        assert not cpp._lib.decoder_is_identifier_continue(0xB7)
        assert cpp.is_xid_continue(0xB7)
        assert cpp.is_identifier_start(ord("a")) and cpp.is_xid_start(ord("a"))

    def test_reference_decompose_single_level(self, cpp):
        # decoder_decompose = the reference's single-level view;
        # decompose_full = recursive incl. algorithmic Hangul
        assert cpp.decompose(0x1D5) == [0xDC, 0x304]
        assert cpp.decompose_full(0x1D5) == [0x55, 0x308, 0x304]
        assert cpp.decompose(0xAC00) == []
        assert cpp.decompose_full(0xAC00) == [0x1100, 0x1161]
        assert cpp.decompose(0x2126) == [0x3A9]

    def test_missing_decomp_list_is_empty(self, cpp):
        # post-15.0 decomposition mappings were recovered from the
        # reference binary itself (scripts/extract_missing_decomps.py) —
        # the unknowns list must stay empty
        import re
        from pathlib import Path

        import gpu_bpe_tpu.unicode.cpp as cpp_pkg

        txt = (Path(cpp_pkg.__file__).parent / "unicode_tables.h").read_text()
        n = int(re.search(r"kMissingDecompCount = (\d+)", txt).group(1))
        nk = int(re.search(r"kMissingCompatDecompCount = (\d+)", txt).group(1))
        assert n == 0 and nk == 0

    def test_recovered_decomp_spot_values(self, cpp):
        # Todhri: recovered canonical pair that RECOMPOSES under NFC
        assert cpp.normalize(chr(0x105C9), "NFD") == chr(0x105D2) + chr(0x307)
        assert cpp.normalize(chr(0x105D2) + chr(0x307), "NFC") == chr(0x105C9)
        # Tulu-Tigalari: decomposes under NFD but NFC-inert (the
        # reference's composing pipeline lacks the mapping — mirrored)
        assert cpp.normalize(chr(0x11383), "NFD") == chr(0x11382) + chr(0x113C9)
        assert cpp.normalize(chr(0x11383), "NFC") == chr(0x11383)
        assert cpp.normalize(chr(0x11382) + chr(0x113C9), "NFC") == \
            chr(0x11382) + chr(0x113C9)


class TestPretokenizePrepare:
    def test_fused_matches_separate(self, cpp):
        py = PyUnicodeBackend()
        data = "étude don't 1234 ağır\ncafé".encode()
        out, cps, classes, offsets = cpp.pretokenize_prepare(data)
        assert out == unicodedata.normalize("NFC", data.decode()).encode()
        assert cps.tolist() == [ord(c) for c in out.decode()]
        c2, _ = py.classify_bytes(out)
        assert classes.tolist() == c2.tolist()
        # offsets are the byte positions of each codepoint
        lead = [i for i in range(len(out)) if (out[i] & 0xC0) != 0x80]
        assert offsets.tolist() == lead


class TestSegmentation:
    def test_counts(self, cpp):
        assert cpp.count_graphemes("hello") == 5
        assert cpp.count_graphemes("é") == 1
        assert cpp.count_words("hello world, again") == 3
        assert cpp.count_sentences("One. Two! Three?") == 3


class TestFallbackSegmentationParity:
    """The cpp→python degradation chain must be surface-identical for
    grapheme/word/sentence counts (round 5: the fallback ports the native
    WB/SB rule engines over regex-derived break classes — the same data
    source the native tables are generated from)."""

    SAMPLES = [
        "hello world, again",
        "One. Two! Three?",
        "Dr. Smith went to Washington. He arrived at 3 p.m. on Tuesday.",
        "don't can't won't it's",
        "a.b.c 3.14 1,000,000",
        "日本語のテキストです。カタカナ words mixed.",
        "e.g. i.e. etc. And so on. lower case continue.",
        "🇺🇸🇫🇷🇩🇪 flags 👨‍👩‍👧‍👦 family",
        "Hello\r\nWorld\r\n",
        "«Quote.» Next one!",
        "__init__ foo_bar x1y2",
        "",
    ]

    def test_counts_match_native(self, cpp):
        from gpu_bpe_tpu.unicode.fallback import PyUnicodeBackend

        py = PyUnicodeBackend()
        for s in self.SAMPLES:
            assert py.count_graphemes(s) == cpp.count_graphemes(s), repr(s)
            assert py.count_words(s) == cpp.count_words(s), repr(s)
            assert py.count_sentences(s) == cpp.count_sentences(s), repr(s)

    def test_counts_match_native_fuzz(self, cpp):
        import random

        from gpu_bpe_tpu.unicode.fallback import PyUnicodeBackend

        py = PyUnicodeBackend()
        rng = random.Random(7)
        pool = "abc ABC 123 .!? 'x' אב カタ é́ \r\n\t()«»…。日 🙂👍🇺🇸 _-,"
        for _ in range(60):
            s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
            assert py.count_graphemes(s) == cpp.count_graphemes(s), repr(s)
            assert py.count_words(s) == cpp.count_words(s), repr(s)
            assert py.count_sentences(s) == cpp.count_sentences(s), repr(s)


class TestRefHangulMode:
    """GPU_BPE_TPU_REF_HANGUL / set_ref_hangul: the reference's wasm never
    algorithmically decomposes Hangul syllables nor composes conjoining
    jamo (oracle-probed, docs/CONFORMANCE.md "Hangul normalization"); the
    compat mode must reproduce that exactly so merge lists match the
    reference on decomposed-jamo corpora."""

    DECOMPOSED = "상"  # S+A+NG jamo ("상" decomposed)
    PRECOMPOSED = "상"  # U+C0C1 상

    def test_cpp_inert_mode(self, cpp):
        try:
            cpp.set_ref_hangul(True)
            # NFC must NOT compose conjoining jamo
            assert cpp.normalize(self.DECOMPOSED, "NFC") == self.DECOMPOSED
            # NFD must NOT decompose syllables
            assert cpp.normalize(self.PRECOMPOSED, "NFD") == self.PRECOMPOSED
            # non-Hangul normalization still works in the same pass
            assert cpp.normalize("é" + self.DECOMPOSED, "NFC") == (
                "é" + self.DECOMPOSED
            )
        finally:
            cpp.set_ref_hangul(False)

    def test_cpp_default_follows_uax15(self, cpp):
        import unicodedata

        assert cpp.normalize(self.DECOMPOSED, "NFC") == unicodedata.normalize(
            "NFC", self.DECOMPOSED
        ) == self.PRECOMPOSED
        assert cpp.normalize(self.PRECOMPOSED, "NFD") == unicodedata.normalize(
            "NFD", self.PRECOMPOSED
        )

    def test_fallback_inert_mode(self):
        be = PyUnicodeBackend()
        be.set_ref_hangul(True)
        assert be.normalize(self.DECOMPOSED, "NFC") == self.DECOMPOSED
        assert be.normalize(self.PRECOMPOSED, "NFD") == self.PRECOMPOSED
        assert be.normalize("é" + self.DECOMPOSED + "é", "NFC") == (
            "é" + self.DECOMPOSED + "é"
        )
        be.set_ref_hangul(False)

    def test_merge_list_route_closed(self, cpp):
        """The ingest consequence: a decomposed-jamo corpus pre-tokenizes
        to different bytes under the two modes — compat mode preserves the
        jamo byte sequence the reference would train on."""
        try:
            cpp.set_ref_hangul(True)
            compat = cpp.normalize_bytes(self.DECOMPOSED.encode(), "NFC")
            assert compat == self.DECOMPOSED.encode()
        finally:
            cpp.set_ref_hangul(False)
        default = cpp.normalize_bytes(self.DECOMPOSED.encode(), "NFC")
        assert default == self.PRECOMPOSED.encode()


def test_backend_selection_prefers_cpp():
    import gpu_bpe_tpu.unicode as u

    u._BACKEND = None
    backend = u.get_backend()
    assert backend.name == "cpp-decoder"


class TestScriptsAndIdentifiers:
    def test_scripts_match_regex_module(self, cpp):
        import regex

        from gpu_bpe_tpu.unicode.enums import Script

        assert cpp.get_script(ord("a")) == Script.LATIN
        assert cpp.get_script(ord("α")) == Script.GREEK
        assert cpp.get_script(ord("ж")) == Script.CYRILLIC
        assert cpp.get_script(ord("中")) == Script.HAN
        assert cpp.get_script(ord("あ")) == Script.HIRAGANA
        assert cpp.get_script(ord(" ")) == Script.COMMON
        assert cpp.get_script(0x0301) == Script.INHERITED
        assert cpp.get_script(0xE000) == Script.UNKNOWN  # private use

    def test_blocks(self, cpp):
        assert cpp.get_block(ord("a")) == cpp.get_block(ord("z"))
        assert cpp.get_block(ord("a")) != cpp.get_block(0x0400)
        assert cpp.is_in_block(ord("a"), cpp.get_block(ord("b")))

    def test_identifier_properties(self, cpp):
        assert cpp.is_identifier_start(ord("a"))
        assert not cpp.is_identifier_start(ord("1"))
        assert cpp.is_identifier_continue(ord("1"))
        assert cpp.is_pattern_syntax(ord("+"))
        assert cpp.is_pattern_whitespace(ord(" "))
        assert not cpp.is_pattern_whitespace(ord("a"))

    def test_suspicious_mixed_script(self, cpp):
        assert cpp.is_suspicious("pаypal")  # Cyrillic 'а' in Latin word
        assert not cpp.is_suspicious("paypal")
        # reference semantics: NO CJK sanctioning — Han+Hiragana mixes are
        # suspicious (oracle-pinned); the round-1 sanctioned heuristic
        # survives as is_mixed_script
        assert cpp.is_suspicious("日本語です")
        assert not cpp.is_mixed_script("日本語です")
        assert cpp.is_mixed_script("pаypal")
        # singleton classes from the reference sweep
        assert cpp.is_suspicious("\u200b")      # zero-width space
        assert cpp.is_suspicious("\u202e")      # RLO
        assert cpp.is_suspicious("\ue000")      # private use
        assert not cpp.is_suspicious("\u00ad")  # soft hyphen is NOT flagged
        assert not cpp.is_suspicious("1")        # ASCII confusable not flagged


class TestExtendedParitySurface:
    """The remaining decoder.wasm exports (decoder.js full list): full case
    mapping, caseless compare, transcoding, segmentation boundaries,
    confusables, sanitize, names."""

    def test_full_case_expansion(self, cpp):
        assert cpp.to_upper_full(ord("ß")) == [ord("S"), ord("S")]
        assert cpp.case_fold_full(ord("ß")) == [ord("s"), ord("s")]
        assert cpp.to_upper_full(ord("a")) == [ord("A")]
        assert cpp.to_lower_full(ord("A")) == [ord("a")]
        assert cpp.case_fold_full(0xFB01) == [ord("f"), ord("i")]  # ﬁ

    def test_case_compare(self, cpp):
        assert cpp.case_compare("Hello", "hello") == 0
        assert cpp.case_compare("STRASSE", "straße") == 0
        assert cpp.case_compare("abc", "abd") < 0
        assert cpp.case_compare("b", "a") > 0

    def test_string_case(self, cpp):
        assert cpp.string_to_upper("abc") == "ABC"
        assert cpp.string_to_lower("ABC") == "abc"
        assert cpp.string_to_title("hello world") == "Hello World"

    def test_sanitize_replaces_invalid(self, cpp):
        out = cpp.sanitize(b"ok\xff\xfemore")
        assert out.decode("utf-8") == "ok��more"
        assert cpp.sanitize("clean ✓".encode()) == "clean ✓".encode()

    def test_well_formed(self, cpp):
        assert cpp.is_well_formed("abc dé".encode())
        assert not cpp.is_well_formed(b"\xc3")

    def test_utf16_utf32_transcoding(self, cpp):
        s = "a𝄞é"  # includes a surrogate pair
        u16 = list(s.encode("utf-16-le"))
        units = [u16[i] | (u16[i + 1] << 8) for i in range(0, len(u16), 2)]
        assert cpp.is_valid_utf16(units)
        cps = cpp.utf16_to_utf32(units)
        assert [int(c) for c in cps] == [ord(c) for c in s]
        assert list(cpp.utf32_to_utf16(cps)) == units
        assert cpp.utf32_to_utf8(cps) == s.encode("utf-8")
        assert list(cpp.utf8_to_utf16(s.encode())) == units
        assert cpp.utf16_to_utf8(units) == s.encode("utf-8")
        assert cpp.utf8_length(cps) == len(s.encode("utf-8"))
        assert not cpp.is_valid_utf16([0xD800])  # lone surrogate

    def test_boundaries(self, cpp):
        s = "ab cd"
        assert cpp.is_word_boundary(s, 2)
        assert not cpp.is_word_boundary(s, 1)
        assert cpp.is_grapheme_boundary("ab", 1)
        assert not cpp.is_grapheme_boundary("éx", 1)  # combining acute
        # UAX #29: lowercase after "a. " means NO sentence break (SB8);
        # uppercase does break (SB11)
        assert not cpp.is_sentence_boundary("a. b", 3)
        assert cpp.is_sentence_boundary("a. B", 3)

    def test_next_iterators(self, cpp):
        s = "hi there"
        assert cpp.next_word(s, 0) == 2
        assert cpp.next_word(s, 2) == 3
        assert cpp.next_grapheme("éx", 0) == 2
        # UAX #29 places the sentence boundary after the trailing space
        assert cpp.next_sentence("One. Two.", 0) == 5

    def test_confusables(self, cpp):
        assert cpp.check_confusables("pаypal", "paypal")  # Cyrillic а
        assert cpp.check_confusables("ΑΒ", "AB")  # Greek capitals
        assert not cpp.check_confusables("hello", "world")
        assert cpp.is_confusable(0x0430, ord("a"))
        assert not cpp.is_confusable(ord("a"), ord("b"))
        assert cpp.has_confusable_mapping(0x0430)
        assert not cpp.has_confusable_mapping(ord("a"))

    def test_normalize_codepoints_and_quick_check(self, cpp):
        import numpy as np

        cps = np.array([ord("e"), 0x0301], dtype=np.uint32)  # e + combining acute
        out = cpp.normalize_codepoints(cps, "NFC")
        assert [int(c) for c in out] == [0xE9]
        # worst-case NFKD expansion (U+FDFA -> 18 cps) must not overflow
        # the output buffer (regression: 4x sizing raised RuntimeError)
        import unicodedata

        wide = np.array([0xFDFA] * 4, dtype=np.uint32)
        got = cpp.normalize_codepoints(wide, "NFKD")
        want = [ord(c) for c in unicodedata.normalize("NFKD", "ﷺ" * 4)]
        assert [int(c) for c in got] == want
        assert cpp.quick_check("é", "NFC")
        assert not cpp.quick_check("é", "NFC")

    def test_script_block_names(self, cpp):
        from gpu_bpe_tpu.unicode.enums import Script

        # reference's exact display strings (sweep-extracted)
        assert cpp.get_script_name(Script.LATIN) == "Latin"
        assert cpp.get_script_name(Script.HAN) == "Han"
        assert cpp.get_block_name(ord("a")) == "Basic Latin"
        assert cpp.get_block_name(0xDF) == "Latin-1 Supplement"
        assert cpp.get_block_id_name(cpp.get_block(ord("a")))  # non-empty

    def test_alphabetic_numeric(self, cpp):
        assert cpp.is_alphabetic(ord("a"))
        assert cpp.is_alphabetic(0x2160)  # Roman numeral one (Nl)
        assert not cpp.is_alphabetic(ord("1"))
        assert cpp.is_numeric(ord("1"))
        assert cpp.is_numeric(0x00BD)  # ½


class TestUAX29Exact:
    """Full UAX #29 rule sets (replacing the round-1 approximations).

    Graphemes are verified exhaustively against the regex module's \\X in
    test_graphemes_vs_regex; words and sentences against hand-derived
    expectations for every rule."""

    def _words(self, cpp, s):
        out, prev = [], 0
        for i in range(1, len(s)):
            if cpp.is_word_boundary(s, i):
                out.append(s[prev:i]); prev = i
        out.append(s[prev:])
        return out

    def _sentences(self, cpp, s):
        out, prev = [], 0
        for i in range(1, len(s)):
            if cpp.is_sentence_boundary(s, i):
                out.append(s[prev:i]); prev = i
        out.append(s[prev:])
        return out

    def test_graphemes_vs_regex(self, cpp, rng):
        import regex

        pool = ["a", "é", "́", "्", "क", "\U0001F600", "‍",
                "\U0001F1FA", "\U0001F1F8", "\r", "\n", "각", "ᄀ", "ᅡ",
                "̖", "\U0001F3FD", " "]
        for _ in range(500):
            k = int(rng.integers(1, 10))
            s = "".join(pool[int(i)] for i in rng.integers(0, len(pool), k))
            want = regex.findall(r"\X", s)
            got, prev = [], 0
            for i in range(1, len(s)):
                if cpp.is_grapheme_boundary(s, i):
                    got.append(s[prev:i]); prev = i
            got.append(s[prev:])
            assert got == want, s.encode("unicode_escape")

    def test_word_rules(self, cpp):
        # WB5/6/7: contractions and mid-letters join
        assert self._words(cpp, "can't stop") == ["can't", " ", "stop"]
        assert self._words(cpp, "a:b") == ["a:b"]  # ':' is MidLetter
        # WB8/11/12: numbers with separators
        assert self._words(cpp, "1,234.56 x") == ["1,234.56", " ", "x"]
        # WB10 joins a trailing letter onto the number
        assert self._words(cpp, "1,234.56x") == ["1,234.56x"]
        # WB9/10: letters and digits join
        assert self._words(cpp, "win32 api") == ["win32", " ", "api"]
        # WB13a/b: ExtendNumLet (underscore) glues
        assert self._words(cpp, "foo_bar baz") == ["foo_bar", " ", "baz"]
        # WB3d: horizontal whitespace runs stay together
        assert self._words(cpp, "a  b") == ["a", "  ", "b"]
        # WB3a/b: newlines always break
        assert self._words(cpp, "a\nb") == ["a", "\n", "b"]
        # WB4: format/extend chars are invisible to the rules
        assert self._words(cpp, "ab­cd") == ["ab­cd"]  # soft hyphen
        # WB15/16: regional-indicator pairs
        flags = "\U0001F1FA\U0001F1F8\U0001F1EC\U0001F1E7"
        assert self._words(cpp, flags) == ["\U0001F1FA\U0001F1F8", "\U0001F1EC\U0001F1E7"]
        # WB7a/b/c: Hebrew quotes
        assert self._words(cpp, "א'") == ["א'"]
        assert self._words(cpp, 'א"ב') == ['א"ב']
        # Katakana joins (WB13)
        assert self._words(cpp, "カタカナ x") == ["カタカナ", " ", "x"]

    def test_sentence_rules(self, cpp):
        s = self._sentences(cpp, "One. Two! three?")
        assert s == ["One. ", "Two! ", "three?"]
        # SB8: lowercase after period = abbreviation, no break
        assert self._sentences(cpp, "etc. and more.") == ["etc. and more."]
        # SB7 joins ONLY with no space: "J.Smith" stays, "J. Smith" breaks
        # (vanilla UAX #29 — abbreviation suppression is a tailoring)
        assert self._sentences(cpp, "J.Smith left.") == ["J.Smith left."]
        assert self._sentences(cpp, "J. Smith left.") == ["J. ", "Smith left."]
        # SB6: numbers after period
        assert self._sentences(cpp, "3.14 is pi.") == ["3.14 is pi."]
        # SB8a: ellipsis continuation
        assert self._sentences(cpp, "Wait... maybe.") == ["Wait... maybe."]
        # SB4: paragraph separators break unconditionally
        assert self._sentences(cpp, "One\n\nTwo") == ["One\n", "\n", "Two"]
        # SB9/10/11: closers after terminator
        assert self._sentences(cpp, 'He said "Go." Then left.') == ['He said "Go." ', "Then left."]

    def test_counts(self, cpp):
        assert cpp.count_words("hello world, again") == 3
        assert cpp.count_words("can't stop won't stop") == 4
        assert cpp.count_graphemes("👨‍👩‍👧‍👦") == 1
        assert cpp.count_sentences("One. Two! Three?") == 3
        assert cpp.count_sentences("Mr. Smith is here.") == 2  # vanilla UAX #29


class TestConfusablesReference:
    """check_confusables = the reference's exact semantics, pinned against
    the decoder.wasm oracle (scripts/wasm_vm.py): equal length +
    positionwise prototype equality over the extracted 6,558-entry
    UTS #39 table. No normalization or case folding."""

    @pytest.mark.parametrize("a,b,want", [
        ("pаypal", "paypal", True),       # Cyrillic homoglyph
        ("раура", "paypa", True),         # all-Cyrillic spoof
        ("𝓅𝒶𝓎𝓅𝒶𝓁", "paypal", True),     # mathematical script (in table)
        ("ｐａｙｐａｌ", "paypal", True),   # fullwidth (in table)
        ("paypal", "paypa1", True),       # '1' -> 'l' IS in the table
        ("abc", "abc", True),             # identical strings are confusable
        ("œ", "o", True),                 # first-prototype-cp comparison only
        ("ﬁ", "fi", False),               # length mismatch (no expansion)
        ("…", "...", False),              # length mismatch (no expansion)
        ("ﬁle", "FILE", False),           # no case folding
        ("hello", "world", False),
        ("ab", "a", False),               # length mismatch
        ("", "", True),                   # oracle: empty vs empty is 1
    ])
    def test_pairs(self, cpp, a, b, want):
        assert cpp.check_confusables(a, b) == want

    def test_is_confusable_reference_semantics(self, cpp):
        # oracle-pinned: identical cps never confusable, even when mapped
        assert not cpp.is_confusable(0x430, 0x430)
        assert not cpp.is_confusable(ord("a"), ord("a"))
        assert cpp.is_confusable(0x430, ord("a"))      # Cyrillic а ~ a
        assert cpp.is_confusable(0xFB01, 0xFB00)       # ﬁ ~ ﬀ (proto 'f')
        assert cpp.is_confusable(0x2026, ord("."))     # … ~ . (first cp)
        assert cpp.is_confusable(ord("1"), ord("l"))   # 1 ~ l
        assert not cpp.is_confusable(ord("a"), ord("A"))

    def test_extracted_table_spot_values(self, cpp):
        # spot entries from the verified extraction
        assert cpp.confusable_proto_len(0xFB01) == 2   # fi-ligature -> "fi"
        assert cpp.confusable_proto_len(0x2026) == 3   # ellipsis -> "..."
        assert cpp.confusable_proto_len(0x430) == 1
        assert cpp.confusable_proto_len(ord("a")) == 1  # unmapped


class TestConfusablesWidened:
    """Widened skeleton (extra capability beyond the reference): NFKD ->
    case fold -> prototype map, combining marks stripped — catches
    length-changing spoofs (ligatures) the reference's positionwise rule
    cannot."""

    @pytest.mark.parametrize("a,b,want", [
        ("pаypal", "paypal", True),       # Cyrillic homoglyph
        ("𝓅𝒶𝓎𝓅𝒶𝓁", "paypal", True),     # mathematical script via NFKD
        ("𝗉𝖺𝗒𝗉𝖺𝗅", "paypal", True),      # mathematical sans-serif
        ("ｐａｙｐａｌ", "paypal", True),   # fullwidth
        ("ﬁle", "FILE", True),            # ligature + case fold
        ("p̷a̷y̷p̷a̷l̷", "paypal", True),  # combining decorations stripped
        ("ⓟⓐⓨⓟⓐⓛ", "paypal", True),      # circled letters
        ("спасибо", "spasibo", False),    # real Cyrillic word, not a spoof
    ])
    def test_pairs(self, cpp, a, b, want):
        assert cpp.check_confusables_widened(a, b) == want


class TestQuickCheckTristate:
    """Reference tri-state semantics (MAYBE=0 YES=1 NO=2), oracle-pinned
    in round 2 (docs/artifacts/misc_parity.json: 0/2000 mismatches)."""

    def _qc(self, cpp, cps, form):
        import ctypes

        arr = (ctypes.c_uint32 * len(cps))(*cps)
        return cpp._lib.decoder_quick_check(arr, len(cps), form)

    def test_tristate_values(self, cpp):
        assert self._qc(cpp, [ord("a"), ord("b")], 0) == 1          # YES
        assert self._qc(cpp, [ord("q"), 0x301], 0) == 0             # MAYBE
        assert self._qc(cpp, [0xE9], 1) == 2                        # NO (NFD)
        assert self._qc(cpp, [0x61, 0x301, 0x327], 0) == 2          # ccc violation
        assert self._qc(cpp, [0x61, 0x327, 0x301], 0) == 0          # ordered -> MAYBE
        assert self._qc(cpp, [0xFB01], 2) == 2                      # compat NO
        assert self._qc(cpp, [], 0) == 1

    def test_is_normalized_is_qc_based(self, cpp):
        # reference parity: MAYBE counts as NOT normalized, even when the
        # sequence is in fact normalized ("q" + combining acute under NFC)
        import numpy as np

        cps = np.array([ord("q"), 0x301], dtype=np.uint32)
        import ctypes

        p = cps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        assert not cpp._lib.decoder_is_normalized(p, 2, 0)
        assert cpp._lib.decoder_is_normalized_exact(p, 2, 0)
