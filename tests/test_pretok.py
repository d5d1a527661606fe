"""Pre-tokenizer rule tests: golden fixtures + vectorized-vs-sequential."""

import numpy as np
import pytest

from pretok_literal_oracle import find_word_boundaries_reference

from gpu_bpe_tpu.pretok import (
    PreTokenizer,
    find_word_boundaries,
    tag_word_boundaries_bytes,
)
from gpu_bpe_tpu.constants import WORD_START_BIT
from gpu_bpe_tpu.unicode import get_backend, utf8_to_codepoints


def _starts(text: str) -> list[int]:
    backend = get_backend()
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    classes = backend.classify_codepoints(cps)
    return find_word_boundaries(cps, classes).tolist()


def _words(text: str) -> list[str]:
    starts = _starts(text)
    out, cur = [], ""
    for ch, s in zip(text, starts):
        if s and cur:
            out.append(cur)
            cur = ""
        cur += ch
    if cur:
        out.append(cur)
    return out


class TestWordBoundaryRules:
    def test_space_prefix_model(self):
        # whitespace is a PREFIX of the following word (pre_tokenizer.mjs:210)
        assert _words("kabul edilmek") == ["kabul", " edilmek"]

    def test_consecutive_whitespace_one_chunk(self):
        assert _words("a   b") == ["a", "   b"]

    def test_newline_hard_boundary(self):
        assert _words("ab\ncd") == ["ab", "\n", "cd"]
        assert _words("a\n\nb") == ["a", "\n", "\n", "b"]

    def test_contractions_merge(self):
        assert _words("don't stop") == ["don't", " stop"]
        assert _words("they'll wait") == ["they'll", " wait"]
        assert _words("we've seen") == ["we've", " seen"]
        assert _words("it's fine") == ["it's", " fine"]
        assert _words("I'm here") == ["I'm", " here"]
        assert _words("he'd go") == ["he'd", " go"]
        assert _words("you're ok") == ["you're", " ok"]

    def test_contraction_unicode_apostrophe(self):
        assert _words("don’t stop") == ["don’t", " stop"]

    def test_contraction_requires_non_letter_after(self):
        # "'sa" — letter after suffix blocks the contraction; ' splits as punct
        assert _words("a'sand") == ["a", "'", "sand"]

    def test_contraction_uppercase(self):
        assert _words("DON'T") == ["DON'T"]

    def test_letter_digit_transition(self):
        assert _words("abc123") == ["abc", "123"]
        assert _words("123abc") == ["123", "abc"]

    def test_punct_transitions(self):
        assert _words("end.") == ["end", "."]
        assert _words(".end") == [".", "end"]
        assert _words("a+b") == ["a", "+", "b"]

    def test_digit_grouping_every_3(self):
        assert _words("1234567") == ["123", "456", "7"]
        assert _words("12") == ["12"]
        assert _words("123456") == ["123", "456"]

    def test_punct_symbol_runs_stay_together(self):
        assert _words("!!!???") == ["!!!???"]
        assert _words("---") == ["---"]

    def test_position_zero(self):
        assert _starts("x")[0] == 1
        assert _starts(" x")[0] == 1

    def test_empty(self):
        assert _starts("") == []


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox",
        "don't they'll we've it's I'm he'd you're O'Brien's",
        "abc123def456 12,345,678.90",
        "line1\nline2\r\nline3 line4",
        "  leading and   multiple   spaces ",
        "naïve café ağır ğışçöü İstanbul",
        "北京 москва الශ්‍රී 🙂🙂",
        "a'sa b'ts c're'll d'Re E'LL f'Ve",
        "tabs\tand\x0bvtabs\x0cff",
        "mixed!@#$%^&*()123abc...def",
        "'''",
        "a'",
        "1'000'000",
    ],
)
def test_vectorized_matches_sequential(text):
    backend = get_backend()
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    classes = backend.classify_codepoints(cps)
    vec = find_word_boundaries(cps, classes)
    ref = find_word_boundaries_reference(cps, classes)
    assert vec.tolist() == ref.tolist()


def test_vectorized_matches_sequential_random(rng, english_text):
    backend = get_backend()
    cps = np.array([ord(c) for c in english_text], dtype=np.uint32)
    classes = backend.classify_codepoints(cps)
    assert np.array_equal(
        find_word_boundaries(cps, classes),
        find_word_boundaries_reference(cps, classes),
    )


class TestPreTokenizer:
    def test_string_and_bytes_paths_agree(self, english_text):
        pt = PreTokenizer()
        b1, m1 = pt.pre_tokenize(english_text)
        b2, m2 = pt.pre_tokenize_bytes(english_text.encode("utf-8"))
        assert b1 == b2
        assert np.array_equal(m1, m2)

    def test_nfc_normalization_applied(self):
        pt = PreTokenizer()
        decomposed = "étude"  # é as e + combining acute
        b, m = pt.pre_tokenize(decomposed)
        assert b.decode("utf-8") == "étude"
        assert len(m) == len(b)

    def test_mask_is_byte_aligned(self):
        pt = PreTokenizer()
        b, m = pt.pre_tokenize("ağır café")
        assert len(b) == len(m)
        # word starts land on UTF-8 lead bytes
        for i in np.flatnonzero(m):
            assert (b[i] & 0xC0) != 0x80

    def test_invalid_utf8_bytes_fallback(self):
        pt = PreTokenizer()
        raw = b"ok \xff\xfe bytes"
        b, m = pt.pre_tokenize_bytes(raw)
        assert b == raw  # normalization failed -> raw bytes kept
        assert len(m) == len(raw)

    def test_empty(self):
        pt = PreTokenizer()
        assert pt.pre_tokenize("")[0] == b""
        assert pt.pre_tokenize_bytes(b"")[0] == b""


class TestByteFallback:
    def test_byte_heuristic_rules(self):
        symbols = np.frombuffer(b"ab 12.cd\nx", dtype=np.uint8).astype(np.uint32)
        tagged = tag_word_boundaries_bytes(symbols)
        starts = ((tagged & WORD_START_BIT) != 0).astype(int).tolist()
        #          a  b  ' ' 1  2  .  c  d  \n x
        assert starts == [1, 0, 1, 0, 0, 1, 1, 0, 1, 1]

    def test_space_attaches_to_word(self):
        symbols = np.frombuffer(b"a bc", dtype=np.uint8).astype(np.uint32)
        tagged = tag_word_boundaries_bytes(symbols)
        starts = ((tagged & WORD_START_BIT) != 0).astype(int).tolist()
        assert starts == [1, 1, 0, 0]  # " bc" is one word

    def test_high_bytes_are_letters(self):
        symbols = np.frombuffer("ağır".encode(), dtype=np.uint8).astype(np.uint32)
        tagged = tag_word_boundaries_bytes(symbols)
        starts = ((tagged & WORD_START_BIT) != 0).astype(int).tolist()
        assert starts == [1, 0, 0, 0, 0, 0]


def test_lenient_utf8_decoder_valid():
    s = "hello ağır 北京 🙂"
    cps = utf8_to_codepoints(s.encode("utf-8"))
    assert cps.tolist() == [ord(c) for c in s]


def test_lenient_utf8_decoder_invalid_matches_reference_quirk():
    # stray continuation byte is treated as a 4-byte lead (pre_tokenizer.mjs:541)
    data = b"a\x80bc"
    cps = utf8_to_codepoints(data)
    # 0x80: else-branch: (0x80&7)<<18 | ('b'&0x3F)<<12 | ('c'&0x3F)<<6 | 0
    expected = [ord("a"), ((0x80 & 7) << 18) | ((0x62 & 0x3F) << 12) | ((0x63 & 0x3F) << 6)]
    assert cps.tolist() == expected


def test_native_boundaries_match_numpy():
    """The C++ rule engine must be byte-identical to the vectorized numpy
    implementation (which is itself pinned to the literal reference port)."""
    import numpy as np

    from gpu_bpe_tpu.pretok.boundaries import find_word_boundaries
    from gpu_bpe_tpu.unicode import get_backend

    b = get_backend()
    if not hasattr(b, "find_word_boundaries"):
        import pytest

        pytest.skip("native backend unavailable")
    texts = [
        "Hello world, it's 2026! I'll win 12345 games.",
        "line1\nline2\r\n  indented   spaces\tand\ttabs",
        "don't can't won't we're you've they'll it'S THEY'RE",
        "a1b2c3 123456789 ...!!! mixed.punct;here",
        "unicode: déjà vu, naïve café — em—dash 日本語テスト",
        "'starts with apostrophe 'll 're",
        "",
        "x",
    ]
    for t in texts:
        cps = np.array([ord(c) for c in t], dtype=np.uint32)
        classes = b.classify_codepoints(cps)
        ref = find_word_boundaries(cps, classes)
        got = b.find_word_boundaries(cps, classes)
        assert np.array_equal(ref, got), t
