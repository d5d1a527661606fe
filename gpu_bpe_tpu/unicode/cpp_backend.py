"""ctypes binding over the native decoder library.

Same interface as fallback.PyUnicodeBackend (the reference's decoder.mjs API
over decoder.wasm — here a g++-built shared library over generated tables).
Adds the fused ``pretokenize_prepare`` hot path: NFC + classify + byte
offsets in one native pass.
"""

from __future__ import annotations

import ctypes as C

import numpy as np

from .fallback import PyUnicodeBackend


def _load():
    from .cpp.build import build

    lib = C.CDLL(str(build()))
    lib.decoder_init.restype = C.c_int
    lib.decoder_get_unicode_version.restype = C.c_char_p
    for name in (
        "decoder_get_category decoder_is_valid decoder_is_assigned decoder_is_surrogate "
        "decoder_is_noncharacter decoder_is_private_use decoder_is_letter decoder_is_mark "
        "decoder_is_digit decoder_is_number decoder_is_punctuation decoder_is_symbol "
        "decoder_is_separator decoder_is_control decoder_is_format decoder_is_uppercase "
        "decoder_is_lowercase decoder_is_titlecase decoder_is_whitespace "
        "decoder_is_alphanumeric decoder_is_combining decoder_get_combining_class"
    ).split():
        fn = getattr(lib, name)
        fn.argtypes = [C.c_uint32]
        fn.restype = C.c_int
    for name in "decoder_to_upper decoder_to_lower decoder_to_title decoder_case_fold".split():
        fn = getattr(lib, name)
        fn.argtypes = [C.c_uint32]
        fn.restype = C.c_uint32
    lib.decoder_compose.argtypes = [C.c_uint32, C.c_uint32]
    lib.decoder_compose.restype = C.c_int64
    lib.decoder_decompose.argtypes = [C.c_uint32, C.POINTER(C.c_uint32), C.c_int]
    lib.decoder_decompose.restype = C.c_int
    lib.decoder_is_valid_utf8.argtypes = [C.c_char_p, C.c_int64]
    lib.decoder_is_valid_utf8.restype = C.c_int
    lib.decoder_utf8_char_count.argtypes = [C.c_char_p, C.c_int64]
    lib.decoder_utf8_char_count.restype = C.c_int64
    lib.decoder_normalize_utf8.argtypes = [
        C.c_char_p, C.c_int64, C.c_int,
        C.POINTER(C.c_uint8), C.c_int64, C.POINTER(C.c_int64),
    ]
    lib.decoder_normalize_utf8.restype = C.c_int
    lib.decoder_is_normalized_utf8.argtypes = [C.c_char_p, C.c_int64, C.c_int]
    lib.decoder_is_normalized_utf8.restype = C.c_int
    lib.decoder_classify_codepoints.argtypes = [
        C.c_char_p, C.c_int64, C.POINTER(C.c_uint8), C.c_int64, C.POINTER(C.c_int64),
    ]
    lib.decoder_classify_codepoints.restype = C.c_int
    lib.decoder_classify_utf32.argtypes = [C.POINTER(C.c_uint32), C.c_int64, C.POINTER(C.c_uint8)]
    lib.decoder_classify_utf32.restype = None
    lib.decoder_pretokenize_prepare.argtypes = [
        C.c_char_p, C.c_int64,
        C.POINTER(C.c_uint8), C.c_int64, C.POINTER(C.c_int64),
        C.POINTER(C.c_uint32), C.POINTER(C.c_uint8), C.POINTER(C.c_uint32),
        C.c_int64, C.POINTER(C.c_int64),
    ]
    lib.decoder_pretokenize_prepare.restype = C.c_int
    for name in "decoder_count_graphemes decoder_count_words decoder_count_sentences".split():
        fn = getattr(lib, name)
        fn.argtypes = [C.POINTER(C.c_uint32), C.c_int64]
        fn.restype = C.c_int64
    for name in (
        "decoder_get_script decoder_get_block decoder_is_identifier_start "
        "decoder_is_identifier_continue decoder_is_pattern_syntax "
        "decoder_is_pattern_whitespace"
    ).split():
        fn = getattr(lib, name)
        fn.argtypes = [C.c_uint32]
        fn.restype = C.c_int
    lib.decoder_is_in_block.argtypes = [C.c_uint32, C.c_int]
    lib.decoder_is_in_block.restype = C.c_int
    lib.decoder_is_suspicious.argtypes = [C.POINTER(C.c_uint32), C.c_int64]
    lib.decoder_is_suspicious.restype = C.c_int
    lib.decoder_init()
    return lib


_FORMS = {"NFC": 0, "NFD": 1, "NFKC": 2, "NFKD": 3}


class CppUnicodeBackend(PyUnicodeBackend):
    """Native backend; overrides the hot paths, inherits the rest."""

    name = "cpp-decoder"

    def __init__(self):
        self._lib = _load()

    @property
    def unicode_version(self) -> str:
        return self._lib.decoder_get_unicode_version().decode()

    # ── hot paths ────────────────────────────────────────────────────
    def normalize_bytes(self, data: bytes, form: int | str = "NFC") -> bytes:
        data = bytes(data)
        if isinstance(form, str):
            form = _FORMS[form]
        if form >= 2:  # compatibility forms: defer to Python tables for now
            return super().normalize_bytes(data, form)
        cap = len(data) * 4 + 16
        out = np.empty(cap, dtype=np.uint8)
        out_len = C.c_int64(0)
        rc = self._lib.decoder_normalize_utf8(
            data, len(data), form,
            out.ctypes.data_as(C.POINTER(C.c_uint8)), cap, C.byref(out_len),
        )
        if rc == -3:
            raise UnicodeDecodeError("utf-8", data, 0, 1, "invalid UTF-8 (native decoder)")
        if rc != 0:
            raise RuntimeError(f"decoder_normalize_utf8 failed: {rc}")
        return out[: out_len.value].tobytes()

    def normalize(self, text: str, form: int | str = "NFC") -> str:
        if isinstance(form, str):
            form = _FORMS[form]
        if form >= 2:
            return super().normalize(text, form)
        return self.normalize_bytes(text.encode("utf-8"), form).decode("utf-8")

    def classify_bytes(self, data: bytes):
        data = bytes(data)
        cap = max(len(data), 1)
        classes = np.empty(cap, dtype=np.uint8)
        count = C.c_int64(0)
        rc = self._lib.decoder_classify_codepoints(
            data, len(data), classes.ctypes.data_as(C.POINTER(C.c_uint8)), cap, C.byref(count)
        )
        if rc != 0:
            raise UnicodeDecodeError("utf-8", data, 0, 1, "invalid UTF-8 (native decoder)")
        return classes[: count.value], count.value

    def classify_codepoints(self, codepoints) -> np.ndarray:
        cps = np.ascontiguousarray(np.asarray(codepoints, dtype=np.uint32))
        out = np.empty(len(cps), dtype=np.uint8)
        if len(cps):
            self._lib.decoder_classify_utf32(
                cps.ctypes.data_as(C.POINTER(C.c_uint32)), len(cps),
                out.ctypes.data_as(C.POINTER(C.c_uint8)),
            )
        return out

    def pretokenize_prepare(self, data: bytes):
        """Fused NFC + classify + offsets.

        Returns (normalized bytes, codepoints, classes, byte offsets).
        Raises on invalid UTF-8 (callers fall back, matching the reference
        chain in pre_tokenizer.mjs:463-469).
        """
        data = bytes(data)
        out_cap = len(data) * 4 + 16
        cp_cap = max(len(data) * 4 + 16, 16)
        out = np.empty(out_cap, dtype=np.uint8)
        cps = np.empty(cp_cap, dtype=np.uint32)
        classes = np.empty(cp_cap, dtype=np.uint8)
        offsets = np.empty(cp_cap, dtype=np.uint32)
        out_len = C.c_int64(0)
        cp_count = C.c_int64(0)
        rc = self._lib.decoder_pretokenize_prepare(
            data, len(data),
            out.ctypes.data_as(C.POINTER(C.c_uint8)), out_cap, C.byref(out_len),
            cps.ctypes.data_as(C.POINTER(C.c_uint32)),
            classes.ctypes.data_as(C.POINTER(C.c_uint8)),
            offsets.ctypes.data_as(C.POINTER(C.c_uint32)), cp_cap, C.byref(cp_count),
        )
        if rc == -3:
            raise UnicodeDecodeError("utf-8", data, 0, 1, "invalid UTF-8 (native decoder)")
        if rc != 0:
            raise RuntimeError(f"decoder_pretokenize_prepare failed: {rc}")
        n = cp_count.value
        return (
            out[: out_len.value].tobytes(),
            cps[:n].copy(),
            classes[:n].copy(),
            offsets[:n].copy(),
        )

    # ── predicates via native lib ────────────────────────────────────
    def is_letter(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_letter(cp))

    def is_mark(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_mark(cp))

    def is_digit(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_digit(cp))

    def is_number(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_number(cp))

    def is_punctuation(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_punctuation(cp))

    def is_symbol(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_symbol(cp))

    def is_whitespace(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_whitespace(cp))

    def to_upper(self, cp: int) -> int:
        return self._lib.decoder_to_upper(cp)

    def to_lower(self, cp: int) -> int:
        return self._lib.decoder_to_lower(cp)

    def case_fold(self, cp: int) -> int:
        return self._lib.decoder_case_fold(cp)

    def compose(self, a: int, b: int) -> int:
        return self._lib.decoder_compose(a, b)

    def is_combining(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_combining(cp))

    def combining_class(self, cp: int) -> int:
        return self._lib.decoder_get_combining_class(cp)

    def is_valid_utf8(self, data: bytes) -> bool:
        data = bytes(data)
        return bool(self._lib.decoder_is_valid_utf8(data, len(data)))

    # ── scripts / blocks / identifier security (decoder.mjs:368-383) ──
    def get_script(self, cp: int) -> int:
        return self._lib.decoder_get_script(cp)

    def get_block(self, cp: int) -> int:
        return self._lib.decoder_get_block(cp)

    def is_in_block(self, cp: int, block: int) -> bool:
        return bool(self._lib.decoder_is_in_block(cp, block))

    def is_identifier_start(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_identifier_start(cp))

    def is_identifier_continue(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_identifier_continue(cp))

    def is_pattern_syntax(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_pattern_syntax(cp))

    def is_pattern_whitespace(self, cp: int) -> bool:
        return bool(self._lib.decoder_is_pattern_whitespace(cp))

    def is_suspicious(self, s: str) -> bool:
        cps = np.array([ord(c) for c in s], dtype=np.uint32)
        if not len(cps):
            return False
        return bool(
            self._lib.decoder_is_suspicious(cps.ctypes.data_as(C.POINTER(C.c_uint32)), len(cps))
        )

    def count_graphemes(self, s: str) -> int:
        cps = np.array([ord(c) for c in s], dtype=np.uint32)
        if not len(cps):
            return 0
        return self._lib.decoder_count_graphemes(
            cps.ctypes.data_as(C.POINTER(C.c_uint32)), len(cps)
        )

    def count_words(self, s: str) -> int:
        cps = np.array([ord(c) for c in s], dtype=np.uint32)
        if not len(cps):
            return 0
        return self._lib.decoder_count_words(cps.ctypes.data_as(C.POINTER(C.c_uint32)), len(cps))

    def count_sentences(self, s: str) -> int:
        cps = np.array([ord(c) for c in s], dtype=np.uint32)
        if not len(cps):
            return 0
        return self._lib.decoder_count_sentences(
            cps.ctypes.data_as(C.POINTER(C.c_uint32)), len(cps)
        )
