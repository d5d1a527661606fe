"""Unicode backend: property tables, normalization, batch classification.

This subsystem replaces the reference's native decoder library
(`/root/reference/src/wasm/decoder.wasm` + `decoder.mjs`). Two
implementations share one interface:

* ``cpp`` — the C++ extension (generated property tables, NFC over UTF-8
  byte streams, batch classify); the production hot path.
* ``fallback`` — pure Python over ``unicodedata``; mirrors the reference's
  JS fallback chain and is always available.

``get_backend()`` returns the best available implementation.
"""

from __future__ import annotations

from .fallback import CharClass, PyUnicodeBackend, class_table
from .utf8 import utf8_byte_length, utf8_byte_lengths, utf8_to_codepoints

_BACKEND = None


def get_backend():
    """Best available Unicode backend (C++ if built, else Python)."""
    global _BACKEND
    if _BACKEND is None:
        try:
            from .cpp_backend import CppUnicodeBackend

            _BACKEND = CppUnicodeBackend()
        except Exception:
            _BACKEND = PyUnicodeBackend()
    return _BACKEND


__all__ = [
    "CharClass",
    "PyUnicodeBackend",
    "class_table",
    "get_backend",
    "utf8_byte_length",
    "utf8_byte_lengths",
    "utf8_to_codepoints",
]
