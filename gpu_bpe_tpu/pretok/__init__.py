"""Pre-tokenization: Unicode word-boundary detection for BPE training."""

from .boundaries import find_word_boundaries
from .byte_fallback import byte_char_class, tag_word_boundaries_bytes
from .pretokenizer import PreTokenizer

__all__ = [
    "PreTokenizer",
    "byte_char_class",
    "find_word_boundaries",
    "tag_word_boundaries_bytes",
]
