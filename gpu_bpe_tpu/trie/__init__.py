"""Trie compilation + binary artifact IO (v3 format, v2 legacy read)."""

from .compile import (
    FlatTrie,
    TrieHeader,
    build_flat_trie,
    compile_vocab_to_trie,
    parse_header,
    parse_trie,
    serialize_trie,
)

__all__ = [
    "FlatTrie",
    "TrieHeader",
    "build_flat_trie",
    "compile_vocab_to_trie",
    "parse_header",
    "parse_trie",
    "serialize_trie",
]
