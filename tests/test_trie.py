"""Trie compile / serialize / parse: format conformance + round trips."""

import struct

import numpy as np
import pytest

from gpu_bpe_tpu.constants import INVALID_TOKEN, TRIE_HEADER_SIZE, TRIE_MAGIC
from gpu_bpe_tpu.core import GreedyTrieEncoder, ReferenceTrainer, bytes_to_symbols
from gpu_bpe_tpu.trie import (
    build_flat_trie,
    compile_vocab_to_trie,
    parse_header,
    parse_trie,
)


def _base_vocab():
    return [bytes([i]) for i in range(256)]


class TestCompile:
    def test_header_fields(self):
        vocab = _base_vocab() + [b"ab", b"abc"]
        blob = compile_vocab_to_trie(vocab)
        h = parse_header(blob)
        assert h.version == 3
        assert h.max_token_len == 3
        assert h.vocab_size == 258
        # root + 256 depth-1 + 'ab' node + 'abc' node
        assert h.node_count == 259
        assert h.edge_count == 258

    def test_bfs_order_and_sorted_children(self):
        vocab = _base_vocab()
        trie = build_flat_trie(vocab)
        # root is node 0, has 256 children with sorted symbols
        assert trie.nodes[0, 0] == 0
        assert trie.nodes[0, 1] == 256
        assert trie.nodes[0, 2] == INVALID_TOKEN
        assert trie.edges[:256, 0].tolist() == list(range(256))
        # depth-1 node for byte k is token k
        for k in (0, 65, 255):
            target = trie.edges[k, 1]
            assert trie.nodes[target, 2] == k

    def test_duplicate_sequence_last_id_wins(self):
        vocab = _base_vocab() + [b"zz", b"zz"]
        trie = build_flat_trie(vocab)
        # find the 'zz' node
        z1 = trie.edges[trie.nodes[0, 0] + ord("z"), 1]
        fc, nc, _ = trie.nodes[z1]
        assert nc == 1
        zz = trie.edges[fc, 1]
        assert trie.nodes[zz, 2] == 257

    def test_empty_entries_skipped(self):
        vocab = _base_vocab() + [b""]
        trie = build_flat_trie(vocab)
        assert trie.vocab_size == 257
        assert len(trie.nodes) == 257  # no node added for the empty entry

    def test_binary_roundtrip(self):
        vocab = _base_vocab() + [b"ab", b"abc", b" the", b"zz"]
        blob = compile_vocab_to_trie(vocab)
        trie = parse_trie(blob)
        rebuilt = build_flat_trie(vocab)
        assert np.array_equal(trie.nodes, rebuilt.nodes)
        assert np.array_equal(trie.edges, rebuilt.edges)

    def test_binary_layout_exact(self):
        """Byte-level layout: node stride 12, edge stride 8, symbol in byte 0."""
        vocab = [b"a"]
        blob = compile_vocab_to_trie(vocab)
        magic, version, nc, ec = struct.unpack("<4I", blob[:16])
        assert magic == TRIE_MAGIC and version == 3
        assert nc == 2 and ec == 1
        node0 = struct.unpack("<3I", blob[TRIE_HEADER_SIZE : TRIE_HEADER_SIZE + 12])
        assert node0 == (0, 1, INVALID_TOKEN)
        edge0_off = TRIE_HEADER_SIZE + 2 * 12
        assert blob[edge0_off] == ord("a")
        assert blob[edge0_off + 1 : edge0_off + 4] == b"\x00\x00\x00"
        (target,) = struct.unpack("<I", blob[edge0_off + 4 : edge0_off + 8])
        assert target == 1

    def test_v2_legacy_parse(self):
        # hand-build a v2 trie: root with one child 'a' → token 0
        header = struct.pack("<7I", TRIE_MAGIC, 2, 2, 1, 1, 1, 0)
        nodes = struct.pack("<4H", 0, 1, 0xFFFF, 0) + struct.pack("<4H", 0, 0, 0, 0)
        edges = struct.pack("<2H", ord("a"), 1)
        trie = parse_trie(header + nodes + edges)
        assert trie.nodes[0, 2] == INVALID_TOKEN
        assert trie.nodes[1, 2] == 0
        assert trie.edges[0].tolist() == [ord("a"), 1]

    def test_invalid_magic(self):
        with pytest.raises(ValueError):
            parse_header(b"\x00" * TRIE_HEADER_SIZE)

    def test_truncated(self):
        blob = compile_vocab_to_trie(_base_vocab())
        with pytest.raises(ValueError):
            parse_trie(blob[:100])


class TestTrieVsGreedyEncoder:
    def test_trie_walk_matches_dict_encoder(self, english_text):
        sym = bytes_to_symbols(english_text[:8000].encode())
        result = ReferenceTrainer().train(sym, target_vocab_size=300)
        trie = build_flat_trie(result.vocab)

        def trie_longest_match(data: bytes, pos: int, end: int):
            node = 0
            best = (-1, pos)
            p = pos
            while p < end:
                fc, nc, _ = trie.nodes[node]
                lo, hi = int(fc), int(fc) + int(nc)
                sym_b = data[p]
                row = trie.edges[lo:hi]
                idx = np.searchsorted(row[:, 0], sym_b)
                if idx >= len(row) or row[idx, 0] != sym_b:
                    break
                node = int(row[idx, 1])
                p += 1
                tid = int(trie.nodes[node, 2])
                if tid != INVALID_TOKEN:
                    best = (tid, p)
            return best

        enc = GreedyTrieEncoder(result.vocab)
        data = english_text[:2000].encode()
        out = []
        cs = enc.chunk_size
        for chunk_start in range(0, len(data), cs):
            chunk_end = min(chunk_start + cs, len(data))
            pos = chunk_start
            while pos < chunk_end:
                tid, newpos = trie_longest_match(data, pos, chunk_end)
                if tid >= 0:
                    out.append(tid)
                    pos = newpos
                else:
                    out.append(data[pos])
                    pos += 1
        assert out == enc.encode(data).tolist()
