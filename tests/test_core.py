"""Oracle trainer, vocab, encoders, model IO."""

import json

import numpy as np
import pytest

from gpu_bpe_tpu.constants import WORD_START_BIT, pack_pair
from gpu_bpe_tpu.core import (
    BPEModel,
    GreedyTrieEncoder,
    ReferenceTrainer,
    Vocab,
    apply_merge,
    best_pair,
    bytes_to_display_string,
    bytes_to_symbols,
    count_pairs,
    decode_tokens,
    encode_merge_order,
    read_dxft,
    tag_word_boundaries,
    write_dxft,
)
from gpu_bpe_tpu.pretok import PreTokenizer


def _prepare(text: str) -> np.ndarray:
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize(text)
    return tag_word_boundaries(bytes_to_symbols(data), starts)


class TestVocab:
    def test_base_tokens(self):
        v = Vocab()
        assert v.size == 256
        assert v.entries[65] == b"A"
        assert v.next_token_id == 256

    def test_display_strings(self):
        assert bytes_to_display_string(b" ") == "▁"
        assert bytes_to_display_string(b"\n") == "\\n"
        assert bytes_to_display_string(b"\x00") == "<0x00>"
        assert bytes_to_display_string(b"ab") == "ab"
        assert bytes_to_display_string("ğ".encode()) == "ğ"
        assert bytes_to_display_string(b"\xc4") == "<0xC4>"  # orphan lead
        assert bytes_to_display_string(b"\x9f") == "<0x9F>"  # orphan continuation

    def test_add_merge(self):
        v = Vocab()
        tid = v.add_merge(ord("a"), ord("b"))
        assert tid == 256
        assert v.entries[256] == b"ab"
        tid2 = v.add_merge(256, ord("c"))
        assert v.entries[tid2] == b"abc"

    def test_export_text(self):
        v = Vocab()
        v.add_merge(ord("h"), ord("i"))
        text = v.export_text()
        assert "256\thi\t[104,105]" in text


class TestPairCounting:
    def test_basic_counts(self):
        symbols = bytes_to_symbols(b"abab")
        pairs, counts = count_pairs(symbols)
        d = dict(zip(pairs.tolist(), counts.tolist()))
        assert d[pack_pair(ord("a"), ord("b"))] == 2
        assert d[pack_pair(ord("b"), ord("a"))] == 1

    def test_word_start_blocks_pair(self):
        symbols = bytes_to_symbols(b"ab")
        symbols[1] |= WORD_START_BIT
        pairs, _ = count_pairs(symbols)
        assert len(pairs) == 0

    def test_nul_never_counts(self):
        symbols = bytes_to_symbols(b"a\x00b")
        pairs, _ = count_pairs(symbols)
        assert len(pairs) == 0

    def test_tie_break_smaller_pair_id(self):
        symbols = bytes_to_symbols(b"zzyxzzyx")  # wait: construct explicit tie
        symbols = bytes_to_symbols(b"ba" + b"ab")  # pairs: ba, aa, ab → each 1... use counts
        symbols = bytes_to_symbols(b"abXab" + b"cdXcd")
        pairs, counts = count_pairs(symbols)
        pair, count = best_pair(pairs, counts)
        # (a,b) and (c,d) both occur twice; (a,b) has the smaller packed id
        assert count >= 2
        assert pair == pack_pair(ord("a"), ord("b"))

    def test_weighted_counts(self):
        symbols = bytes_to_symbols(b"ab")
        weights = np.array([3, 0], dtype=np.int64)
        pairs, counts = count_pairs(symbols, weights)
        assert counts.tolist() == [3]


class TestMergeSemantics:
    def test_simple_merge(self):
        out = apply_merge(bytes_to_symbols(b"abab"), ord("a"), ord("b"), 256)
        assert out.tolist() == [256, 256]

    def test_overlap_quirk_aaa(self):
        # Reference semantics: "aaa" under (a,a)→Z collapses to just [Z]
        out = apply_merge(bytes_to_symbols(b"aaa"), ord("a"), ord("a"), 256)
        assert out.tolist() == [256]

    def test_overlap_quirk_aaaa(self):
        out = apply_merge(bytes_to_symbols(b"aaaa"), ord("a"), ord("a"), 256)
        assert out.tolist() == [256]

    def test_word_start_preserved_on_a_side(self):
        symbols = bytes_to_symbols(b"ab")
        symbols[0] |= WORD_START_BIT
        out = apply_merge(symbols, ord("a"), ord("b"), 256)
        assert out.tolist() == [256 | WORD_START_BIT]

    def test_word_start_blocks_merge(self):
        symbols = bytes_to_symbols(b"ab")
        symbols[1] |= WORD_START_BIT
        out = apply_merge(symbols, ord("a"), ord("b"), 256)
        assert out.tolist() == symbols.tolist()


class TestReferenceTrainer:
    def test_deterministic(self, english_text):
        sym = _prepare(english_text[:20000])
        r1 = ReferenceTrainer().train(sym.copy(), target_vocab_size=300)
        r2 = ReferenceTrainer().train(sym.copy(), target_vocab_size=300)
        assert r1.merges == r2.merges

    def test_early_stop_on_count_below_2(self):
        sym = bytes_to_symbols(b"abcdefg")  # all pairs count 1
        result = ReferenceTrainer().train(sym, target_vocab_size=300)
        assert result.merges == []

    def test_trains_expected_merge_first(self):
        sym = bytes_to_symbols(b"ababab")
        result = ReferenceTrainer().train(sym, target_vocab_size=258)
        # (a,b) count 3 beats (b,a) count 2
        assert result.merges[0][:2] == (ord("a"), ord("b"))

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            ReferenceTrainer().train(np.zeros(0, np.uint32), target_vocab_size=300)

    def test_vocab_reconstruction(self, english_text):
        sym = _prepare(english_text[:10000])
        result = ReferenceTrainer().train(sym, target_vocab_size=280)
        # every merged entry equals concat of its parents
        for a, b, new_id in result.merges:
            assert result.vocab[new_id] == result.vocab[a] + result.vocab[b]

    def test_progress_callback(self, english_text):
        sym = _prepare(english_text[:5000])
        events = []
        ReferenceTrainer().train(
            sym, target_vocab_size=280, on_progress=events.append, progress_every=8
        )
        assert events
        assert {"mergeIndex", "totalMerges", "mergeString", "bestCount", "symbolCount",
                "mergesPerSecond"} <= set(events[0])


class TestEncoders:
    def _model(self, text: str, vocab_size: int = 300) -> BPEModel:
        result = ReferenceTrainer().train(_prepare(text), target_vocab_size=vocab_size)
        return BPEModel(vocab=result.vocab, merges=result.merges)

    def test_merge_order_roundtrip(self, english_text):
        model = self._model(english_text[:20000])
        text = "the quick brown fox don't stop"
        tokens = encode_merge_order(text.encode(), model.merges)
        assert decode_tokens(tokens, model.vocab) == text.encode()

    def test_greedy_roundtrip(self, english_text):
        model = self._model(english_text[:20000])
        enc = GreedyTrieEncoder(model.vocab)
        text = "the quick brown fox don't stop 12345"
        tokens = enc.encode(text.encode())
        assert decode_tokens(tokens, model.vocab) == text.encode()

    def test_greedy_longest_match(self):
        vocab = [bytes([i]) for i in range(256)] + [b"ab", b"abc"]
        enc = GreedyTrieEncoder(vocab)
        assert enc.encode(b"abc").tolist() == [257]
        assert enc.encode(b"abd").tolist() == [256, ord("d")]

    def test_greedy_duplicate_entry_last_wins(self):
        vocab = [bytes([i]) for i in range(256)] + [b"xy", b"xy"]
        enc = GreedyTrieEncoder(vocab)
        assert enc.encode(b"xy").tolist() == [257]

    def test_greedy_chunk_boundary_artifact(self):
        # token split across a chunk boundary is part of the conformance surface
        vocab = [bytes([i]) for i in range(256)] + [b"ab"]
        enc = GreedyTrieEncoder(vocab, chunk_size=3)
        # "xxab" with chunk=3: chunk1="xxa", chunk2="b" → a and b split
        assert enc.encode(b"xxab").tolist() == [ord("x"), ord("x"), ord("a"), ord("b")]
        # inside one chunk the merge applies
        assert enc.encode(b"xab").tolist() == [ord("x"), 256]

    def test_greedy_vs_merge_order_divergence_fixture(self):
        """The committed divergence corpus (SURVEY §4; docs/CONFORMANCE.md
        "Merge-order encoding" vs "Greedy trie encoding"): the two encode
        semantics the reference ships (tokenizer-manager.js:43-58 vs
        tokenize.wgsl:123-172) DISAGREE on this input, by design.

        Merges learned in order: (b,c)->256 "bc", (256,d)->257 "bcd",
        (a,b)->258 "ab". On input "abcd":
        * merge-order replay applies rank 0 first: b,c -> 256, then rank 1:
          256,d -> 257 — yielding [a, "bcd"] = [97, 257];
        * greedy longest-match starts at position 0 and takes the longest
          vocab entry there — "ab" — stranding "c","d" as raw bytes:
          [258, 99, 100].
        Both decode back to the input; the token streams differ."""
        merges = [(98, 99, 256), (256, 100, 257), (97, 98, 258)]
        vocab = [bytes([i]) for i in range(256)] + [b"bc", b"bcd", b"ab"]
        data = b"abcd"

        mo = encode_merge_order(data, merges)
        assert mo == [97, 257]
        from gpu_bpe_tpu.core.encoder_ref import _encode_merge_order_naive

        assert _encode_merge_order_naive(data, merges) == mo

        greedy = GreedyTrieEncoder(vocab).encode(data).tolist()
        assert greedy == [258, 99, 100]
        assert greedy != mo  # the divergence is the point

        # the TPU bulk tokenizer implements GREEDY semantics and must agree
        # with the CPU greedy oracle on the divergent input
        from gpu_bpe_tpu.ops.tokenize import TPUTokenizer

        assert TPUTokenizer(vocab).encode_bytes(data).tolist() == greedy

        assert decode_tokens(mo, vocab) == data
        assert decode_tokens(greedy, vocab) == data

    def test_decode_unknown_token_replacement(self):
        vocab = [bytes([i]) for i in range(256)]
        out = decode_tokens([65, 999999], vocab)
        assert out == b"A\xef\xbf\xbd"

    def test_fast_merge_order_equals_naive_trained(self, english_text):
        from gpu_bpe_tpu.core.encoder_ref import _encode_merge_order_naive

        model = self._model(english_text[:20000])
        for text in (
            "the quick brown fox don't stop",
            "aaaa eeee oooo tttt",
            english_text[:3000],
            "",
            "x",
        ):
            data = text.encode()
            assert encode_merge_order(data, model.merges) == _encode_merge_order_naive(
                data, model.merges
            ), text[:40]

    def test_fast_merge_order_equals_naive_fuzz(self, rng):
        """Heap lowest-rank-first vs literal sequential passes on adversarial
        random rule chains (self-overlapping pairs, chained new ids)."""
        from gpu_bpe_tpu.core.encoder_ref import _encode_merge_order_naive

        for trial in range(40):
            alpha = int(rng.integers(2, 5))  # tiny alphabet → dense overlaps
            data = bytes(rng.integers(97, 97 + alpha, size=int(rng.integers(0, 200))))
            merges = []
            next_id = 256
            pool = list(range(97, 97 + alpha))
            for _ in range(int(rng.integers(1, 24))):
                a = int(pool[rng.integers(0, len(pool))])
                b = int(pool[rng.integers(0, len(pool))])
                merges.append((a, b, next_id))
                pool.append(next_id)
                next_id += 1
            assert encode_merge_order(data, merges) == _encode_merge_order_naive(
                data, merges
            ), (trial, data[:40], merges)


class TestModelIO:
    def test_json_roundtrip(self, english_text):
        result = ReferenceTrainer().train(_prepare(english_text[:10000]), target_vocab_size=280)
        model = BPEModel(vocab=result.vocab, merges=result.merges)
        restored = BPEModel.from_json(model.to_json())
        assert restored.vocab == model.vocab
        assert restored.merges == model.merges

    def test_json_schema(self):
        model = BPEModel(vocab=[bytes([i]) for i in range(256)], merges=[])
        obj = json.loads(model.to_json())
        assert obj["version"] == 1
        assert obj["vocabSize"] == 256
        assert obj["vocab"][65] == [65]
        assert obj["merges"] == []

    def test_json_missing_fields(self):
        with pytest.raises(ValueError):
            BPEModel.from_json('{"version": 1}')

    def test_dxft_roundtrip(self):
        model = BPEModel(vocab=[bytes([i]) for i in range(256)] + [b"ab"], merges=[(97, 98, 256)])
        tokens = np.array([1, 2, 3, 256], dtype=np.uint32)
        blob = write_dxft(tokens, model)
        rtokens, rmodel, header = read_dxft(blob)
        assert rtokens.tolist() == tokens.tolist()
        assert rmodel.vocab == model.vocab
        assert header["vocabSize"] == 257
        assert header["tokenCount"] == 4

    def test_dxft_magic_check(self):
        with pytest.raises(ValueError):
            read_dxft(b"\x00" * 32)
