"""TPU tokenizer conformance vs the CPU greedy reference encoder."""

import os

import numpy as np
import pytest

from gpu_bpe_tpu.core import GreedyTrieEncoder, ReferenceTrainer, bytes_to_symbols, tag_word_boundaries
from gpu_bpe_tpu.ops.tokenize import MatchTables, TPUTokenizer
from gpu_bpe_tpu.pretok import PreTokenizer


@pytest.fixture(scope="module")
def model(english_text):
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize(english_text[:15000])
    sym = tag_word_boundaries(bytes_to_symbols(data), starts)
    return ReferenceTrainer().train(sym, target_vocab_size=400)


def _base_vocab():
    return [bytes([i]) for i in range(256)]


class TestMatchTables:
    def test_lengths_and_keys(self):
        vocab = _base_vocab() + [b"ab", b"abc", b" the", b"abcdef"]
        t = MatchTables.from_vocab(vocab)
        assert t.lengths == [2, 3, 4, 6]
        assert t.max_token_len == 6
        assert t.byte_ids_identity

    def test_byte_ids_non_identity(self):
        vocab = [b"x", b"y"]
        t = MatchTables.from_vocab(vocab)
        assert not t.byte_ids_identity
        assert t.byte_ids[ord("x")] == 0
        assert t.byte_ids[ord("a")] == -1


class TestConformance:
    def _check(self, vocab, data: bytes, chunk_size=None):
        ref = GreedyTrieEncoder(vocab, chunk_size=chunk_size)
        tpu = TPUTokenizer(vocab, chunk_size=chunk_size)
        assert tpu.chunk_size == ref.chunk_size
        expected = ref.encode(data)
        got = tpu.encode_bytes(data)
        assert got.tolist() == expected.tolist()

    def test_base_vocab_identity(self):
        data = b"hello world"
        self._check(_base_vocab(), data)

    def test_trained_vocab(self, model, english_text):
        self._check(model.vocab, english_text[:6000].encode())

    def test_longest_match_priority(self):
        vocab = _base_vocab() + [b"ab", b"abc", b"abcd"]
        self._check(vocab, b"abcd abc ab a abcdabcd")

    def test_chunk_boundary_artifact(self):
        vocab = _base_vocab() + [b"ab"]
        # chunk=512: place "ab" straddling the 512 boundary
        data = b"x" * 511 + b"ab" + b"x" * 100
        self._check(vocab, data, chunk_size=512)

    def test_in_chunk_shorter_match_fallback(self):
        # "abcd" would match but crosses the chunk end; reference then takes "ab"
        vocab = _base_vocab() + [b"ab", b"abcd"]
        data = b"x" * 510 + b"abcd" + b"y" * 50
        self._check(vocab, data, chunk_size=512)

    def test_missing_byte_token_fallback(self):
        # vocab without base bytes: raw byte values emitted
        vocab = [b"ab"]
        ref = GreedyTrieEncoder(vocab, chunk_size=512)
        tpu = TPUTokenizer(vocab, chunk_size=512)
        data = b"abxab"
        assert tpu.encode_bytes(data).tolist() == ref.encode(data).tolist() == [0, ord("x"), 0]

    def test_long_tokens(self):
        vocab = _base_vocab() + [b"internationalization", b"internation", b"tion"]
        self._check(vocab, b"internationalization internation nation tion")

    def test_empty(self):
        assert TPUTokenizer(_base_vocab()).encode_bytes(b"").tolist() == []

    def test_multipass_slicing(self):
        vocab = _base_vocab() + [b"ab"]
        tpu = TPUTokenizer(vocab, chunk_size=512, max_pass_bytes=2048)
        ref = GreedyTrieEncoder(vocab, chunk_size=512)
        data = (b"ab" * 3000)[:5000]
        assert tpu.encode_bytes(data).tolist() == ref.encode(data).tolist()

    def test_decode_roundtrip(self, model):
        tpu = TPUTokenizer(model.vocab)
        data = "the quick brown fox don't stop".encode()
        tokens = tpu.encode_bytes(data)
        assert tpu.decode(tokens) == data

    def test_nul_and_high_bytes(self, model):
        data = bytes(range(256)) * 4
        self._check(model.vocab, data)


class TestIntervalStabbingJoin:
    """Large vocabs switch the match table to the sorted interval-stabbing
    join (O((N+V)log) instead of O(N*V)); output must stay byte-identical
    to the greedy-trie oracle."""

    def _train_vocab(self, n_tokens):
        # synthesize a deterministic large vocab of distinct multi-byte tokens
        rng = np.random.default_rng(9)
        toks = {bytes([b]) for b in range(256)}
        vocab = [bytes([b]) for b in range(256)]
        while len(vocab) < n_tokens:
            ln = int(rng.integers(2, 12))
            t = bytes(rng.integers(97, 107, size=ln).tolist())
            if t not in toks:
                toks.add(t)
                vocab.append(t)
        return vocab

    def test_stab_matches_oracle(self):
        from gpu_bpe_tpu.core.encoder_ref import GreedyTrieEncoder
        from gpu_bpe_tpu.ops.tokenize import TPUTokenizer

        vocab = self._train_vocab(4000)  # > _DENSE_VOCAB_CUTOFF
        rng = np.random.default_rng(1)
        data = bytes(rng.integers(97, 107, size=20000).tolist())
        tok = TPUTokenizer(vocab)
        assert tok.tables.stab is not None  # stab path engaged
        ref = GreedyTrieEncoder(vocab, chunk_size=tok.chunk_size).encode(data)
        got = tok.encode_bytes(data)
        assert np.array_equal(got, np.asarray(ref, dtype=np.uint32))

    def test_stab_with_long_tokens_and_nuls(self):
        from gpu_bpe_tpu.core.encoder_ref import GreedyTrieEncoder
        from gpu_bpe_tpu.ops.tokenize import TPUTokenizer

        vocab = self._train_vocab(3000)
        vocab += [b"x" * 20, b"x" * 24, b"ab\x00", b"ab\x00\x00", b"\x00\x00"]
        rng = np.random.default_rng(2)
        data = (bytes(rng.integers(97, 122, size=5000).tolist())
                + b"x" * 100 + b"ab\x00\x00ab\x00" + b"\x00" * 7)
        tok = TPUTokenizer(vocab)
        ref = GreedyTrieEncoder(vocab, chunk_size=tok.chunk_size).encode(data)
        got = tok.encode_bytes(data)
        assert np.array_equal(got, np.asarray(ref, dtype=np.uint32))


class TestTwoLevelStab:
    """Token lengths 9..14 are served by the second stab level (prefix
    groups + suffix intervals) instead of the dense join; lengths > 14
    stay dense. Output must stay byte-identical to the greedy oracle."""

    @pytest.fixture(autouse=True)
    def _force_deep_levels(self, monkeypatch):
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setattr(tz, "_LEVEL_MIN_TOKENS", 1)

    def _vocab_with_longs(self):
        rng = np.random.default_rng(5)
        toks = {bytes([b]) for b in range(256)}
        vocab = [bytes([b]) for b in range(256)]
        while len(vocab) < 2500:
            ln = int(rng.integers(2, 9))
            t = bytes(rng.integers(97, 105, size=ln).tolist())
            if t not in toks:
                toks.add(t)
                vocab.append(t)
        # long tokens with SHARED 8-byte prefixes (the prefix-group path),
        # nested suffixes, an exact-16, the 8-byte prefix itself as a
        # token, and a 17-byte token (dense-join fallback)
        longs = [
            b"prefixAA" + b"s",            # 9
            b"prefixAA" + b"suffi",        # 13
            b"prefixAA" + b"suffix",       # 14 (max two-level)
            b"prefixAA",                   # the shared prefix as its own token
            b"prefixBB" + b"tail",         # different group
            b"overlongtoken0",             # 14
            b"overlongtoken001",           # 16 -> dense join
        ]
        return vocab + longs

    def test_two_level_matches_oracle(self):
        vocab = self._vocab_with_longs()
        t = MatchTables.from_vocab(vocab)
        assert t.stab is not None and len(t.stab["levels"]) > 0
        assert t.dense_lengths == []  # 16-byte token now rides stab level 3
        rng = np.random.default_rng(6)
        filler = bytes(rng.integers(97, 105, size=3000).tolist())
        data = (
            filler
            + b"prefixAAsuffixprefixAAsuffiZZprefixAAsprefixAA"
            + b"prefixBBtailprefixBBtaiX"
            + b"overlongtoken001overlongtoken0x"
            + filler[:100]
        )
        tok = TPUTokenizer(vocab)
        ref = GreedyTrieEncoder(vocab, chunk_size=tok.chunk_size).encode(data)
        got = tok.encode_bytes(data)
        assert np.array_equal(got, np.asarray(ref, dtype=np.uint32))

    def test_long_token_at_chunk_boundary(self):
        vocab = self._vocab_with_longs()
        tok = TPUTokenizer(vocab, chunk_size=512)
        # place a 14-byte token straddling the 512-byte chunk boundary:
        # greedy semantics must split it (the reference artifact)
        data = b"a" * 504 + b"prefixAAsuffix" + b"b" * 100
        ref = GreedyTrieEncoder(vocab, chunk_size=512).encode(data)
        got = tok.encode_bytes(data)
        assert np.array_equal(got, np.asarray(ref, dtype=np.uint32))

    def test_fuzz_two_level(self):
        vocab = self._vocab_with_longs()
        tok = TPUTokenizer(vocab)
        rng = np.random.default_rng(7)
        pieces = [v for v in vocab[256:]] + [b"prefixA", b"prefixAAsuffi"]
        for trial in range(5):
            parts = [pieces[i] for i in rng.integers(0, len(pieces), size=400)]
            data = b"".join(parts)
            ref = GreedyTrieEncoder(vocab, chunk_size=tok.chunk_size).encode(data)
            got = tok.encode_bytes(data)
            assert np.array_equal(got, np.asarray(ref, dtype=np.uint32)), trial


class TestMultiLevelStab:
    """Token lengths 15..32 ride chained stab levels (6-byte group hops);
    lengths 33+ fall to the dense join, and vocabs with 32..63-byte max
    token length use the two-word wide walk instead of the gather
    fallback. All paths must stay byte-identical to the greedy oracle."""

    @pytest.fixture(autouse=True)
    def _force_deep_levels(self, monkeypatch):
        # production truncates levels that serve < _LEVEL_MIN_TOKENS
        # tokens (dense join is cheaper there); force full chaining so
        # these tests exercise the deep-level machinery
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setattr(tz, "_LEVEL_MIN_TOKENS", 1)

    def _vocab(self, extra=()):
        rng = np.random.default_rng(11)
        toks = {bytes([b]) for b in range(256)}
        vocab = [bytes([b]) for b in range(256)]
        while len(vocab) < 2500:
            ln = int(rng.integers(2, 9))
            t = bytes(rng.integers(97, 105, size=ln).tolist())
            if t not in toks:
                toks.add(t)
                vocab.append(t)
        longs = [
            b"the quick brown",          # 15 -> level 3
            b"the quick brown fox j",    # 21 -> level 4
            b"the quick brown fox jumps lover",  # 31 -> level 5
            b"the quick brown f",        # 17, shares level-3 group chain
            b"the quick brawn",          # 15, diverges inside level 3 window
            b"commonprefixiscommon",     # 20
            b"commonprefixisc",          # 15
            b"commonprefixi",            # 13 (level 2)
            b"commonpr",                 # 8-byte prefix as its own token
        ]
        return vocab + longs + list(extra)

    def _check(self, vocab, data, chunk_size=None):
        tok = TPUTokenizer(vocab, chunk_size=chunk_size)
        ref = GreedyTrieEncoder(vocab, chunk_size=tok.chunk_size).encode(data)
        got = tok.encode_bytes(data)
        assert np.array_equal(got, np.asarray(ref, dtype=np.uint32))
        return tok

    def test_chained_levels_cover_to_32(self):
        vocab = self._vocab()
        t = MatchTables.from_vocab(vocab)
        assert t.stab is not None
        assert t.stab["max_len"] == 32
        assert len(t.stab["levels"]) == 4  # coverage 14/20/26/32
        assert t.dense_lengths == []  # nothing left for the dense join

    def test_multi_level_matches_oracle(self):
        vocab = self._vocab()
        rng = np.random.default_rng(12)
        filler = bytes(rng.integers(97, 105, size=2000).tolist())
        probes = (
            b"the quick brown fox jumps loverXXthe quick brown fox jthe quick brown"
            b"the quick brawnthe quick brownZcommonprefixiscommoncommonprefixisc"
            b"commonprefixicommonprXcommonprefixiscommo"
        )
        self._check(vocab, filler + probes + filler[:257] + probes)

    def test_dense_join_beyond_32(self):
        vocab = self._vocab(extra=[b"A" * 40])
        t = MatchTables.from_vocab(vocab)
        assert t.dense_lengths == [40]
        data = b"A" * 100 + b"the quick brown fox jumps lover" + b"A" * 39
        self._check(vocab, data)

    def test_wide_walk_32_to_63(self):
        vocab = self._vocab(extra=[b"B" * 40, b"B" * 63])
        tok = TPUTokenizer(vocab)
        assert tok.tables.max_token_len == 63  # -> two-word wide walk
        data = b"B" * 200 + b"the quick brown fox jumps lover" + b"B" * 63
        self._check(vocab, data)

    def test_long_token_across_chunk_boundary(self):
        vocab = self._vocab()
        data = b"a" * 490 + b"the quick brown fox jumps lover" + b"b" * 100
        self._check(vocab, data, chunk_size=512)

    def test_level_truncation_default_threshold(self, monkeypatch):
        # with the production threshold, a handful of long tokens must NOT
        # spawn deep levels — their lengths go to the dense join instead,
        # and output stays identical
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setattr(tz, "_LEVEL_MIN_TOKENS", 512)
        vocab = self._vocab()  # 9 tokens longer than 8 bytes
        t = MatchTables.from_vocab(vocab)
        assert t.stab is not None and t.stab["levels"] == []
        assert t.stab["max_len"] == 8
        assert set(t.dense_lengths) == {len(v) for v in vocab if len(v) > 8}
        data = b"the quick brown fox jumps loverXXcommonprefixiscommonYY" * 20
        self._check(vocab, data)

    def test_fuzz_multi_level(self):
        vocab = self._vocab()
        tok = TPUTokenizer(vocab)
        rng = np.random.default_rng(13)
        pieces = vocab[2500:] + [b"the quick", b"the quick brown fox", b"commonprefix"]
        for trial in range(4):
            parts = [pieces[i] for i in rng.integers(0, len(pieces), size=300)]
            data = b"".join(parts)
            ref = GreedyTrieEncoder(vocab, chunk_size=tok.chunk_size).encode(data)
            got = tok.encode_bytes(data)
            assert np.array_equal(got, np.asarray(ref, dtype=np.uint32)), trial


class TestRankSpaceStab:
    """The TPU rank-space level chain (compact candidates -> join at C ->
    expand back) must be bitwise-equal to the full-width chain, including
    the lax.cond fallback when candidates exceed the C = n/8 capacity."""

    @pytest.fixture(autouse=True)
    def _force_deep_levels(self, monkeypatch):
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setattr(tz, "_LEVEL_MIN_TOKENS", 1)

    def _vocab(self):
        rng = np.random.default_rng(21)
        toks = {bytes([b]) for b in range(256)}
        vocab = [bytes([b]) for b in range(256)]
        while len(vocab) < 2600:
            ln = int(rng.integers(2, 9))
            t = bytes(rng.integers(97, 105, size=ln).tolist())
            if t not in toks:
                toks.add(t)
                vocab.append(t)
        return vocab + [
            b"the quick brown",                  # 15 -> level 3
            b"the quick brown fox j",            # 21 -> level 4
            b"the quick brown fox jumps lover",  # 31 -> level 5
            b"commonprefixiscommon",             # 20
            b"prefixAAsuffix",                   # 14 -> level 2
            b"aaaaaaaaa",                        # 9: dense-run group storm
        ]

    def _both(self, vocab, data: bytes, chunk_size=2048):
        import jax.numpy as jnp

        from gpu_bpe_tpu.ops.tokenize import MatchTables, _stab_match

        t = MatchTables.from_vocab(vocab)
        assert t.stab is not None and len(t.stab["levels"]) >= 1
        n = 1 << max(16, (len(data) - 1).bit_length())
        buf = np.zeros(n, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        d = jnp.asarray(buf).astype(jnp.uint32)
        ln = jnp.asarray(len(data), jnp.int32)
        full = _stab_match(d, t.stab, ln, chunk_size, rank_mode="off")
        rank = _stab_match(d, t.stab, ln, chunk_size, rank_mode="interpret")
        np.testing.assert_array_equal(np.asarray(rank), np.asarray(full))

    def test_sparse_candidates(self):
        rng = np.random.default_rng(22)
        filler = bytes(rng.integers(97, 105, size=40000).tolist())
        data = (
            filler[:9000]
            + b"the quick brown fox jumps loverXXcommonprefixiscommonYY" * 10
            + filler[9000:20000]
            + b"prefixAAsuffixthe quick brown fox jZZ" * 5
            + filler[20000:]
        )
        self._both(self._vocab(), data)

    def test_chunk_boundary_in_rank_space(self):
        # long token straddling a chunk boundary: the chunk-fit test rides
        # the true position payload through the rank space
        data = b"a" * 500 + b"the quick brown fox jumps lover" * 40 + b"b" * 300
        self._both(self._vocab(), data, chunk_size=512)

    def test_fallback_when_over_capacity(self):
        # a run of 'a's makes nearly every position a group candidate
        # (token "aaaaaaaaa" seeds group "aaaaaaaa"): cnt > n/8 forces the
        # full-width cond branch, which must be equal too. n = 2^17 so
        # cap = 2^15 < n.
        data = b"aaaaaaaab" * 14000  # ~126KB, 8/9 of positions in-group
        self._both(self._vocab(), data)

    def test_empty_candidates(self):
        # no position carries a group id: cnt == 0, rank space all-garbage
        rng = np.random.default_rng(23)
        data = bytes(rng.integers(106, 122, size=70000).tolist())
        self._both(self._vocab(), data)

    def test_fuzz_random_vocab(self):
        # random long-token vocabs over token-soup data: rank == full on
        # arbitrary group structure (shared prefixes arise by construction)
        rng = np.random.default_rng(29)
        for trial in range(3):
            toks = {bytes([b]) for b in range(256)}
            vocab = [bytes([b]) for b in range(256)]
            while len(vocab) < 2600:
                ln = int(rng.integers(2, 9))
                t = bytes(rng.integers(97, 103, size=ln).tolist())
                if t not in toks:
                    toks.add(t)
                    vocab.append(t)
            longs = set()
            while len(longs) < 30:
                ln = int(rng.integers(9, 30))
                t = bytes(rng.integers(97, 103, size=ln).tolist())
                if t not in toks:
                    longs.add(t)
            vocab += sorted(longs)
            pieces = sorted(longs) + [v for v in vocab[2000:2100]]
            idx = rng.integers(0, len(pieces), size=2500)
            data = b"".join(pieces[i] for i in idx)[:60000]
            self._both(vocab, data)


class TestSegmentedStab:
    """The segmented sort-join (positions split into segments, vocab rows
    replicated per segment, sorts/scans along the minor axis — the TPU
    sort network's cost scales ~log^2 of the sorted length) must be
    bitwise-equal to the unsegmented join at every level."""

    @pytest.fixture(autouse=True)
    def _force_deep_levels(self, monkeypatch):
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setattr(tz, "_LEVEL_MIN_TOKENS", 1)

    def _vocab(self):
        rng = np.random.default_rng(31)
        toks = {bytes([b]) for b in range(256)}
        vocab = [bytes([b]) for b in range(256)]
        while len(vocab) < 2600:
            ln = int(rng.integers(2, 9))
            t = bytes(rng.integers(97, 105, size=ln).tolist())
            if t not in toks:
                toks.add(t)
                vocab.append(t)
        return vocab + [
            b"the quick brown",
            b"the quick brown fox j",
            b"prefixAAsuffix",
        ]

    def _both(self, vocab, data: bytes, monkeypatch, chunk_size=2048):
        import jax.numpy as jnp

        from gpu_bpe_tpu.ops import tokenize as tz

        t = tz.MatchTables.from_vocab(vocab)
        assert t.stab is not None and len(t.stab["levels"]) >= 1
        n = 1 << max(17, (len(data) - 1).bit_length())
        buf = np.zeros(n, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        d = jnp.asarray(buf).astype(jnp.uint32)
        ln = jnp.asarray(len(data), jnp.int32)
        # segmentation must actually engage for the test to mean anything
        # — and the auto heuristic (not a user-pinned shape) must be what
        # gets tested, so clear the tuning env var for the segmented arm
        monkeypatch.delenv("GPU_BPE_TPU_STAB_SEG", raising=False)
        nseg, _ = tz._seg_shape(n, 2 * t.stab["count"])
        assert nseg > 1
        seg = tz._stab_match(d, t.stab, ln, chunk_size, rank_mode="off")
        monkeypatch.setenv("GPU_BPE_TPU_STAB_SEG", "0")
        flat = tz._stab_match(d, t.stab, ln, chunk_size, rank_mode="off")
        monkeypatch.delenv("GPU_BPE_TPU_STAB_SEG", raising=False)
        np.testing.assert_array_equal(np.asarray(seg), np.asarray(flat))

    def test_mixed_corpus(self, monkeypatch):
        rng = np.random.default_rng(32)
        filler = bytes(rng.integers(97, 105, size=120000).tolist())
        data = (
            filler[:30000]
            + b"the quick brown fox jXXprefixAAsuffixYY" * 20
            + filler[30000:]
        )
        self._both(self._vocab(), data, monkeypatch)

    def test_match_straddles_segment_boundary(self, monkeypatch):
        # a long token crossing the segment boundary: windows are packed
        # from the full stream before segmentation, so the row that owns
        # the match position must still see the full window. The boundary
        # is wherever the auto cost model puts it — compute it, don't
        # guess (the model picks non-pow2 segment sizes).
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.delenv("GPU_BPE_TPU_STAB_SEG", raising=False)
        vocab = self._vocab()
        t = tz.MatchTables.from_vocab(vocab)
        probe = b"the quick brown fox j"
        n = 1 << 18
        data = bytearray(np.random.default_rng(33).integers(
            105, 111, size=n - 1000).astype(np.uint8).tobytes())
        nseg, seg = tz._seg_shape(n, 2 * t.stab["count"])
        assert nseg > 1 and seg < len(data), "probes must be placeable at a real boundary"
        for start in (seg - 21, seg - 10, seg - 1, seg):
            data[start : start + len(probe)] = probe
        self._both(vocab, bytes(data), monkeypatch)

    def test_rank_space_segmented_consistency(self, monkeypatch):
        # rank path with segmentation on vs off (interpret Pallas): the
        # compacted rank rows reshape into segments with garbage tails —
        # the production shape at TPU pass sizes (n=2^24 -> rank cap
        # n/32 = 2^19, segmented). At test sizes the auto heuristic
        # leaves the small-tier rank joins unsegmented, so the segment
        # shape is PINNED via the env hatch and the engagement asserted —
        # the test fails loudly if the segmented path stops engaging.
        rng = np.random.default_rng(34)
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setenv("GPU_BPE_TPU_STAB_SEG", "14")
        vocab = self._vocab()
        t = tz.MatchTables.from_vocab(vocab)
        import jax.numpy as jnp

        n = 1 << 19
        data = (
            bytes(rng.integers(97, 105, size=(n - 3000) // 2).tolist())
            + b"the quick brown fox jQQ" * 120
            + bytes(rng.integers(97, 105, size=(n - 3000) // 2).tolist())
        )
        cap = min(n, max(n >> 5, 1 << 15))  # the tier sparse data takes
        lvl_count = t.stab["levels"][0]["count"]
        assert tz._seg_shape(cap, 2 * lvl_count)[0] > 1, (
            "rank-space joins must run segmented or this test is vacuous"
        )
        buf = np.zeros(n, np.uint8)
        buf[: len(data)] = np.frombuffer(data[:n], np.uint8)
        d = jnp.asarray(buf).astype(jnp.uint32)
        ln = jnp.asarray(min(len(data), n), jnp.int32)
        rank = tz._stab_match(d, t.stab, ln, 2048, rank_mode="interpret")
        monkeypatch.setenv("GPU_BPE_TPU_STAB_SEG", "0")
        flat = tz._stab_match(d, t.stab, ln, 2048, rank_mode="off")
        monkeypatch.delenv("GPU_BPE_TPU_STAB_SEG", raising=False)
        np.testing.assert_array_equal(np.asarray(rank), np.asarray(flat))


class TestOverlayKernel:
    """The Pallas streaming overlay+fit kernel (ops/stab_kernels.py) must
    be bitwise-equal to the XLA doubling scan on every path it serves:
    segmented level-1, rank-space level joins, group storms (carry
    churn at every depth incl. closes killing opens across block
    boundaries), and padding tails."""

    @pytest.fixture(autouse=True)
    def _force_deep_levels(self, monkeypatch):
        from gpu_bpe_tpu.ops import tokenize as tz

        monkeypatch.setattr(tz, "_LEVEL_MIN_TOKENS", 1)

    def _vocab(self):
        rng = np.random.default_rng(61)
        toks = {bytes([b]) for b in range(256)}
        vocab = [bytes([b]) for b in range(256)]
        while len(vocab) < 2600:
            ln = int(rng.integers(2, 9))
            t = bytes(rng.integers(97, 105, size=ln).tolist())
            if t not in toks:
                toks.add(t)
                vocab.append(t)
        return vocab + [
            b"the quick brown",
            b"the quick brown fox j",
            b"prefixAAsuffix",
            b"aaaaaaaaa",  # group storm: every position in an a-run is in-group
        ]

    def _both(self, data: bytes, monkeypatch, rank_mode="off", n_bits=17):
        import jax.numpy as jnp

        from gpu_bpe_tpu.ops import tokenize as tz

        t = tz.MatchTables.from_vocab(self._vocab())
        n = 1 << n_bits
        buf = np.zeros(n, np.uint8)
        buf[: min(len(data), n)] = np.frombuffer(data[:n], np.uint8)
        d = jnp.asarray(buf).astype(jnp.uint32)
        ln = jnp.asarray(min(len(data), n), jnp.int32)
        monkeypatch.setenv("GPU_BPE_TPU_STAB_SCAN", "0")
        ref = np.asarray(tz._stab_match(d, t.stab, ln, 2048, rank_mode="off"))
        monkeypatch.setenv("GPU_BPE_TPU_STAB_SCAN", "interpret")
        got = np.asarray(tz._stab_match(d, t.stab, ln, 2048, rank_mode=rank_mode))
        monkeypatch.delenv("GPU_BPE_TPU_STAB_SCAN")
        np.testing.assert_array_equal(got, ref)

    def test_segmented_full_width(self, monkeypatch):
        rng = np.random.default_rng(62)
        data = (bytes(rng.integers(97, 105, size=60000).tolist())
                + b"the quick brown fox jQQ" * 40
                + b"aaaaaaaab" * 500
                + bytes(rng.integers(97, 105, size=60000).tolist()))
        self._both(data, monkeypatch)

    def test_rank_space_with_kernel(self, monkeypatch):
        rng = np.random.default_rng(63)
        data = (bytes(rng.integers(97, 105, size=100000).tolist())
                + b"the quick brown fox jQQ" * 60
                + bytes(rng.integers(97, 105, size=150000).tolist()))
        self._both(data, monkeypatch, rank_mode="interpret", n_bits=18)

    def test_group_close_across_block_boundary(self, monkeypatch):
        # dense a-runs put opens/closes at every depth around the 32K
        # block boundaries of the sorted stream — the carry handoff must
        # respect closes that kill an open from an earlier block
        data = b"aaaaaaaab" * 14000
        self._both(data, monkeypatch)


class Test64KVocabScale:
    """BASELINE config-4 shape: a realistic 65,536-entry vocab must build
    match tables with the full stab chain (tiny dense tail only where the
    truncation threshold says dense is cheaper), keep group ids under the
    u16 cap at every level, and encode byte-identically to the oracle."""

    @pytest.fixture(scope="class")
    def vocab64k(self, english_text):
        rng = np.random.default_rng(41)
        words = list({w.encode() for w in english_text.split() if 1 < len(w) <= 28})
        vocab = [bytes([b]) for b in range(256)]
        seen = set(vocab)
        cands = []
        for w in sorted(words):
            cands.append(w)
            cands.append(b" " + w)
            if len(w) > 4:
                cands.append(w[: len(w) // 2])
        rng.shuffle(cands)
        i = 0
        while len(vocab) < 65536 and i < len(cands):
            t = cands[i]
            i += 1
            if t not in seen and len(t) <= 32:
                seen.add(t)
                vocab.append(t)
        while len(vocab) < 65536:
            ln = int(rng.integers(2, 16))
            t = bytes(rng.integers(97, 123, size=ln).tolist())
            if t not in seen:
                seen.add(t)
                vocab.append(t)
        return vocab

    def test_tables_build_full_chain(self, vocab64k):
        t = MatchTables.from_vocab(vocab64k)
        assert t.stab is not None
        # chained coverage through >= 14 bytes; any dense tail is the
        # deliberate truncation of a sub-threshold tail, never lengths
        # the chain serves
        assert t.stab["max_len"] >= 14
        assert all(ln > t.stab["max_len"] for ln in t.dense_lengths)
        # u16 group-id headroom at every level (level-1 groups are the
        # pseudo-depth rows; deeper levels carry their own id arrays)
        n_l1_groups = int(np.sum(np.asarray(t.stab["ln"]) == 9))
        assert n_l1_groups < 0xFFFF
        for lvl in t.stab["levels"]:
            # group rows (pseudo-depth 7) carry next-level gids — those
            # must stay under the u16 cap; match rows carry token ids,
            # which legitimately reach 65535 at a full 64K vocab
            ln_arr = np.asarray(lvl["ln"])
            ids = np.asarray(lvl["id"])
            grp = ids[ln_arr == 7]
            if len(grp):
                assert int(np.max(grp)) < 0xFFFF

    def test_encode_matches_oracle(self, vocab64k, english_text):
        tok = TPUTokenizer(vocab64k)
        data = english_text[:20000].encode()
        got = tok.encode_bytes(data)
        ref = GreedyTrieEncoder(vocab64k, chunk_size=tok.chunk_size).encode(data)
        assert np.array_equal(got, np.asarray(ref, dtype=np.uint32))


class TestMultiDeviceEncode:
    """Round-robin pass dispatch over all devices must be bitwise-equal to
    single-device encoding (passes are independent chunk-aligned slices —
    the reference's multi-pass slicing, data-parallel across chips)."""

    def test_eight_device_roundrobin(self, monkeypatch):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        vocab = _base_vocab() + [b"ab", b"abc", b"the ", b"quick"]
        rng = np.random.default_rng(31)
        data = bytes(rng.integers(97, 123, size=9000).tolist()) + b"the quick" * 200

        tok1 = TPUTokenizer(vocab, chunk_size=512, max_pass_bytes=2048)
        monkeypatch.setenv("GPU_BPE_TPU_TOKENIZE_ALL_DEVICES", "0")
        single = tok1.encode_bytes(data)

        tok8 = TPUTokenizer(vocab, chunk_size=512, max_pass_bytes=2048)
        monkeypatch.setenv("GPU_BPE_TPU_TOKENIZE_ALL_DEVICES", "1")
        multi = tok8.encode_bytes(data)
        np.testing.assert_array_equal(multi, single)

        ref = GreedyTrieEncoder(vocab, chunk_size=512).encode(data)
        np.testing.assert_array_equal(multi, np.asarray(ref, np.uint32))
