"""TPU training step conformance vs the CPU oracle (runs on CPU backend)."""

import numpy as np
import pytest

from gpu_bpe_tpu.constants import WORD_START_BIT, pack_pair
from gpu_bpe_tpu.core import ReferenceTrainer, bytes_to_symbols, tag_word_boundaries
from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.pretok import PreTokenizer


def _pretok(text: str):
    pt = PreTokenizer()
    return pt.pre_tokenize(text)


def _oracle(data: bytes, starts, vocab_size: int):
    sym = bytes_to_symbols(data)
    if starts is not None:
        sym = tag_word_boundaries(sym, starts)
    return ReferenceTrainer().train(sym, target_vocab_size=vocab_size)


class TestStreamIngestion:
    def test_no_dedup_identity(self):
        data = b"hello world hello"
        stream = make_stream(data, None, dedup=False)
        assert stream.n == len(data)
        assert (stream.weights == 1).all()
        assert stream.symbols[0] & WORD_START_BIT

    def test_dedup_exact_counts(self, english_text):
        data, starts = _pretok(english_text[:5000])
        stream = make_stream(data, starts, dedup=True)
        plain = make_stream(data, starts, dedup=False)
        assert stream.n <= plain.n
        assert stream.total_bytes == plain.n
        # weighted pair counts must match exactly
        from gpu_bpe_tpu.core import count_pairs

        p1, c1 = count_pairs(plain.symbols, plain.weights.astype(np.int64))
        p2, c2 = count_pairs(stream.symbols, stream.weights.astype(np.int64))
        assert np.array_equal(p1, p2)
        assert np.array_equal(c1, c2)

    def test_dedup_reduces(self):
        data, starts = _pretok("spam " * 500)
        stream = make_stream(data, starts, dedup=True)
        assert stream.n <= 10  # "spam" + " spam"


class TestChunkedIngestion:
    """Streamed ingestion must produce a SymbolStream bitwise-identical to
    the monolithic pre-tokenize + make_stream path."""

    def _compare(self, corpus: bytes, chunk: int):
        from gpu_bpe_tpu.ops.ingest import make_stream_chunked
        from gpu_bpe_tpu.pretok import PreTokenizer

        data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
        ref = make_stream(data, starts, dedup=True)
        chunks = [corpus[i : i + chunk] for i in range(0, len(corpus), chunk)]
        got = make_stream_chunked(iter(chunks))
        assert got.n == ref.n
        assert got.total_bytes == ref.total_bytes
        assert np.array_equal(got.symbols, ref.symbols)
        assert np.array_equal(got.weights, ref.weights)

    def test_matches_monolithic(self, english_text):
        corpus = english_text[:20000].encode()
        for chunk in (256, 1023, 4096):
            self._compare(corpus, chunk)

    def test_unicode_and_small_chunks(self):
        corpus = ("caf\u00e9 na\u00efve \u00e9tude " * 100 + "\u4e2d\u6587\u5206\u8bcd tests " * 50).encode()
        # chunk sizes that cut UTF-8 sequences mid-way
        for chunk in (7, 33, 101):
            self._compare(corpus, chunk)

    def test_stream_paths_separators(self, tmp_path):
        from gpu_bpe_tpu.ops.ingest import make_stream_chunked, stream_paths
        from gpu_bpe_tpu.pretok import PreTokenizer

        a = tmp_path / "a.txt"; a.write_bytes(b"hello world " * 40)
        b = tmp_path / "b.txt"; b.write_bytes(b"goodbye moon " * 40)
        corpus = a.read_bytes() + b"\n\n" + b.read_bytes()
        data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
        ref = make_stream(data, starts, dedup=True)
        got = make_stream_chunked(stream_paths([str(a), str(b)], chunk_bytes=64))
        assert np.array_equal(got.symbols, ref.symbols)
        assert np.array_equal(got.weights, ref.weights)


class TestConformance:
    @pytest.mark.parametrize("dedup", [False, True])
    def test_merge_list_matches_oracle(self, english_text, dedup):
        data, starts = _pretok(english_text[:8000])
        oracle = _oracle(data, starts, 330)
        tpu = TPUTrainer().train(data, starts, target_vocab_size=330, dedup=dedup)
        assert tpu.merges == oracle.merges
        assert tpu.merge_counts == oracle.merge_counts
        assert tpu.vocab == oracle.vocab

    def test_no_word_boundaries(self):
        data = b"abracadabra " * 50
        oracle = _oracle(data, None, 300)
        tpu = TPUTrainer().train(data, None, target_vocab_size=300)
        assert tpu.merges == oracle.merges

    def test_overlap_quirk_conformance(self):
        data = b"aaaa bbbb aaaa cccc aaaa"
        oracle = _oracle(data, None, 280)
        tpu = TPUTrainer().train(data, None, target_vocab_size=280, dedup=False)
        assert tpu.merges == oracle.merges
        assert tpu.merge_counts == oracle.merge_counts

    def test_early_stop(self):
        data = b"abcdefgh"  # no pair repeats
        tpu = TPUTrainer().train(data, None, target_vocab_size=300)
        assert tpu.merges == []

    def test_nul_bytes(self):
        data = b"\x00\x00ab\x00ab\x00\x00"
        oracle = _oracle(data, None, 280)
        tpu = TPUTrainer().train(data, None, target_vocab_size=280)
        assert tpu.merges == oracle.merges

    def test_tie_break(self):
        # NUL separators never form pairs: only (a,b) and (c,d), tied at 2;
        # the smaller packed pair id must win everywhere
        data = b"ab\x00cd\x00ab\x00cd"
        oracle = _oracle(data, None, 258)
        tpu = TPUTrainer().train(data, None, target_vocab_size=258)
        assert tpu.merges == oracle.merges
        assert tpu.merges[0][:2] == (ord("a"), ord("b"))

    def test_multibatch(self, english_text):
        # >128 merges forces multiple device round trips + capacity shrink
        data, starts = _pretok(english_text[:12000])
        oracle = _oracle(data, starts, 256 + 200)
        tpu = TPUTrainer().train(data, starts, target_vocab_size=256 + 200)
        assert tpu.merges == oracle.merges

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            TPUTrainer().train(b"", None)

    def test_progress_schema(self, english_text):
        data, starts = _pretok(english_text[:5000])
        events = []
        TPUTrainer().train(data, starts, target_vocab_size=300, on_progress=events.append)
        assert events
        assert {"mergeIndex", "totalMerges", "mergeString", "bestCount", "symbolCount",
                "mergesPerSecond"} <= set(events[0])


class TestDeviceKernels:
    def test_find_best_pair_weighted(self):
        import jax.numpy as jnp

        from gpu_bpe_tpu.ops import find_best_pair

        sym = jnp.asarray(bytes_to_symbols(b"ab" + b"cd"), jnp.uint32)
        w = jnp.asarray([5, 5, 1, 1], jnp.int32)
        pair, count = find_best_pair(sym, w, jnp.asarray(4))
        # weighted: (a,b)=5, (b,c)=5, (c,d)=1 — tie broken by smaller pair id
        assert int(count) == 5
        assert int(pair) == pack_pair(ord("a"), ord("b"))


class TestHoleRunStress:
    """Overlapping-occurrence merges create hole runs longer than the
    next-valid lookahead in a single merge; the emergency compaction must
    keep counts exact."""

    def test_long_identical_runs(self):
        data = b"xy" + b"a" * 64 + b"xy" + b"a" * 64 + b"zz" + b"a" * 32
        oracle = _oracle(data, None, 300)
        tpu = TPUTrainer().train(data, None, target_vocab_size=300, dedup=False)
        assert tpu.merges == oracle.merges
        assert tpu.merge_counts == oracle.merge_counts

    def test_space_runs_realistic(self, english_text):
        # long whitespace runs (indentation-like) inside real text
        text = english_text[:3000] + "\n" + " " * 100 + "code\n" + " " * 100 + "more"
        data, starts = _pretok(text)
        oracle = _oracle(data, starts, 310)
        tpu = TPUTrainer().train(data, starts, target_vocab_size=310)
        assert tpu.merges == oracle.merges

    def test_alternating_overlap(self):
        # "ababab..." — merging (a,b) then (Z,Z) exercises chained removals
        data = b"ab" * 100 + b"\x00" + b"cd" * 50
        oracle = _oracle(data, None, 300)
        tpu = TPUTrainer().train(data, None, target_vocab_size=300, dedup=False)
        assert tpu.merges == oracle.merges


def test_mixed_language_conformance():
    """BASELINE config 2 (scaled down for CI): multi-script corpus through
    pre-tokenization + device training must match the oracle exactly."""
    rng = np.random.default_rng(5)

    def block(alphabet, k, lo=1, hi=6):
        words = [
            "".join(rng.choice(list(alphabet), size=rng.integers(lo, hi)))
            for _ in range(60)
        ]
        return " ".join(rng.choice(words) for _ in range(k))

    text = (
        "The quick brown fox, it's 2026! "
        + block("的一是不了人我在有他这为之大来以", 400, 1, 4)
        + "\n" + block("абвгдежзиклмнопрстуфхцчшщ", 400)
        + "\n" + block("αβγδεζηθικλμνξοπρστυ", 300)
        + "\n" + block("àâäçéèêëîïôöùûüñ", 300)
        + "\nmixed 混合 текст κείμενο café naïve"
    )
    data, starts = _pretok(text)
    oracle = _oracle(data, starts, 256 + 120)
    tpu = TPUTrainer().train(data, starts, target_vocab_size=256 + 120)
    assert tpu.merges == oracle.merges
    assert tpu.merge_counts == oracle.merge_counts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_random_corpora_conformance(seed):
    """Randomized corpora (skewed alphabets, random word structure, random
    vocab targets) must match the oracle exactly — fuzz for certificate
    edge cases the curated tests miss."""
    rng = np.random.default_rng(seed)
    alpha = int(rng.integers(3, 30))
    n_words = int(rng.integers(50, 400))
    words = []
    for _ in range(n_words):
        ln = int(rng.integers(1, 12))
        words.append(bytes(rng.integers(1, 1 + alpha, size=ln).tolist()))
    reps = rng.zipf(1.3, size=n_words).clip(1, 500)
    corpus = []
    for w, r in zip(words, reps):
        corpus += [w] * int(r)
    rng.shuffle(corpus)
    data = b" ".join(corpus)
    starts = np.zeros(len(data), np.uint8)
    pos = 0
    for w in corpus:
        starts[pos] = 1
        pos += len(w) + 1
    vocab_target = 256 + int(rng.integers(20, 200))
    oracle = _oracle(data, starts, vocab_target)
    tpu = TPUTrainer().train(data, starts, target_vocab_size=vocab_target)
    assert tpu.merges == oracle.merges
    assert tpu.merge_counts == oracle.merge_counts


def test_run_totals_mass_beyond_int32():
    """Global stream mass past 2^31 must not corrupt run totals: the
    prefix sum wraps in u32 and only per-run differences (each < 2^31)
    are consumed — the reference's u32-atomic envelope."""
    import jax.numpy as jnp

    from gpu_bpe_tpu.ops.train_step import _run_totals

    # 8 runs of weight ~500M each: total mass ~4e9 > 2^32/2
    sp = np.repeat(np.arange(1, 9, dtype=np.uint32), 4)
    sw = np.full(32, 125_000_000, np.int32)  # per run: 5e8 < 2^31
    rt = np.asarray(_run_totals(jnp.asarray(sp), jnp.asarray(sw)))
    ends = np.flatnonzero(rt)
    assert len(ends) == 8
    assert (rt[ends] == 500_000_000).all()
    # invalid pair id 0 yields no run total
    sp0 = np.zeros(4, np.uint32)
    rt0 = np.asarray(_run_totals(jnp.asarray(sp0), jnp.asarray(np.ones(4, np.int32))))
    assert (rt0 == 0).all()


class TestMaintainedCounts:
    """The incremental candidate-count maintenance (round 2) must keep
    ``state.cand_counts`` EXACT for every live slot after every batch —
    the certificate's winner selection reads these instead of a per-
    iteration [K, N] recount."""

    def _counts_exact(self, data: bytes, starts):
        import jax.numpy as jnp
        from jax import lax

        from gpu_bpe_tpu.ops import init_state, make_stream
        from gpu_bpe_tpu.ops.ingest import pad_stream
        from gpu_bpe_tpu.ops.train_step import _masked_pairs, train_batch_jit

        stream = make_stream(data, starts, dedup=True)
        padded = pad_stream(stream)
        state = init_state(
            jnp.asarray(padded.symbols), jnp.asarray(padded.weights), stream.n, 256
        )
        # several small batches so maintained counts must survive many
        # merges, scratch appends, and window recounts
        for _ in range(6):
            state = train_batch_jit(state, jnp.asarray(16, jnp.int32))
            cap = state.symbols.shape[0]
            iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
            pair, w, _ = _masked_pairs(state.symbols, state.weights, state.extent, iota, 0)
            cand = np.asarray(state.cand)
            counts = np.asarray(state.cand_counts)
            pair_np = np.asarray(pair)
            w_np = np.asarray(w)
            for k in range(len(cand)):
                if counts[k] < 0:
                    continue
                true = int(w_np[pair_np == cand[k]].sum())
                assert true == counts[k], (
                    f"slot {k} pair {cand[k]:#x}: maintained {counts[k]} != {true}"
                )
            if bool(state.early_stop):
                break

    def test_counts_stay_exact_english(self, english_text):
        data, starts = _pretok(english_text[:20000])
        self._counts_exact(data, starts)

    def test_counts_stay_exact_overlaps(self):
        # heavy overlap chains (collapse quirk) + tiny alphabet: exercises
        # the affected-recount rule under consumed/overlapping pairs
        text = "aaaaaa bb aaaa abab baba " * 40 + "cc ccc cccc " * 30
        data, starts = _pretok(text)
        self._counts_exact(data, starts)


def test_nul_adjacent_created_pairs():
    """Token-0 guard: when the heaviest neighbor of a new token is NUL,
    the sampled pair must NOT be tracked (pairs with a zero member are
    never counted by the pair stream) — the merge list must still match
    the oracle exactly."""
    word = b"\x00ab\x00"
    data = (word + b" ") * 300 + b"xy " * 200
    starts = np.zeros(len(data), np.uint8)
    starts[:: len(word) + 1][: 300] = 1
    for pos in range(300 * (len(word) + 1), len(data), 3):
        starts[pos] = 1
    oracle = _oracle(data, starts, 256 + 40)
    tpu = TPUTrainer().train(data, starts, target_vocab_size=256 + 40)
    assert tpu.merges == oracle.merges
    assert tpu.merge_counts == oracle.merge_counts


class TestNativeIngest:
    """The C++ dedup loader (ops/cpp/ingest.cpp) must be bitwise-identical
    to the numpy path for both make_stream and StreamAccumulator."""

    def _numpy(self, fn, monkeypatch):
        import gpu_bpe_tpu.ops.native as nat

        monkeypatch.setenv("GPU_BPE_TPU_NO_NATIVE_INGEST", "1")
        nat._raw_lib.cache_clear()
        try:
            return fn()
        finally:
            monkeypatch.delenv("GPU_BPE_TPU_NO_NATIVE_INGEST")
            nat._raw_lib.cache_clear()

    def _assert_equal(self, a, b):
        assert a.n == b.n and a.total_bytes == b.total_bytes
        np.testing.assert_array_equal(a.symbols[: a.n], b.symbols[: b.n])
        np.testing.assert_array_equal(a.weights[: a.n], b.weights[: b.n])

    def test_native_available(self):
        from gpu_bpe_tpu.ops.native import native_available

        assert native_available()

    def test_make_stream_equal(self, monkeypatch):
        from gpu_bpe_tpu.ops.ingest import make_stream

        rng = np.random.default_rng(17)
        cases = []
        d = rng.integers(97, 123, size=80000, dtype=np.uint8).tobytes()
        s = (rng.random(80000) < 0.2).astype(np.uint8)
        cases.append((d, s))
        w = b"abcdefghijklmnopqrstuvwxyz0123456789" * 3  # long words
        d2 = b"the " * 2000 + w * 50 + b"a" * 500
        s2 = np.zeros(len(d2), np.uint8)
        s2[::4] = 1
        cases.append((d2, s2))
        cases.append((b"hello", np.zeros(5, np.uint8)))  # single word
        cases.append((b"abcabc", np.ones(6, np.uint8)))  # 1-byte words
        for d, s in cases:
            a = make_stream(d, s, dedup=True)
            b = self._numpy(lambda: make_stream(d, s, dedup=True), monkeypatch)
            self._assert_equal(a, b)

    def test_accumulator_equal(self, monkeypatch):
        from gpu_bpe_tpu.ops.ingest import StreamAccumulator, make_stream

        rng = np.random.default_rng(19)
        chunks = []
        for _ in range(4):
            d = rng.integers(97, 106, size=30000, dtype=np.uint8).tobytes()
            s = (rng.random(30000) < 0.3).astype(np.uint8)
            chunks.append((d, s))

        def run():
            acc = StreamAccumulator()
            for d, s in chunks:
                acc.add_chunk(d, s)
            return acc.finish()

        a = run()
        b = self._numpy(run, monkeypatch)
        self._assert_equal(a, b)

        # chunked == monolithic on the concatenated corpus (chunk starts
        # forced at each chunk's first position, as add_chunk does)
        alld = b"".join(d for d, _ in chunks)
        alls = np.concatenate([s for _, s in chunks]).copy()
        off = 0
        for d, _ in chunks:
            alls[off] = 1
            off += len(d)
        m = make_stream(alld, alls, dedup=True)
        self._assert_equal(m, a)

    def test_overflow_guard(self):
        # >2^31 instances of one word would overflow int32 weights; the
        # native path must raise like the numpy assert (tiny proxy: the
        # rc=-2 path is unit-tested at the ctypes level with a fake count)
        import ctypes

        from gpu_bpe_tpu.ops.native import _raw_lib

        lib = _raw_lib()
        h = lib.ingest_acc_new()
        data = (ctypes.c_uint8 * 2)(97, 98)
        starts = (ctypes.c_uint8 * 2)(1, 0)
        assert lib.ingest_acc_add(h, data, starts, 2) == 0
        lib.ingest_acc_free(h)

    def test_accumulator_nonbinary_mask(self, monkeypatch):
        # an int mask whose truthy value is a multiple of 256 must still
        # mark a word start on the native path (regression: astype(uint8)
        # truncated 256 -> 0 and diverged from the numpy astype(bool))
        from gpu_bpe_tpu.ops.ingest import StreamAccumulator

        d = b"abcdefgh"
        s = np.zeros(8, np.int64)
        s[4] = 256  # truthy, but 256 & 0xFF == 0

        def run():
            acc = StreamAccumulator()
            acc.add_chunk(d, s)
            return acc.finish()

        a = run()
        b = self._numpy(run, monkeypatch)
        self._assert_equal(a, b)
        assert a.n == 8 and int((np.asarray(a.symbols) >> 16).sum()) == 2


class TestRecountBudget:
    """The per-dispatch recount budget (watchdog guard: a recount-dense
    batch at a large capacity can push one dispatch past execution limits
    — the 10 GB crash at merge 17,573) must only move batch boundaries:
    the merge list is invariant and progress is guaranteed."""

    def _run(self, data, starts, budget, vocab=330):
        import jax.numpy as jnp

        from gpu_bpe_tpu.ops import init_state, make_stream
        from gpu_bpe_tpu.ops.ingest import pad_stream
        from gpu_bpe_tpu.ops.train_step import train_batch_summary_jit
        from gpu_bpe_tpu.constants import BATCH_MERGES, TOKEN_MASK

        stream = make_stream(data, starts, dedup=True)
        padded = pad_stream(stream)
        state = init_state(
            jnp.asarray(padded.symbols), jnp.asarray(padded.weights), stream.n, 256
        )
        merges = []
        dispatches = 0
        while len(merges) < vocab - 256:
            state, packed = train_batch_summary_jit(
                state,
                jnp.asarray(min(BATCH_MERGES, vocab - 256 - len(merges)), jnp.int32),
                jnp.asarray(budget, jnp.int32),
            )
            packed = np.asarray(packed)
            log = packed[: BATCH_MERGES * 3].reshape(BATCH_MERGES, 3)
            done = int(packed[-4])
            for i in range(done):
                merges.append((int(log[i, 0]) >> 16, int(log[i, 0]) & TOKEN_MASK,
                               int(log[i, 1])))
            dispatches += 1
            if bool(packed[-2]):  # early stop
                break
            assert dispatches < 4096, "no progress under recount budget"
        return merges, dispatches

    def test_budget_invariance(self, english_text):
        data, starts = _pretok(english_text[:8000])
        unbounded, d0 = self._run(data, starts, 1 << 30)
        tight, d1 = self._run(data, starts, 1)  # every recount ends a dispatch
        assert tight == unbounded
        assert d1 > d0  # the budget actually split dispatches


def test_multi_merge_mode_conformance(english_text, tmp_path):
    """GPU_BPE_TPU_MULTI=1 (dual/triple iterations) must stay bitwise-
    identical to the single-merge default. Subprocess: the flag is read at
    trace time and cached (monkeypatching would be silently ignored by
    memoized traces — CLAUDE.md invariant 4)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    worker = tmp_path / "w.py"
    worker.write_text(
        "import sys, json\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from gpu_bpe_tpu.ops import TPUTrainer\n"
        "from gpu_bpe_tpu.pretok import PreTokenizer\n"
        "data, starts = PreTokenizer().pre_tokenize_bytes(open(sys.argv[1],'rb').read())\n"
        "r = TPUTrainer().train(data, starts, target_vocab_size=330)\n"
        "json.dump({'m': r.merges, 'c': r.merge_counts}, open(sys.argv[2],'w'))\n"
    )
    corpus = tmp_path / "c.txt"
    corpus.write_bytes((english_text * 12).encode()[:8000])
    import os

    outs = {}
    for mode, env in (("single", {}), ("multi", {"GPU_BPE_TPU_MULTI": "1"})):
        out = tmp_path / f"{mode}.json"
        e = dict(os.environ, PYTHONPATH=str(repo), **env)
        p = subprocess.run([sys.executable, str(worker), str(corpus), str(out)],
                           env=e, capture_output=True, timeout=600)
        assert p.returncode == 0, p.stderr.decode()[-2000:]
        outs[mode] = json.loads(out.read_text())
    assert outs["single"] == outs["multi"]
