"""Pallas merge+compact kernel vs the jnp reference (interpret mode on CPU).

The kernel is the TPU production path for the single-chip trainer
(ops/train_step.py do_merge); these tests pin its semantics to
apply_merge_device, which is itself conformance-tested against the CPU
oracle. Runs in Pallas interpret mode so CI needs no TPU.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gpu_bpe_tpu.constants import pack_pair
from gpu_bpe_tpu.ops.pallas_kernels import BLOCK, merge_compact
from gpu_bpe_tpu.ops.train_step import apply_merge_device


def _random_stream(rng, n, alphabet=6, ws_p=0.15):
    cap = ((n + 1023) // 1024) * 1024 + 1024
    toks = rng.integers(1, alphabet, size=n).astype(np.uint32)
    ws = rng.random(n) < ws_p
    sym = toks | (ws.astype(np.uint32) << 16)
    sym[0] |= 1 << 16
    w = rng.integers(1, 9, size=n).astype(np.int32)
    symf = np.zeros(cap, np.uint32)
    symf[:n] = sym
    wf = np.zeros(cap, np.int32)
    wf[:n] = w
    return symf, wf


def _check(symf, wf, n, pair, new_id=300):
    ref = apply_merge_device(
        jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n), jnp.uint32(pair), jnp.uint32(new_id)
    )
    got = merge_compact(
        jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n), jnp.uint32(pair), jnp.uint32(new_id),
        interpret=True,
    )
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.parametrize("n", [16, 2771, 40_000, 70_000])
def test_random_streams(n):
    rng = np.random.default_rng(n)
    symf, wf = _random_stream(rng, n)
    _check(symf, wf, n, pack_pair(2, 3))


def test_overlap_quirk_identical_run():
    # "aaaa..." merging (a,a): adjacent sites collapse (train.wgsl quirk)
    n = 300
    symf = np.zeros(2048, np.uint32)
    symf[:n] = 1
    symf[0] |= 1 << 16
    wf = np.zeros(2048, np.int32)
    wf[:n] = 1
    _check(symf, wf, n, pack_pair(1, 1))


def test_sites_straddling_block_boundary():
    # place pair occurrences right at the BLOCK edges to exercise the halo
    n = BLOCK * 2 + 100
    cap = ((n + 1023) // 1024) * 1024 + 1024
    symf = np.zeros(cap, np.uint32)
    symf[:n] = 7
    symf[0] |= 1 << 16
    for p in (BLOCK - 2, BLOCK - 1, BLOCK, 2 * BLOCK - 1, 2 * BLOCK):
        symf[p] = 2
        symf[p + 1] = 3
    wf = np.zeros(cap, np.int32)
    wf[:n] = 1
    _check(symf, wf, n, pack_pair(2, 3))


def test_word_start_blocks_merge():
    n = 64
    symf = np.zeros(2048, np.uint32)
    symf[:n] = np.tile([2, 3], n // 2)
    symf[0] |= 1 << 16
    symf[33] |= 1 << 16  # word start on a 'b' — that site must not merge
    wf = np.zeros(2048, np.int32)
    wf[:n] = 1
    _check(symf, wf, n, pack_pair(2, 3))


def test_weights_follow_survivors():
    rng = np.random.default_rng(5)
    symf, wf = _random_stream(rng, 10_000, alphabet=4)
    _check(symf, wf, 10_000, pack_pair(1, 2), new_id=999)



def test_garbage_tail_ignored():
    """The region past ``n`` may contain recycled-buffer garbage (the kernel
    only DMAs up to the compacted end + one tile). Garbage must neither
    create phantom sites/removals nor leak into the output — regression for
    a weight-loss corruption first seen at 64 MB corpus scale."""
    rng = np.random.default_rng(3)
    n = 40_000
    cap = 65_536
    base_s, base_w = _random_stream(rng, n)
    symf = np.zeros(cap, np.uint32); symf[:n] = base_s[:n]
    wf = np.zeros(cap, np.int32); wf[:n] = base_w[:n]
    # poison the tail with pair-matching garbage
    symf[n:] = np.tile([2, 3], (cap - n) // 2).astype(np.uint32)
    wf[n:] = 999
    clean_s = symf.copy(); clean_s[n:] = 0
    clean_w = wf.copy(); clean_w[n:] = 0
    ref = apply_merge_device(
        jnp.asarray(clean_s), jnp.asarray(clean_w), jnp.asarray(n),
        jnp.uint32(pack_pair(2, 3)), jnp.uint32(300),
    )
    got = merge_compact(
        jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
        jnp.uint32(pack_pair(2, 3)), jnp.uint32(300), interpret=True,
    )
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


def test_selftest_module_interpret():
    """The on-TPU selftest (run by bench.py on the real chip) must pass in
    interpret mode too — keeps the bench-side cases covered in CI."""
    from gpu_bpe_tpu.ops.selftest import run_kernel_selftest

    results = run_kernel_selftest(interpret=True)
    assert results and all(results.values()), results


class TestTrackingKernels:
    """Fused created-pair tracking (merge_compact_tracked) vs the jnp
    roll-based reference computations (interpret mode)."""

    def _setup(self, rng, n=5000, pair=(5, 7), new_id=300):
        symf, wf = _random_stream(rng, n, alphabet=10)
        from gpu_bpe_tpu.ops.pallas_kernels import merge_compact_tracked

        sym2, w2, n2, bl, br, samp = merge_compact_tracked(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pack_pair(*pair)), jnp.uint32(new_id), interpret=True,
        )
        return sym2, w2, int(n2), np.asarray(bl), np.asarray(br), np.asarray(samp)

    def _jnp_ref(self, sym2, w2, z):
        from gpu_bpe_tpu.ops.train_step import _TOKEN_MASK, _WS_BIT

        tok2 = sym2 & _TOKEN_MASK
        zm = tok2 == jnp.uint32(z)
        prev2 = jnp.roll(sym2, 1)
        next2 = jnp.roll(sym2, -1)
        wl = jnp.where(zm & ((sym2 & _WS_BIT) == 0), w2, 0)
        wr = jnp.where(zm & ((next2 & _WS_BIT) == 0), w2, 0)
        return wl, wr, prev2, next2

    @staticmethod
    def _ref_hist(toks, wv):
        from gpu_bpe_tpu.ops.pallas_kernels import _TRACK_SIDE

        toks = np.asarray(toks).astype(np.uint64) & 0xFFFF
        h = (((toks * 2654435761) & 0xFFFFFFFF) >> 16) & (_TRACK_SIDE * _TRACK_SIDE - 1)
        out = np.zeros(_TRACK_SIDE * _TRACK_SIDE)
        np.add.at(out, h.astype(int), np.asarray(wv))
        return out.reshape(_TRACK_SIDE, _TRACK_SIDE)

    def test_bins_match_roll_reference(self, rng):
        sym2, w2, n2, bl, br, samp = self._setup(rng)
        wl, wr, prev2, next2 = self._jnp_ref(sym2, w2, 300)
        assert np.allclose(bl, self._ref_hist(prev2, wl))
        assert np.allclose(br, self._ref_hist(next2, wr))

    def test_sample_matches_argmax_weight(self, rng):
        from gpu_bpe_tpu.ops.train_step import _TOKEN_MASK

        sym2, w2, n2, bl, br, samp = self._setup(rng)
        wl, wr, prev2, next2 = self._jnp_ref(sym2, w2, 300)
        assert samp[0] == int(jnp.max(wl))
        assert samp[2] == int(jnp.max(wr))
        if samp[0] > 0:
            lmax_toks = np.asarray(jnp.where(wl == samp[0], prev2 & _TOKEN_MASK, 0xFFFF))
            assert samp[1] in lmax_toks
        if samp[2] > 0:
            rmax_toks = np.asarray(jnp.where(wr == samp[2], next2 & _TOKEN_MASK, 0xFFFF))
            assert samp[3] in rmax_toks

    def test_exclusion_subtract_equals_in_stream(self, rng):
        # subtracting the sampled pair's exact count from its bin must
        # equal a histogram built with that pair's mass zeroed
        from gpu_bpe_tpu.ops.train_step import _TOKEN_MASK

        sym2, w2, n2, bl, br, samp = self._setup(rng)
        wl, wr, prev2, next2 = self._jnp_ref(sym2, w2, 300)
        l_tok = int(samp[1])
        c_l = int(jnp.sum(jnp.where((prev2 & _TOKEN_MASK) == l_tok, wl, 0)))
        h = (((l_tok * 2654435761) & 0xFFFFFFFF) >> 16) & 255
        bl_sub = bl.copy(); bl_sub[h >> 4, h & 15] -= c_l
        wl_x = jnp.where((prev2 & _TOKEN_MASK) == l_tok, 0, wl)
        assert np.allclose(bl_sub, self._ref_hist(prev2, wl_x))

    def test_no_z_positions(self, rng):
        from gpu_bpe_tpu.ops.pallas_kernels import merge_compact_tracked

        symf, wf = _random_stream(rng, 3000, alphabet=8)
        symf = np.where((symf & 0xFFFF) == 5, 6, symf).astype(np.uint32)  # no (5,7) pairs
        sym2, w2, n2, bl, br, samp = merge_compact_tracked(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(3000),
            jnp.uint32(pack_pair(5, 7)), jnp.uint32(999), interpret=True,
        )
        assert samp[0] <= 0 and samp[2] <= 0
        assert float(np.max(np.asarray(bl))) == 0
        assert float(np.max(np.asarray(br))) == 0

    def test_multiblock_boundaries(self, rng):
        # stream larger than one kernel block: cross-window pairs counted once
        sym2, w2, n2, bl, br, samp = self._setup(rng, n=3 * BLOCK // 2 + 77)
        wl, wr, prev2, next2 = self._jnp_ref(sym2, w2, 300)
        assert np.allclose(bl, self._ref_hist(prev2, wl))
        assert np.allclose(br, self._ref_hist(next2, wr))
        assert samp[0] == int(jnp.max(wl))


class TestProbeCounts:
    """Fused probe-pair counting (merge_compact_tracked probes=) vs a
    `_masked_pairs` recount on the compacted post-merge stream — the
    exactness contract that lets _post_counts skip its separate stream
    pass (CLAUDE.md invariant 3b)."""

    def _host_counts(self, sym2, w2, n2, words):
        from jax import lax

        from gpu_bpe_tpu.ops.train_step import _masked_pairs

        cap = sym2.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        pair2, w2m, _ = _masked_pairs(sym2, w2, jnp.asarray(n2), iota, 0)
        return np.array(
            [int(jnp.sum(jnp.where(pair2 == jnp.uint32(w), w2m, 0))) for w in words]
        )

    def _run(self, symf, wf, n, pair, new_id, words, count):
        from gpu_bpe_tpu.ops.pallas_kernels import N_PROBES, merge_compact_tracked

        pw = np.zeros(N_PROBES, np.uint32)
        pw[: len(words)] = words
        sym2, w2, n2, _bl, _br, _samp, pcnt = merge_compact_tracked(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pair), jnp.uint32(new_id),
            probes=(jnp.asarray(pw), jnp.asarray(count, jnp.int32)),
            interpret=True,
        )
        return sym2, w2, int(n2), np.asarray(pcnt)

    def test_matches_masked_pairs_recount(self):
        rng = np.random.default_rng(19)
        n = 5000
        symf, wf = _random_stream(rng, n, alphabet=10)
        # probe the affected shapes of merging (5,7)->300: pairs ending in
        # 5, starting with 7, plus unrelated live pairs
        words = [pack_pair(a, b) for a, b in
                 ((2, 5), (3, 5), (7, 2), (7, 9), (1, 2), (4, 4), (9, 1))]
        sym2, w2, n2, pcnt = self._run(symf, wf, n, pack_pair(5, 7), 300, words, len(words))
        ref = self._host_counts(sym2, w2, n2, words)
        np.testing.assert_array_equal(pcnt[: len(words)], ref)

    def test_cross_block_boundary_pairs(self):
        # multi-block stream: the injected cross-window boundary pair and
        # carry-tile edges must each be counted exactly once
        rng = np.random.default_rng(23)
        n = 2 * BLOCK + 913
        symf, wf = _random_stream(rng, n, alphabet=5)
        words = [pack_pair(a, b) for a in range(1, 5) for b in range(1, 5)]
        from gpu_bpe_tpu.ops.pallas_kernels import N_PROBES

        words = words[:N_PROBES]
        sym2, w2, n2, pcnt = self._run(symf, wf, n, pack_pair(2, 3), 300, words, len(words))
        ref = self._host_counts(sym2, w2, n2, words)
        np.testing.assert_array_equal(pcnt[: len(words)], ref)

    def test_unused_slots_accumulate_nothing(self):
        # slots at index >= count must stay 0 even when their word matches
        # live pairs — masking is by slot index, not a sentinel word
        rng = np.random.default_rng(29)
        n = 3000
        symf, wf = _random_stream(rng, n, alphabet=6)
        words = [pack_pair(1, 2), pack_pair(3, 4), pack_pair(2, 3)]
        _s, _w, _n2, pcnt = self._run(symf, wf, n, pack_pair(4, 5), 300, words, count=1)
        assert np.all(pcnt[1:] == 0)
        ref = self._host_counts(_s, _w, _n2, words[:1])
        assert pcnt[0] == ref[0]

    def test_probeless_call_unchanged(self):
        # the 6-tuple API of round 1 still stands when probes is omitted
        from gpu_bpe_tpu.ops.pallas_kernels import merge_compact_tracked

        rng = np.random.default_rng(31)
        symf, wf = _random_stream(rng, 2000, alphabet=6)
        out = merge_compact_tracked(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(2000),
            jnp.uint32(pack_pair(2, 3)), jnp.uint32(300), interpret=True,
        )
        assert len(out) == 6


def test_kernel_wrapper_contract_traces():
    """Trace tripwire: every exported Pallas entry point must TRACE with
    its wrapper's argument list (jax.eval_shape — no execution, no
    device). A kernel/wrapper signature drift (the round-2 HEAD breakage:
    kernel grew pcnt/pacc but _merge_compact_call passed the old list)
    fails here in milliseconds instead of deep inside a jit on device."""
    import jax

    from gpu_bpe_tpu.ops import pallas_kernels as pk

    cap = 2048
    sym = jnp.zeros((cap,), jnp.uint32)
    w = jnp.zeros((cap,), jnp.int32)
    n = jnp.asarray(100, jnp.int32)
    pair = jnp.uint32(pack_pair(2, 3))
    nid = jnp.uint32(300)

    jax.eval_shape(lambda *a: pk.merge_compact(*a), sym, w, n, pair, nid)
    jax.eval_shape(lambda *a: pk.merge_compact_tracked(*a), sym, w, n, pair, nid)
    probes = (jnp.zeros((pk.N_PROBES,), jnp.uint32), jnp.asarray(0, jnp.int32))
    jax.eval_shape(
        lambda s, ww, nn, p, z, pw, pc: pk.merge_compact_tracked(
            s, ww, nn, p, z, probes=(pw, pc)
        ),
        sym, w, n, pair, nid, *probes,
    )
    jax.eval_shape(lambda *a: pk.count_pairs2(*a), sym, w, n, pair, jnp.uint32(1))
    vals = jnp.zeros((pk.BLOCK,), jnp.uint32)
    jax.eval_shape(lambda v: pk.compact_valid(v), vals)
    jax.eval_shape(lambda v, e: pk.compact_mask(v, [e]), vals, vals)
    mask = jnp.zeros((pk.BLOCK,), jnp.uint32)
    jax.eval_shape(lambda m, v: pk.expand_to_mask(m, v), mask, vals)


class TestCompactValid:
    """compact_valid (tokenizer PAD strip) vs numpy boolean compaction."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(7)

    def _check(self, vals):
        from gpu_bpe_tpu.ops.pallas_kernels import compact_valid

        out, total = compact_valid(jnp.asarray(vals), interpret=True)
        ref = vals[vals != 0xFFFFFFFF]
        assert int(total) == len(ref)
        np.testing.assert_array_equal(np.asarray(out)[: len(ref)], ref)

    def test_random_mask(self, rng):
        n = BLOCK + 4096
        vals = rng.integers(0, 0xFFFF, size=n, dtype=np.uint32)
        vals[rng.random(n) < 0.7] = 0xFFFFFFFF  # tokenizer-like: most are PAD
        self._check(vals)

    def test_all_valid(self, rng):
        self._check(rng.integers(0, 0xFFFF, size=2 * BLOCK, dtype=np.uint32))

    def test_all_invalid(self):
        self._check(np.full(BLOCK, 0xFFFFFFFF, dtype=np.uint32))

    def test_unaligned_length(self, rng):
        # wrapper pads to BLOCK with PAD entries
        vals = rng.integers(0, 0xFFFF, size=3 * BLOCK // 2 + 321, dtype=np.uint32)
        vals[rng.random(len(vals)) < 0.5] = 0xFFFFFFFF
        self._check(vals)

    def test_block_boundary_runs(self, rng):
        # long invalid runs straddling block boundaries (max displacement)
        n = 3 * BLOCK
        vals = rng.integers(0, 0xFFFF, size=n, dtype=np.uint32)
        vals[BLOCK - 100 : 2 * BLOCK + 100] = 0xFFFFFFFF
        vals[: BLOCK // 2] = 0xFFFFFFFF  # first half of block 0 removed
        self._check(vals)

    def test_values_use_full_16_bits(self, rng):
        vals = np.array([0xFFFF, 0xFFFFFFFF, 0x0000, 0xFFFE, 0xFFFFFFFF, 1], np.uint32)
        vals = np.concatenate([vals, np.full(BLOCK - 6, 0xFFFFFFFF, np.uint32)])
        self._check(vals)

    def test_extras_ride_along(self, rng):
        from gpu_bpe_tpu.ops.pallas_kernels import compact_mask

        n = 2 * BLOCK + 777
        prim = rng.integers(0, 0xFFFF, size=n, dtype=np.uint32)
        drop = rng.random(n) < 0.9
        prim[drop] = 0xFFFFFFFF
        ex1 = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        ex2 = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        ex3 = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        outs, total = compact_mask(
            jnp.asarray(prim), [jnp.asarray(ex1), jnp.asarray(ex2), jnp.asarray(ex3)],
            interpret=True,
        )
        keep = ~drop
        g = int(np.sum(keep))
        assert int(total) == g
        np.testing.assert_array_equal(np.asarray(outs[0])[:g], prim[keep])
        np.testing.assert_array_equal(np.asarray(outs[1])[:g], ex1[keep])
        np.testing.assert_array_equal(np.asarray(outs[2])[:g], ex2[keep])
        np.testing.assert_array_equal(np.asarray(outs[3])[:g], ex3[keep])


class TestExpandToMask:
    """expand_to_mask (inverse of compact_mask) vs numpy scatter."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(11)

    def _check(self, mask, vals):
        from gpu_bpe_tpu.ops.pallas_kernels import expand_to_mask

        out = expand_to_mask(jnp.asarray(mask), jnp.asarray(vals), interpret=True)
        ref = np.zeros(len(mask), np.uint32)
        ref[mask.astype(bool)] = vals[: int(mask.astype(bool).sum())]
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_random_sparse(self, rng):
        n = 2 * BLOCK + 555
        mask = rng.random(n) < 0.1
        vals = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        self._check(mask, vals)

    def test_dense(self, rng):
        n = BLOCK + 2048
        mask = rng.random(n) < 0.95
        vals = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        self._check(mask, vals)

    def test_all_set(self, rng):
        n = 2 * BLOCK
        self._check(
            np.ones(n, bool), rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        )

    def test_none_set(self, rng):
        self._check(np.zeros(BLOCK, bool), np.zeros(0, np.uint32))

    def test_window_straddles_tiles(self, rng):
        # counts chosen so block 1's window starts mid-tile (c0 % TILE != 0)
        n = 3 * BLOCK
        mask = np.zeros(n, bool)
        mask[:777] = True  # c0 for block 1 = 777 (unaligned)
        mask[BLOCK : BLOCK + 5000] = True
        mask[2 * BLOCK + 100 :: 7] = True
        vals = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        self._check(mask, vals)

    def test_max_displacement(self, rng):
        # single set bit at the end of each block: d = BLOCK-1 (15 bits)
        n = 2 * BLOCK
        mask = np.zeros(n, bool)
        mask[BLOCK - 1] = True
        mask[2 * BLOCK - 1] = True
        vals = rng.integers(0, 2**32 - 1, size=2, dtype=np.uint32)
        self._check(mask, np.concatenate([vals, np.zeros(n - 2, np.uint32)]))

    def test_roundtrip_with_compact(self, rng):
        from gpu_bpe_tpu.ops.pallas_kernels import compact_mask, expand_to_mask

        n = BLOCK + 4321
        prim = rng.integers(0, 0xFFFF, size=n, dtype=np.uint32)
        drop = rng.random(n) < 0.6
        prim[drop] = 0xFFFFFFFF
        ex = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        outs, total = compact_mask(jnp.asarray(prim), [jnp.asarray(ex)], interpret=True)
        back = expand_to_mask(jnp.asarray(~drop), outs[1], interpret=True)
        ref = np.where(~drop, ex, 0).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(back), ref)


class TestCountPairs2:
    """count_pairs2 vs a host _masked_pairs count (the exactness contract:
    the kernel must reproduce _masked_pairs for ANY pair, including the
    token-0 guards that make sentinel slots count 0)."""

    @staticmethod
    def _host_count(symf, wf, n, pair):
        from jax import lax

        from gpu_bpe_tpu.ops.train_step import _masked_pairs

        cap = symf.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        pair2, w2m, _ = _masked_pairs(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n), iota, 0
        )
        return int(jnp.sum(jnp.where(pair2 == jnp.uint32(pair), w2m, 0)))

    def _check(self, symf, wf, n, p1, p2):
        from gpu_bpe_tpu.ops.pallas_kernels import count_pairs2

        got = np.asarray(
            count_pairs2(
                jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
                jnp.uint32(p1), jnp.uint32(p2), interpret=True,
            )
        )
        assert got[0] == self._host_count(symf, wf, n, p1)
        assert got[1] == self._host_count(symf, wf, n, p2)

    @pytest.mark.parametrize("n", [16, 2771, 40_000])
    def test_random_streams(self, n):
        rng = np.random.default_rng(n + 7)
        symf, wf = _random_stream(rng, n)
        self._check(symf, wf, n, pack_pair(2, 3), pack_pair(4, 5))

    def test_sentinel_and_token0(self):
        # stream CONTAINING token-0 adjacencies: the sentinel pair (0,1)
        # and any token-0 pair must count 0, exactly like _masked_pairs
        n = 4096
        symf = np.zeros(8192, np.uint32)
        rng = np.random.default_rng(3)
        symf[:n] = rng.integers(0, 4, size=n).astype(np.uint32)  # incl. 0
        symf[0] |= 1 << 16
        wf = np.zeros(8192, np.int32)
        wf[:n] = 1
        self._check(symf, wf, n, 1, pack_pair(0, 2))
        self._check(symf, wf, n, pack_pair(2, 3), pack_pair(3, 0))

    def test_block_boundary_pair(self):
        # occurrences exactly straddling the BLOCK edge exercise the halo
        n = BLOCK + 64
        cap = BLOCK * 2
        symf = np.zeros(cap, np.uint32)
        symf[:n] = 7
        symf[0] |= 1 << 16
        symf[BLOCK - 1] = 2
        symf[BLOCK] = 3
        wf = np.zeros(cap, np.int32)
        wf[:n] = 5
        self._check(symf, wf, n, pack_pair(2, 3), pack_pair(7, 7))

    def test_last_element_has_no_successor(self):
        n = 8
        symf = np.zeros(2048, np.uint32)
        symf[:n] = [2 | (1 << 16), 3, 2, 3, 2, 3, 9, 2]
        # symf[n] == 0 past extent; pair (2, <pad>) must not count
        wf = np.zeros(2048, np.int32)
        wf[:n] = 1
        self._check(symf, wf, n, pack_pair(2, 3), pack_pair(9, 2))


def test_noop_pair_zero_is_identity():
    """pair 0 must merge NOTHING, even on a stream with (0,0) adjacencies
    (the neutralized-stop contract in train_step._one_merge)."""
    n = 512
    symf = np.zeros(2048, np.uint32)
    rng = np.random.default_rng(11)
    symf[:n] = rng.integers(0, 3, size=n).astype(np.uint32)  # many 0s
    symf[0] |= 1 << 16
    wf = np.zeros(2048, np.int32)
    wf[:n] = 1
    sym2, w2, n2 = merge_compact(
        jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
        jnp.uint32(0), jnp.uint32(300), interpret=True,
    )
    assert int(n2) == n
    assert np.array_equal(np.asarray(sym2), symf)
    assert np.array_equal(np.asarray(w2), wf)
