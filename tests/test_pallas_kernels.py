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


class TestTrackingKernels:
    """Fused created-pair tracking kernels vs the jnp computations in
    ops/train_step._merge_and_track (interpret mode)."""

    def _post_merge(self, rng, n=5000, z=300):
        symf, wf = _random_stream(rng, n, alphabet=8)
        # plant the "created token" z at some positions
        idx = rng.choice(n, size=n // 20, replace=False)
        symf[idx] = (symf[idx] & np.uint32(0x10000)) | np.uint32(z)
        return jnp.asarray(symf), jnp.asarray(wf)

    def _jnp_ref(self, sym2, w2, z, l_tok, r_tok):
        from gpu_bpe_tpu.ops.train_step import _TOKEN_MASK, _WS_BIT

        tok2 = sym2 & _TOKEN_MASK
        zm = tok2 == jnp.uint32(z)
        prev2 = jnp.roll(sym2, 1)
        next2 = jnp.roll(sym2, -1)
        wl = jnp.where(zm & ((sym2 & _WS_BIT) == 0), w2, 0)
        wr = jnp.where(zm & ((next2 & _WS_BIT) == 0), w2, 0)
        c_l = jnp.sum(jnp.where((prev2 & _TOKEN_MASK) == jnp.uint32(l_tok), wl, 0))
        c_r = jnp.sum(jnp.where((next2 & _TOKEN_MASK) == jnp.uint32(r_tok), wr, 0))
        return wl, wr, prev2, next2, int(c_l), int(c_r)

    def test_sample_matches_argmax_weight(self, rng):
        from gpu_bpe_tpu.ops.pallas_kernels import track_sample

        sym2, w2 = self._post_merge(rng)
        out = np.asarray(track_sample(sym2, w2, jnp.uint32(300), interpret=True))
        wl, wr, prev2, next2, _, _ = self._jnp_ref(sym2, w2, 300, 0, 0)
        assert out[0] == int(jnp.max(wl))
        assert out[2] == int(jnp.max(wr))
        # the sampled token must be a neighbor token at SOME max position
        from gpu_bpe_tpu.ops.train_step import _TOKEN_MASK

        lmax_toks = np.asarray(jnp.where(wl == out[0], prev2 & _TOKEN_MASK, 0xFFFF))
        rmax_toks = np.asarray(jnp.where(wr == out[2], next2 & _TOKEN_MASK, 0xFFFF))
        if out[0] > 0:
            assert out[1] in lmax_toks
        if out[2] > 0:
            assert out[3] in rmax_toks

    def test_bins_and_sums(self, rng):
        from gpu_bpe_tpu.ops.pallas_kernels import _TRACK_SIDE as _UB_SIDE, track_bins
        from gpu_bpe_tpu.ops.train_step import _TOKEN_MASK, _WS_BIT

        sym2, w2 = self._post_merge(rng)
        l_tok, r_tok = 3, 5
        bl, br, sums = track_bins(
            sym2, w2, jnp.uint32(300), jnp.uint32(l_tok), jnp.uint32(r_tok), interpret=True
        )
        wl, wr, prev2, next2, c_l, c_r = self._jnp_ref(sym2, w2, 300, l_tok, r_tok)
        assert int(sums[0]) == c_l and int(sums[1]) == c_r
        # reference histogram with the kernel's bin count
        def ref_hist(toks, wv, excl):
            toks = np.asarray(toks & _TOKEN_MASK).astype(np.uint64)
            wv = np.asarray(jnp.where((toks.astype(np.uint32) == excl), 0, wv))
            h = ((toks * 2654435761) & 0xFFFFFFFF) >> 16
            h = h & (_UB_SIDE * _UB_SIDE - 1)
            out = np.zeros(_UB_SIDE * _UB_SIDE)
            np.add.at(out, h.astype(int), wv)
            return out
        half = ((_UB_SIDE * _UB_SIDE).bit_length() - 1) // 2
        got_l = np.asarray(bl)
        ref_l = ref_hist(prev2, wl, l_tok).reshape(_UB_SIDE, _UB_SIDE)
        assert np.allclose(got_l, ref_l)
        got_r = np.asarray(br)
        ref_r = ref_hist(next2, wr, r_tok).reshape(_UB_SIDE, _UB_SIDE)
        assert np.allclose(got_r, ref_r)

    def test_no_z_positions(self, rng):
        from gpu_bpe_tpu.ops.pallas_kernels import track_bins, track_sample

        symf, wf = _random_stream(rng, 3000, alphabet=8)
        sym2, w2 = jnp.asarray(symf), jnp.asarray(wf)
        out = np.asarray(track_sample(sym2, w2, jnp.uint32(999), interpret=True))
        assert out[0] <= 0 and out[2] <= 0
        bl, br, sums = track_bins(
            sym2, w2, jnp.uint32(999), jnp.uint32(0x10000), jnp.uint32(0x10000), interpret=True
        )
        assert float(jnp.max(bl)) == 0 and float(jnp.max(br)) == 0
        assert int(sums[0]) == 0 and int(sums[1]) == 0
