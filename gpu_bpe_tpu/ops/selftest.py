"""On-device Pallas kernel selftest.

The CI suite pins the merge/compact/tracking kernels in *interpret* mode
(tests/test_pallas_kernels.py), which exercises the algorithm but not the
Mosaic lowering. The historic 64 MB-scale corruption bugs (f32 histogram
slack, DMA tail garbage) were lowering/scale artifacts invisible to
interpret mode — so ``bench.py`` runs this selftest on the real chip at
the start of every benchmark and fails loudly, turning every BENCH_r*.json
into kernel-regression evidence.

Each case compares the Pallas kernel against ``apply_merge_device`` /
jnp roll-based references (the same oracles the CI tests use; those are in
turn conformance-tested against the CPU reference trainer).
"""

from __future__ import annotations

import numpy as np

from ..constants import pack_pair


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


def run_kernel_selftest(interpret: bool = False) -> dict[str, bool]:
    """Run every kernel regression case; returns {case: passed}.

    ``interpret=False`` (the default) lowers through Mosaic on the real
    device — the whole point. The same cases run in interpret mode in CI.
    """
    import jax.numpy as jnp

    from .pallas_kernels import BLOCK, _TRACK_SIDE, merge_compact, merge_compact_tracked
    from .train_step import _TOKEN_MASK, _WS_BIT, apply_merge_device

    results: dict[str, bool] = {}

    def check_merge(name, symf, wf, n, pair, new_id=300):
        clean_s = symf.copy()
        clean_s[n:] = 0
        clean_w = wf.copy()
        clean_w[n:] = 0
        ref = apply_merge_device(
            jnp.asarray(clean_s), jnp.asarray(clean_w), jnp.asarray(n),
            jnp.uint32(pair), jnp.uint32(new_id),
        )
        got = merge_compact(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pair), jnp.uint32(new_id), interpret=interpret,
        )
        results[name] = all(
            np.array_equal(np.asarray(r), np.asarray(g)) for r, g in zip(ref, got)
        )

    rng = np.random.default_rng(7)

    # 1. random stream (mid-size, multi-block)
    symf, wf = _random_stream(rng, 70_000)
    check_merge("random_stream", symf, wf, 70_000, pack_pair(2, 3))

    # 2. overlap-collapse quirk: "aaaa..." merging (a,a)
    symf = np.zeros(2048, np.uint32)
    symf[:300] = 1
    symf[0] |= 1 << 16
    wf = np.zeros(2048, np.int32)
    wf[:300] = 1
    check_merge("overlap_quirk", symf, wf, 300, pack_pair(1, 1))

    # 3. sites straddling kernel block boundaries (halo/carry DMA path)
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
    check_merge("block_boundary_sites", symf, wf, n, pack_pair(2, 3))

    # 4. poisoned tail: garbage past n must not leak (the 64 MB bug class)
    n = 40_000
    cap = 65_536
    base_s, base_w = _random_stream(rng, n)
    symf = np.zeros(cap, np.uint32)
    symf[:n] = base_s[:n]
    wf = np.zeros(cap, np.int32)
    wf[:n] = base_w[:n]
    symf[n:] = np.tile([2, 3], (cap - n) // 2).astype(np.uint32)
    wf[n:] = 999
    check_merge("poisoned_tail", symf, wf, n, pack_pair(2, 3))

    # 5. tracked kernel: histograms + sample vs jnp roll reference,
    #    across a block boundary
    n = 3 * BLOCK // 2 + 77
    symf, wf = _random_stream(rng, n, alphabet=10)
    sym2, w2, _n2, bl, br, samp = merge_compact_tracked(
        jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
        jnp.uint32(pack_pair(5, 7)), jnp.uint32(300), interpret=interpret,
    )
    tok2 = sym2 & _TOKEN_MASK
    zm = tok2 == jnp.uint32(300)
    prev2 = jnp.roll(sym2, 1)
    next2 = jnp.roll(sym2, -1)
    wl = jnp.where(zm & ((sym2 & _WS_BIT) == 0), w2, 0)
    wr = jnp.where(zm & ((next2 & _WS_BIT) == 0), w2, 0)

    def ref_hist(toks, wv):
        t = np.asarray(toks).astype(np.uint64) & 0xFFFF
        h = (((t * 2654435761) & 0xFFFFFFFF) >> 16) & (_TRACK_SIDE * _TRACK_SIDE - 1)
        out = np.zeros(_TRACK_SIDE * _TRACK_SIDE)
        np.add.at(out, h.astype(int), np.asarray(wv))
        return out.reshape(_TRACK_SIDE, _TRACK_SIDE)

    samp = np.asarray(samp)
    ok = np.allclose(np.asarray(bl), ref_hist(prev2, wl))
    ok &= np.allclose(np.asarray(br), ref_hist(next2, wr))
    ok &= samp[0] == int(jnp.max(wl)) and samp[2] == int(jnp.max(wr))
    results["tracked_hist_multiblock"] = bool(ok)

    # 5b. count_pairs2 (per-merge sampled-pair counts): vs a host
    #     _masked_pairs count, with a boundary-straddling occurrence and a
    #     token-0 sentinel pair (must count 0)
    from jax import lax

    from .pallas_kernels import count_pairs2
    from .train_step import _masked_pairs

    n = BLOCK + 200
    cap5 = 2 * BLOCK
    symf = np.zeros(cap5, np.uint32)
    symf[:n] = 7
    symf[0] |= 1 << 16
    symf[BLOCK - 1] = 2
    symf[BLOCK] = 3
    wf = np.zeros(cap5, np.int32)
    wf[:n] = 4
    got = np.asarray(
        count_pairs2(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pack_pair(2, 3)), jnp.uint32(1), interpret=interpret,
        )
    )
    iota5 = lax.broadcasted_iota(jnp.int32, (cap5,), 0)
    p5, w5, _ = _masked_pairs(jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n), iota5, 0)
    want = int(jnp.sum(jnp.where(p5 == jnp.uint32(pack_pair(2, 3)), w5, 0)))
    results["count_pairs2"] = bool(got[0] == want and got[1] == 0)

    # 5c. window probe mode: block-0 in-kernel probe prep must reproduce
    #     the host-side affected-subset gather exactly (probes, n_aff,
    #     pcnt), with streams/bins/samp unchanged vs explicit-probe mode
    def _sec5c():
        from .pallas_kernels import N_PROBES, W_SLOTS, merge_compact_tracked as mct
        from .train_step import K_CANDIDATES

        n = BLOCK + 333
        symf, wf = _random_stream(rng, n, alphabet=12)
        pair = pack_pair(5, 7)
        # a window with some affected candidates: pairs ending in 5 /
        # starting with 7 / the merged pair itself / unrelated / dead slots
        cand = np.full(W_SLOTS, 0xFFFFFFFF, np.uint32)
        counts = np.full(W_SLOTS, -1, np.int32)
        wins = [pack_pair(3, 5), pack_pair(7, 2), pack_pair(5, 7),
                pack_pair(9, 9), pack_pair(2, 5), pack_pair(7, 7)]
        for k, pw in enumerate(wins):
            cand[k] = pw
            counts[k] = 100 - k
        # host-side expected affected subset (the _post_counts rule)
        live = counts >= 0
        ca, cb = cand >> 16, cand & 0xFFFF
        a, b = pair >> 16, pair & 0xFFFF
        aff = live & ((cb == a) | (ca == b)) & (cand != pair)
        exp_probes = cand[aff]
        out_w = mct(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pair), jnp.uint32(300),
            window=(jnp.asarray(cand), jnp.asarray(counts)),
            interpret=interpret,
        )
        sym_w, w_w, n_w, bl_w, br_w, samp_w, pcnt_w, probes_w, naff_w = out_w
        exp_list = np.full(N_PROBES, 1, np.uint32)
        exp_list[: len(exp_probes)] = exp_probes
        out_e = mct(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pair), jnp.uint32(300),
            probes=(jnp.asarray(exp_list), jnp.asarray(len(exp_probes), jnp.int32)),
            interpret=interpret,
        )
        sym_e, w_e, n_e, bl_e, br_e, samp_e, pcnt_e = out_e
        ok = int(naff_w[0]) == int(aff.sum())
        ok &= np.array_equal(
            np.asarray(probes_w).astype(np.uint32), exp_list
        )
        for x, y in ((sym_w, sym_e), (w_w, w_e), (bl_w, bl_e), (br_w, br_e),
                     (samp_w, samp_e), (pcnt_w, pcnt_e)):
            ok &= np.array_equal(np.asarray(x), np.asarray(y))
        ok &= int(n_w) == int(n_e)
        return bool(ok)

    results["window_probe_prep"] = _sec5c()

    # 5c2. probe counts vs ground truth with HEAVY weights (> 2^16): the
    #      round-5 matmul probe counter once returned counts mod 2^16 on
    #      real hardware — a Mosaic lowering artifact of a sub-tile [4, B]
    #      operand, INVISIBLE to interpret mode and to any case whose
    #      counts stay below 65536. This case pins the full 32-bit range.
    def _sec5c2():
        from .pallas_kernels import N_PROBES, W_SLOTS, merge_compact_tracked as mct
        from .train_step import _masked_pairs

        n = 2 * BLOCK + 77
        symf, wf = _random_stream(rng, n, alphabet=8)
        wf = wf.astype(np.int32) * 40_000  # single-site weights past 2^16
        pair = pack_pair(3, 4)
        cand = np.full(W_SLOTS, 0xFFFFFFFF, np.uint32)
        counts = np.full(W_SLOTS, -1, np.int32)
        wins = [pack_pair(2, 3), pack_pair(4, 5), pack_pair(6, 3),
                pack_pair(4, 7), pack_pair(1, 3), pack_pair(4, 2)]
        for k, pw in enumerate(wins):
            cand[k] = pw
            counts[k] = 10 + k
        out = mct(
            jnp.asarray(symf), jnp.asarray(wf), jnp.asarray(n),
            jnp.uint32(pair), jnp.uint32(300),
            window=(jnp.asarray(cand), jnp.asarray(counts)),
            interpret=interpret,
        )
        sym2, w2, n2, _bl, _br, _samp, pcnt, probes_w, naff_w = out
        naff = int(naff_w[0])
        if not (0 < naff <= N_PROBES):
            return False
        import jax
        from jax import lax

        cap = int(jnp.asarray(symf).shape[0])
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        p2, w2m, _ = _masked_pairs(sym2, w2, n2, iota, 0)
        p_h = np.asarray(p2)
        w_h = np.asarray(w2m).astype(np.int64)
        pc = np.asarray(pcnt)
        pr = np.asarray(probes_w).view(np.uint32)
        ok = True
        any_heavy = False
        for k in range(naff):
            want = int(w_h[p_h == pr[k]].sum())
            any_heavy |= want > (1 << 16)
            ok &= int(pc[k]) == want
        # the case must actually exercise the high limbs to mean anything
        return bool(ok and any_heavy)

    results["probe_count_heavy"] = _sec5c2()

    # 5d. window_post kernel vs a numpy reference of the classic
    #     _merge_and_track tail (count adoption, scratch append, histogram
    #     exclusion + ceiling, log row, scalar advances, next winner)
    def _sec5d():
        from .pallas_kernels import N_PROBES, W_SLOTS, window_post
        from ..constants import BATCH_MERGES

        r2 = np.random.default_rng(11)
        cand = r2.integers(1, 1 << 17, size=W_SLOTS).astype(np.uint32)
        cand[0] = pack_pair(5, 7)
        counts = r2.integers(0, 1000, size=W_SLOTS).astype(np.int32)
        counts[200:] = -1
        cand[200:] = 0xFFFFFFFF
        pair = np.uint32(pack_pair(5, 7))
        bins_l = r2.random((_TRACK_SIDE, _TRACK_SIDE)).astype(np.float32) * 500
        bins_r = r2.random((_TRACK_SIDE, _TRACK_SIDE)).astype(np.float32) * 500
        log = np.zeros(BATCH_MERGES * 3, np.uint32)
        probes = cand[:N_PROBES].copy()
        pcnt = r2.integers(0, 800, size=N_PROBES).astype(np.int32)
        args = dict(
            pair=jnp.uint32(pair), count=jnp.asarray(321, jnp.int32),
            next_id=jnp.uint32(300), theta=jnp.asarray(400, jnp.int32),
            ub_new=jnp.asarray(350, jnp.int32), fill=jnp.asarray(180, jnp.int32),
            merges_done=jnp.asarray(9, jnp.int32), active=jnp.asarray(True),
            early_stop=jnp.asarray(False), use_probes=jnp.asarray(True),
            n_aff=jnp.asarray(6, jnp.int32), c_l=jnp.asarray(77, jnp.int32),
            c_r=jnp.asarray(55, jnp.int32), l_ok=jnp.asarray(True),
            r_ok=jnp.asarray(True), l_tok=jnp.uint32(9), r_tok=jnp.uint32(12),
            has_room=jnp.asarray(True),
            probes=jnp.asarray(probes), pcnt=jnp.asarray(pcnt),
        )
        cand2, counts2, log2, sout = window_post(
            jnp.asarray(cand), jnp.asarray(counts),
            jnp.asarray(bins_l), jnp.asarray(bins_r), jnp.asarray(log),
            interpret=interpret, **args,
        )
        # numpy reference (mirrors ops.train_step classic math)
        live = counts >= 0
        ca, cb = cand >> 16, cand & 0xFFFF
        a, b = int(pair) >> 16, int(pair) & 0xFFFF
        aff = live & ((cb == a) | (ca == b)) & (cand != pair)
        rec = np.zeros(W_SLOTS, np.int32)
        for k in range(6):
            rec = np.maximum(rec, np.where(cand == probes[k], pcnt[k], 0))
        cexp = np.where(aff, rec, counts)
        cexp = np.where(live & (cand == pair), 0, cexp).astype(np.int32)
        pexp = cand.copy()
        pexp[180] = (9 << 16) | (300 & 0xFFFF)
        pexp[181] = ((300 & 0xFFFF) << 16) | 12
        cexp[180] = 77
        cexp[181] = 55
        ok = np.array_equal(np.asarray(cand2), pexp)
        ok &= np.array_equal(np.asarray(counts2), cexp)

        def ub(bins, tok, c):
            h = ((tok * 2654435761) & 0xFFFFFFFF) >> 16 & 255
            b2 = bins.copy().reshape(-1)
            b2[h] -= c
            mx = np.float32(np.float32(b2.max()) * np.float32(1.0 + 4e-3) + np.float32(4.0))
            return int(mx) if mx <= 2e9 else 2**31 - 1

        ub_exp = max(350, max(ub(bins_l, 9, 77), ub(bins_r, 12, 55)))
        so = np.asarray(sout)
        ok &= so[3] == ub_exp
        ok &= so[0] == 10 and so[1] == 182 and so[2] == 0
        ok &= np.uint32(so[6]) == 301
        m2 = cexp.max()
        winner = np.asarray(cand2)[cexp == m2].min()
        ok &= np.uint32(so[7]) == winner and so[4] == m2
        ok &= (so[5] != 0) == bool((m2 > 400) and (m2 > ub_exp) and (m2 >= 2))
        lg = np.asarray(log2)
        ok &= lg[27] == pair and lg[28] == 300 and lg[29] == 321
        return bool(ok)

    results["window_post"] = _sec5d()

    # Tokenizer kernels (sections 6-7) are newer than the merge kernels
    # above; a lowering failure is recorded as False instead of raised, so
    # bench.py can fall back to the XLA tokenizer paths (kill switch
    # GPU_BPE_TPU_NO_TOKENIZE_PALLAS) without losing the bench artifact.

    # 6. compact_valid (tokenizer PAD strip): tokenizer-like sparsity with
    #    invalid runs straddling block boundaries, plus unaligned length
    def _sec6():
        from .pallas_kernels import compact_valid

        n = 3 * BLOCK + 500
        vals = rng.integers(0, 0xFFFF, size=n, dtype=np.uint32).astype(np.uint32)
        vals[rng.random(n) < 0.7] = 0xFFFFFFFF
        vals[BLOCK - 64 : BLOCK + 64] = 0xFFFFFFFF
        out, total = compact_valid(jnp.asarray(vals), interpret=interpret)
        ref_c = vals[vals != 0xFFFFFFFF]
        return int(total) == len(ref_c) and np.array_equal(
            np.asarray(out)[: len(ref_c)], ref_c
        )

    # 7. compact_mask extras + expand_to_mask roundtrip (rank-space join
    #    machinery): full-width payloads ride the compaction, then the
    #    inverse network scatters them back to the original set positions
    def _sec7():
        from .pallas_kernels import compact_mask, expand_to_mask

        n = 2 * BLOCK + 300
        prim = rng.integers(0, 0xFFFF, size=n, dtype=np.uint32)
        drop = rng.random(n) < 0.8
        prim[drop] = 0xFFFFFFFF
        ex = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)
        outs, tot = compact_mask(
            jnp.asarray(prim), [jnp.asarray(ex)], interpret=interpret
        )
        keep = ~drop
        g = int(np.sum(keep))
        ok = int(tot) == g
        ok &= np.array_equal(np.asarray(outs[0])[:g], prim[keep])
        ok &= np.array_equal(np.asarray(outs[1])[:g], ex[keep])
        back = expand_to_mask(jnp.asarray(keep), outs[1], interpret=interpret)
        ok &= np.array_equal(np.asarray(back), np.where(keep, ex, 0).astype(np.uint32))
        return bool(ok)

    for name, fn in (("compact_valid", _sec6), ("compact_expand_roundtrip", _sec7)):
        try:
            results[name] = fn()
        except Exception:  # noqa: BLE001 — lowering failure -> recorded miss
            results[name] = False

    return results
