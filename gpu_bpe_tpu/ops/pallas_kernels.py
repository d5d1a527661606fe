"""Pallas TPU kernels for the BPE training hot path.

``merge_compact`` fuses the reference's ``bpe_merge_reduce_b`` +
``bpe_prefix_sum_scan_blocks_*`` + ``bpe_finalize_compact_b`` trio
(train.wgsl:433-731) into ONE streaming kernel:

* merge rule — read-all-before-write semantics on a +1/+2 lookahead window
  (identical to train.wgsl:475-496 including the overlap-collapse quirk);
* stable compaction — per-block in-VMEM log-shift network (displacement
  bits processed LSB->MSB; valid elements provably never collide), instead
  of the XLA sort the jnp path pays (~1.6 ms per compaction at 1M symbols);
* global placement — the TPU grid is sequential, so a running output
  offset lives in SMEM scratch and each block DMAs its compacted B
  elements to ``out[offset:offset+B]``. Offsets are nondecreasing with
  gaps < B, so a block's garbage tail is overwritten by its successor;
  the caller re-zeroes the final tail (see ``merge_compact_tracked``).
  The grid is DYNAMIC — ceil(n/BLOCK) blocks — so capacity above the
  live stream is never streamed, and blocks hold the stream at natural
  positions with the cross-block prev symbol carried in SMEM (no
  front-pad copy).

Everything runs in the VPU-native [rows, 128] layout; flat-order shifts
are built from ``pltpu.roll`` (row rotate + lane rotate + previous-row
borrow), since Mosaic does not lower misaligned 1-D concatenates.

The kernel leaves the stream fully compacted after EVERY merge, so the
single-chip step that uses it never materializes holes at all — the
deferred-compaction machinery of the jnp path remains as the fallback for
CPU execution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import TOKEN_MASK, WORD_START_BIT

_U32 = jnp.uint32

BLOCK = 1 << 15  # 32K symbols per grid step
_LANES = 128
_ROWS = BLOCK // _LANES


_TILE = 1024  # HBM tile granularity for i32/u32 (8 sublanes x 128 lanes)
_BIG = BLOCK + _TILE  # staging window: carry tile + one block
_BROWS = _BIG // _LANES
_TRACK_SIDE = 16  # tracking-kernel histogram side (16x16=256 bins; [side, B]
#   f32 one-hots must fit VMEM: 2 x [16, 32768] = 4 MB per hist call)
N_PROBES = 64  # fused probe-pair slots. Round 5: 16 was far too small —
#   merges at real window occupancy routinely affect 16..64 tracked
#   candidates, and every overflow pays the [A, N] dense window recount
#   (~105 us/merge measured at the 16 MB depth-1024 state). The matmul
#   probe counter makes 64 slots cost barely more than 16.

# Candidate-window geometry for the fused-window kernels: the tracked
# window (train_step.K_CANDIDATES + S_CREATED) must fill exactly
# [W_ROWS, 128] so window math runs as whole VPU tiles (asserted at the
# train_step import site).
W_SLOTS = 256
W_ROWS = W_SLOTS // _LANES
# scalars[3] sentinel: compute the probe set in-kernel from the candidate
# window (block 0) instead of taking explicit probes from the host
_MODE_WINDOW = 0xFFFFFFFF


def _fshift(x, s):
    """Circular flat-order shift right by ``s``: y[j] = x[(j - s) mod B].

    x is [ROWS, 128]; decomposes into a row rotate plus a lane rotate with
    a previous-row borrow for the sub-lane remainder. ``s`` may be a traced
    scalar (pltpu.roll lowers to dynamic rotates).
    """
    rows = x.shape[0]
    if isinstance(s, int):
        s = s % (rows * _LANES)
        k, rem = divmod(s, _LANES)
        y = pltpu.roll(x, k, axis=0) if k else x
        if rem:
            a = pltpu.roll(y, rem, axis=1)
            b = pltpu.roll(a, 1, axis=0)
            lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
            y = jnp.where(lane >= rem, a, b)
        return y
    k = s // _LANES
    rem = s % _LANES
    y = pltpu.roll(x, k, axis=0)
    a = pltpu.roll(y, rem, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    return jnp.where(lane >= rem, a, b)


def _flat_index(rows=_ROWS):
    r = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    c = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    return r * _LANES + c


def _shift_left_patched(cur, nxt, s, fi):
    """y[j] = window[j + s] where window = cur ++ nxt (flat), s in {1, 2}."""
    main = _fshift(cur, BLOCK - s)  # y[j] = cur[j+s] for j < B-s
    patch = _fshift(nxt, BLOCK - s)  # at j >= B-s: nxt[j-(B-s)]
    return jnp.where(fi < BLOCK - s, main, patch)


def _flat_prefix_sum_excl(x):
    """Exclusive flat-order prefix sum over an [ROWS, LANES] i32 tile.

    Hierarchical: 7 lane-roll rounds build inclusive per-row sums, a tiny
    doubling pass accumulates the row totals, and subtracting ``x``
    makes it exclusive. Shared by the merge-compaction displacement, the
    generic stream compaction, the expansion kernel's rank, and the
    window kernels' probe gather (any row count)."""
    rows = x.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    inc = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        inc = inc + jnp.where(lane >= s, pltpu.roll(inc, s, axis=1), 0)
    row_tot = inc[:, _LANES - 1 :]  # [ROWS, 1] inclusive row sums
    row_iota = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_inc = row_tot
    s = 1
    while s < rows:
        row_inc = row_inc + jnp.where(row_iota >= s, pltpu.roll(row_inc, s, axis=0), 0)
        s <<= 1
    return inc + (row_inc - row_tot) - x


def _merge_compact_kernel(
    scalars_ref,  # SMEM [4+N_PROBES] u32: pair, new id, live n, probe mode, probes
    sym_ref,  # VMEM [ROWS, 128] u32 — this block (logical p at flat t)
    w_ref,  # VMEM [ROWS, 128] i32
    sym_nxt_ref,  # VMEM [ROWS, 128] u32 — next block (halo source)
    cand_ref,  # VMEM [W_ROWS, 128] u32 — candidate window (grid-invariant)
    counts_ref,  # VMEM [W_ROWS, 128] i32 — maintained candidate counts
    out_sym_ref,  # ANY [CAP+BLOCK+TILE] u32 — full output, manual DMA
    out_w_ref,  # ANY [CAP+BLOCK+TILE] i32
    removed_ref,  # SMEM [1] i32 — total removed (written every step)
    bins_ref,  # VMEM [2*TRACK_SIDE, TRACK_SIDE] f32 — created-pair histograms
    samp_ref,  # SMEM [4] i32 — (max_wl, tok_l, max_wr, tok_r) sample
    pcnt_ref,  # SMEM [N_PROBES] i32 — exact post-merge probe-pair counts
    probes_ref,  # SMEM [N_PROBES] i32 — the probe pairs actually counted
    naff_ref,  # SMEM [1] i32 — affected-candidate count (window mode)
    off_ref,  # SMEM scratch [1] i32 — aligned output offset (TILE multiple)
    m_ref,  # SMEM scratch [1] i32 — carry length (0..TILE-1)
    acc_ref,  # SMEM scratch [1] i32 — running removed count
    stage_sym,  # VMEM scratch [BIG] u32 — DMA staging (flat)
    stage_w,  # VMEM scratch [BIG] i32
    carry_sym,  # VMEM scratch [TILE] u32 — partial-tile carry
    carry_w,  # VMEM scratch [TILE] i32
    sem,  # DMA semaphores (2)
    bins_acc,  # VMEM scratch [2*TRACK_SIDE, TRACK_SIDE] f32
    samp_state,  # SMEM scratch [4] i32 — running (max, tok) x 2
    bound_ref,  # SMEM scratch [2] i32 — stream tail (sym, w) across steps
    disp_ref,  # VMEM scratch [ROWS, 128] i32 — displacement (valid iff n_rem>0)
    pacc_ref,  # SMEM scratch [N_PROBES] i32 — running probe counts
    pblast_ref,  # SMEM scratch [1] i32 — previous block's last symbol
    pvals_ref,  # SMEM scratch [N_PROBES] i32 — resolved probe pairs (bitcast)
    npe_ref,  # SMEM scratch [1] i32 — effective probe count (0..N_PROBES)
):
    i = pl.program_id(0)
    tok_mask = jnp.uint32(TOKEN_MASK)
    ws_bit = jnp.uint32(WORD_START_BIT)
    pair = scalars_ref[0]
    new_id = scalars_ref[1]
    n_live = scalars_ref[2].astype(jnp.int32)
    probe_mode = scalars_ref[3]
    a = pair >> jnp.uint32(16)
    b = pair & tok_mask

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0
        m_ref[0] = 0
        acc_ref[0] = 0
        pblast_ref[0] = 0  # no predecessor: prev of position 0 is "none"
        for k in range(N_PROBES):
            pacc_ref[k] = 0

    # ── probe resolution (block 0): either take the host's explicit probe
    # list (scalars[4:]), or — window mode — derive the affected candidate
    # subset from the tracked window right here, replacing the host-side
    # [W] mask/cumsum/gather fusion chain (train_step round-3 HLO showed
    # those tiny window ops dominating iteration time). The affected rule
    # is the _post_counts theorem: only candidates ending in ``a``,
    # starting with ``b``, or equal to the merged pair can change. ──
    @pl.when((i == 0) & (probe_mode != jnp.uint32(_MODE_WINDOW)))
    def _explicit_probes():
        naff_ref[0] = probe_mode.astype(jnp.int32)
        npe_ref[0] = probe_mode.astype(jnp.int32)
        for k in range(N_PROBES):
            pvals_ref[k] = scalars_ref[4 + k].astype(jnp.int32)
            probes_ref[k] = scalars_ref[4 + k].astype(jnp.int32)

    @pl.when((i == 0) & (probe_mode == jnp.uint32(_MODE_WINDOW)))
    def _window_probes():
        cw = cand_ref[:]
        cc = counts_ref[:]
        live = cc >= 0
        ca = cw >> jnp.uint32(16)
        cb = cw & tok_mask
        # noop (pair 0) needs no special case: live candidates never have
        # zero members, so (cb == 0) | (ca == 0) is false on live slots
        aff = live & ((cb == a) | (ca == b)) & (cw != pair)
        aff_i = aff.astype(jnp.int32)
        naff = jnp.sum(aff_i)
        naff_ref[0] = naff
        npe = jnp.where(naff <= N_PROBES, naff, 0)
        npe_ref[0] = npe
        # gather the affected pairs into probe slots by exclusive rank:
        # each rank has exactly one contributor, so a masked sum extracts
        # it (i32 view: same 32 bits, Mosaic has no unsigned reductions)
        rank = _flat_prefix_sum_excl(aff_i)
        cw_i = cw.astype(jnp.int32)
        for k in range(N_PROBES):
            v = jnp.sum(jnp.where(aff & (rank == k), cw_i, 0))
            slot = jnp.where(jnp.int32(k) < npe, v, 1)  # sentinel pair 1
            pvals_ref[k] = slot
            probes_ref[k] = slot

    fi = _flat_index()
    # blocks hold logical positions DIRECTLY (no front-pad copy — round 2
    # padded the whole stream by one zero per merge, two full-array copies
    # of pure HBM traffic). prev is a shift-right with the previous block's
    # last symbol carried in SMEM across the sequential grid; next is a
    # shift-left patched from the halo block. Same read-all-before-write
    # semantics as train.wgsl:475-479.
    self_s = sym_ref[:]
    w_self = w_ref[:]
    next_s = _shift_left_patched(self_s, sym_nxt_ref[:], 1, fi)
    prev_r = _fshift(self_s, 1)  # slot 0 wraps to this block's last — patch
    prev_s = jnp.where(fi == 0, jnp.uint32(pblast_ref[0]), prev_r)
    # carry this block's last symbol for the NEXT block (read-before-write
    # order: prev_s above already consumed the old value). i32 extraction:
    # Mosaic has no unsigned reductions; symbol words are <= 0x1FFFF.
    pblast_ref[0] = jnp.max(
        jnp.where(fi == BLOCK - 1, self_s.astype(jnp.int32), 0)
    )

    p_tok = prev_s & tok_mask
    s_tok = self_s & tok_mask
    n_tok = next_s & tok_mask

    # site at p: pair (p, p+1) matches. removed at p: site at p-1.
    # Both are masked to the LIVE prefix: the output region past the
    # compacted stream is never DMA'd, so it can hold garbage from a
    # recycled buffer — unmasked, that garbage matched pairs and produced
    # phantom removals that silently shrank n (weight-loss corruption
    # first seen at 64 MB corpus scale).
    gpos = i * BLOCK + fi  # logical position of flat slot t
    # pair 0 means NO merge (the system-wide "no winner" value: token-0
    # pairs are never counted, so pair 0 can never win — but token-0
    # ADJACENCIES can exist in binary corpora, so (0,0) must not match).
    # Used by the neutralized-stop iteration in train_step._one_merge.
    noop = pair == 0
    site_here = (
        (s_tok == a) & (n_tok == b) & ((next_s & ws_bit) == 0)
        & (gpos < n_live - 1) & ~noop
    )
    removed = (
        (p_tok == a) & (s_tok == b) & ((self_s & ws_bit) == 0)
        & (gpos < n_live) & ~noop
    )
    vals = jnp.where(site_here, new_id | (self_s & ws_bit), self_s)
    wts = w_self
    keep = ~removed

    rem_i = removed.astype(jnp.int32)
    n_rem = jnp.sum(rem_i)

    # exclusive flat prefix sum of removals = leftward displacement.
    # Hierarchical: 7 lane-prefix rounds on the full tile + a tiny cumsum
    # down the 256 row totals (vs 15 full-tile rounds flat). Computed into
    # scratch ONLY when the block removes anything: with n_rem == 0 the
    # shift loop runs 0 rounds and the packed disp bits are stripped
    # unread, so stale scratch is harmless.
    @pl.when(n_rem > 0)
    def _prefix():
        disp_ref[:] = _flat_prefix_sum_excl(rem_i)

    disp = disp_ref[:]

    # stable log-shift compaction: valid movers never collide (see module
    # docstring); garbage slots may be overwritten freely. The displacement
    # rides in bits 17..31 of the value word (symbols use 17 bits; disp is
    # at most 32767 — removals strictly before the element — so 15 bits
    # always fit), and a vacated or removed slot simply has its disp field
    # zeroed: a zero-disp slot never moves again, which is exactly what the
    # old explicit keep bit enforced. Each round therefore shifts only TWO
    # arrays. Displacements are bounded by the block's removal count, so
    # only bit_length(n_rem) of the 15 rounds can have movers — the loop
    # trip count is dynamic (typical merges remove tens-to-hundreds of
    # symbols per 32K block: 5-9 rounds, 0 for blocks with no removals).
    sym_mask17 = jnp.uint32(0x1FFFF)
    disp_ok = jnp.where(keep, disp, 0).astype(jnp.uint32)
    pk = vals | (disp_ok << jnp.uint32(17))
    n_rounds = 32 - lax.clz(n_rem)

    def round_body(bit, carry):
        pk, wts = carry
        s = 1 << bit
        sbit = jnp.uint32(17) + bit.astype(jnp.uint32)
        in_range = fi < BLOCK - s
        src_pk = _fshift(pk, BLOCK - s)
        src_w = _fshift(wts, BLOCK - s)
        src_m = in_range & (((src_pk >> sbit) & 1) == 1)
        self_m = ((pk >> sbit) & 1) == 1
        # vacated slot: clear its disp so it never moves again
        stay = jnp.where(self_m, pk & sym_mask17, pk)
        pk = jnp.where(src_m, src_pk - (jnp.uint32(s) << jnp.uint32(17)), stay)
        wts = jnp.where(src_m, src_w, wts)
        return pk, wts

    pk, wts = lax.fori_loop(0, n_rounds, round_body, (pk, wts))
    vals = pk & sym_mask17

    # ── aligned-carry output: HBM tiles are TILE elements, so DMAs go to
    # TILE-aligned offsets; the trailing partial tile rides in VMEM ──
    cnt = BLOCK - n_rem
    m = m_ref[0]
    off = off_ref[0]
    fib = _flat_index(_BROWS)
    zpad = jnp.zeros((_TILE // _LANES, _LANES), jnp.int32)

    def build_big(vals2d, carry_flat):
        ext = jnp.concatenate([vals2d, zpad.astype(vals2d.dtype)], axis=0)
        shifted = _fshift(ext, m)  # stream data at flat [m, m+cnt)
        carry2d = jnp.concatenate(
            [carry_flat[:].reshape(_TILE // _LANES, _LANES),
             jnp.zeros((_BROWS - _TILE // _LANES, _LANES), vals2d.dtype)],
            axis=0,
        )
        return jnp.where(fib < m, carry2d, shifted)

    big_sym = build_big(vals, carry_sym)
    big_w = build_big(wts, carry_w)
    stage_sym[:] = big_sym.reshape(_BIG)
    stage_w[:] = big_w.reshape(_BIG)

    total = m + cnt
    writable = (total // _TILE) * _TILE
    new_m = total - writable

    off_a = pl.multiple_of(off, _TILE)
    cp1 = pltpu.make_async_copy(stage_sym, out_sym_ref.at[pl.ds(off_a, _BIG)], sem.at[0])
    cp2 = pltpu.make_async_copy(stage_w, out_w_ref.at[pl.ds(off_a, _BIG)], sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # carry := big[writable : writable + new_m] (garbage beyond new_m ok)
    carry_sym[:] = _fshift(big_sym, _BIG - writable)[: _TILE // _LANES].reshape(_TILE)
    carry_w[:] = _fshift(big_w, _BIG - writable)[: _TILE // _LANES].reshape(_TILE)

    off_ref[0] = off + writable
    m_ref[0] = new_m
    acc_ref[0] = acc_ref[0] + n_rem
    removed_ref[0] = acc_ref[0]

    # ── fused created-pair tracking over the staged compacted window ──
    # Every adjacent pair (u, v) of the compacted stream is processed
    # exactly once: window slots [max(m-1, 0), total-1) this step, plus —
    # when m == 0 — the cross-window pair (previous stream tail, first new
    # element), injected into the first garbage slot past the window. A
    # pair contributes iff v lacks the word-start bit: (u, Z) to the left
    # histogram/sample keyed by u's token with v's weight, and (Z, v) to
    # the right ones keyed by v's token with u's weight. Histograms are
    # UNexcluded — the caller subtracts the sampled pair's exact count
    # from its bin, which equals in-stream exclusion exactly.
    z16 = new_id & tok_mask

    @pl.when(i == 0)
    def _():
        bins_acc[:] = jnp.zeros_like(bins_acc)
        samp_state[0] = -1
        samp_state[1] = 0
        samp_state[2] = -1
        samp_state[3] = 0
        bound_ref[0] = 0
        bound_ref[1] = 0

    u_sym = big_sym
    u_w = big_w
    v_sym = _fshift(big_sym, _BIG - 1)
    v_w = _fshift(big_w, _BIG - 1)
    valid = (fib >= jnp.maximum(m - 1, 0)) & (fib < total - 1)
    inject = (i > 0) & (m == 0) & (cnt > 0)
    # Mosaic has no unsigned reductions — extract through i32 (symbol
    # words are <= 0x1FFFF in the staged window)
    first_sym = jnp.max(jnp.where(fib == m, u_sym.astype(jnp.int32), 0)).astype(jnp.uint32)
    first_w = jnp.max(jnp.where(fib == m, u_w, 0))
    at_slot = fib == total  # first garbage slot (total <= BIG - 1)
    u_sym = jnp.where(inject & at_slot, jnp.uint32(bound_ref[0]), u_sym)
    u_w = jnp.where(inject & at_slot, bound_ref[1], u_w)
    v_sym = jnp.where(inject & at_slot, first_sym, v_sym)
    v_w = jnp.where(inject & at_slot, first_w, v_w)
    valid = valid | (inject & at_slot)
    # the right-pair histogram reindexes through u_tok at slot+1, so the
    # boundary pair's v member must also appear there (total+1 <= BIG-1:
    # injection implies m == 0, so total = cnt <= BLOCK)
    u_sym = jnp.where(inject & (fib == total + 1), first_sym, u_sym)

    u_tok = u_sym & tok_mask
    v_tok = v_sym & tok_mask
    v_ok = valid & ((v_sym & ws_bit) == 0)
    wl = jnp.where(v_ok & (v_tok == z16), v_w, 0)
    wr = jnp.where(v_ok & (u_tok == z16), u_w, 0)

    # ── fused probe-pair counting: exact post-merge pair-stream counts of
    # up to N_PROBES pairs, riding the same staged window. Every adjacent
    # pair of the compacted stream is visited exactly once by the tracking
    # window (incl. the injected cross-window boundary pair), and the v_ok
    # mask reproduces ops.train_step._masked_pairs on a compacted stream
    # for any probe with NONZERO members (a counted pair's members share a
    # word, so u's weight — the _masked_pairs weight — equals v's). This
    # replaces the separate [A, N] affected-recount stream pass when the
    # affected set fits N_PROBES slots (see train_step._post_counts).
    # CONTRACT: the caller must never probe a pair with a zero member —
    # _masked_pairs excludes token 0 (train.wgsl:393-399) but this window
    # does not, so such a probe would over-count; route those to the
    # recount path. Slots at index >= n_probes accumulate nothing (masked
    # by slot index, not by a sentinel word — every u32 is a legal pair).
    n_probes = npe_ref[0]

    # Probe counting in PAY-PER-USE tiers of 16 rows: each tier is an
    # [16, BIG] i32 masked row-sum — integer-exact by construction (an MXU
    # limb formulation returned counts mod 2^16 on real hardware in the
    # full-kernel context — a Mosaic lowering artifact invisible both to
    # interpret mode and to the same dot in isolation; see the
    # probe_count_heavy selftest case that pins this). A tier only runs
    # when the affected count reaches it, so the common narrow merge pays
    # one tier while wide merges scale to N_PROBES — the flat [64, BIG]
    # form cost O(64 n) on EVERY merge, ~1 ms at the 64 MB stream size.
    _PT = 16
    for sec in range(N_PROBES // _PT):

        @pl.when(n_probes > _PT * sec)
        def _probe_tier(sec=sec):
            pw = jnp.where(v_ok, (u_tok << jnp.uint32(16)) | v_tok, jnp.uint32(0))
            wv = jnp.where(v_ok, u_w, 0)
            pw1 = pw.reshape(_BIG)
            wv1 = wv.reshape(_BIG)
            pvs = jnp.stack(
                [pvals_ref[_PT * sec + t] for t in range(_PT)]
            ).astype(jnp.uint32)
            live = (
                lax.broadcasted_iota(jnp.int32, (_PT, 1), 0)
                < n_probes - _PT * sec
            )
            oh = (jnp.broadcast_to(pw1, (_PT, _BIG)) == pvs[:, None]) & live
            tot = jnp.sum(
                jnp.where(oh, jnp.broadcast_to(wv1, (_PT, _BIG)), 0), axis=1
            )  # [_PT] i32
            for t in range(_PT):
                pacc_ref[_PT * sec + t] = pacc_ref[_PT * sec + t] + tot[t]

    for k in range(N_PROBES):
        pcnt_ref[k] = pacc_ref[k]

    # Skip the whole tracking section for windows with no created-token
    # mass. Late-training merges rewrite a few hundred positions spread
    # over the stream, so MOST 32K windows carry zero Z mass — and the
    # one-hot builds below are roughly half the kernel's per-block work.
    lmax = jnp.max(wl)
    rmax = jnp.max(wr)

    @pl.when((lmax > 0) | (rmax > 0))
    def _track():
        def upd(base, blk_max, wv, toks):
            blk_tok = jnp.min(jnp.where(wv == blk_max, toks.astype(jnp.int32), 0x7FFFFFFF))

            @pl.when(blk_max > samp_state[base])
            def _():
                samp_state[base] = blk_max
                samp_state[base + 1] = blk_tok

        upd(0, lmax, wl, u_tok)
        upd(2, rmax, wr, v_tok)

        # hashed one-hot histograms on the MXU ([side, B] orientation —
        # the form Mosaic lowers; one-hots live only in VMEM). Both
        # histograms key by u's token: the right-pair sum
        # Σ_p onehot(v_tok[p])·wr[p] reindexes to
        # Σ_p' onehot(u_tok[p'])·wr[p'-1], so ONE pair of token one-hots
        # serves both sides (the left/right weights differ, the compares
        # — the expensive part — are shared).
        side = _TRACK_SIDE
        nbins = side * side
        half = (nbins.bit_length() - 1) // 2
        io = lax.broadcasted_iota(jnp.int32, (side, _BIG), 0)
        toks = u_tok.reshape(_BIG)
        h = ((toks * jnp.uint32(2654435761)) >> jnp.uint32(16)) & jnp.uint32(nbins - 1)
        hi = (h >> jnp.uint32(half)).astype(jnp.int32)
        lo = (h & jnp.uint32((1 << half) - 1)).astype(jnp.int32)
        oh_hi = (jnp.broadcast_to(hi, (side, _BIG)) == io).astype(jnp.float32)
        oh_lo = (jnp.broadcast_to(lo, (side, _BIG)) == io).astype(jnp.float32)
        wl_f = wl.reshape(_BIG).astype(jnp.float32)
        wr_prev = _fshift(wr, 1).reshape(_BIG).astype(jnp.float32)
        a_l = oh_hi * jnp.broadcast_to(wl_f, (side, _BIG))
        a_r = oh_hi * jnp.broadcast_to(wr_prev, (side, _BIG))
        dot = functools.partial(
            lax.dot_general,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bins_acc[:side, :] = bins_acc[:side, :] + dot(a_l, oh_lo)
        bins_acc[side:, :] = bins_acc[side:, :] + dot(a_r, oh_lo)

    # boundary carry: the stream's last element so far (window slot total-1)
    @pl.when(total > 0)
    def _():
        bound_ref[0] = jnp.max(jnp.where(fib == total - 1, u_sym.astype(jnp.int32), 0))
        bound_ref[1] = jnp.max(jnp.where(fib == total - 1, u_w, 0))

    # final flush: write the last partial tile (aligned, full-tile DMA)
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        off2 = pl.multiple_of(off_ref[0], _TILE)
        cp3 = pltpu.make_async_copy(carry_sym, out_sym_ref.at[pl.ds(off2, _TILE)], sem.at[0])
        cp4 = pltpu.make_async_copy(carry_w, out_w_ref.at[pl.ds(off2, _TILE)], sem.at[1])
        cp3.start()
        cp4.start()
        cp3.wait()
        cp4.wait()
        bins_ref[:] = bins_acc[:]
        samp_ref[0] = samp_state[0]
        samp_ref[1] = samp_state[1]
        samp_ref[2] = samp_state[2]
        samp_ref[3] = samp_state[3]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _merge_compact_call(sym_blocked, w_blocked, cand, counts, scalars, grid_dyn,
                        interpret=False):
    """``sym_blocked``/``w_blocked`` are BLOCK-multiple arrays holding the
    stream at its natural positions (no front pad — the kernel carries the
    cross-block prev symbol in SMEM). ``grid_dyn`` is the TRACED number of
    blocks to process — ceil(n/BLOCK) — so dead capacity above the live
    stream is never streamed (n is always in (cap/2, cap] on the trainer's
    power-of-two ladder, so this saves up to half the kernel's HBM traffic
    right after a shrink). Interpret mode (CPU tests) runs the full static
    grid instead: extra blocks stream the zero tail through, which appends
    zeros to the output — identical results. ``cand``/``counts`` are the
    [W_SLOTS] candidate window (only read in window probe mode; callers
    pass zeros otherwise)."""
    nbytes = sym_blocked.shape[0]
    nb_arr = nbytes // BLOCK
    sym2 = sym_blocked.reshape(nb_arr * _ROWS, _LANES)
    w2 = w_blocked.reshape(nb_arr * _ROWS, _LANES)
    cand2 = cand.reshape(W_ROWS, _LANES)
    counts2 = counts.reshape(W_ROWS, _LANES)
    grid = nb_arr if interpret else grid_dyn
    out_sym, out_w, removed, bins, samp, pcnt, probes, naff = pl.pallas_call(
        _merge_compact_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((_ROWS, _LANES), lambda i, s: (i, 0)),
                pl.BlockSpec((_ROWS, _LANES), lambda i, s: (i, 0)),
                # halo source: next block, clamped to the ARRAY's last
                # block (NOT num_programs — the grid may stop short of the
                # array). Clamped values only reach positions masked by
                # gpos < n_live - 1.
                pl.BlockSpec(
                    (_ROWS, _LANES),
                    lambda i, s: (jnp.minimum(i + 1, nb_arr - 1), 0),
                ),
                pl.BlockSpec((W_ROWS, _LANES), lambda i, s: (0, 0)),
                pl.BlockSpec((W_ROWS, _LANES), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2 * _TRACK_SIDE, _TRACK_SIDE), lambda i, s: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((_BIG,), jnp.uint32),
                pltpu.VMEM((_BIG,), jnp.int32),
                pltpu.VMEM((_TILE,), jnp.uint32),
                pltpu.VMEM((_TILE,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2 * _TRACK_SIDE, _TRACK_SIDE), jnp.float32),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.VMEM((_ROWS, _LANES), jnp.int32),
                pltpu.SMEM((N_PROBES,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((N_PROBES,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nbytes + BLOCK + _TILE,), jnp.uint32),
            jax.ShapeDtypeStruct((nbytes + BLOCK + _TILE,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((2 * _TRACK_SIDE, _TRACK_SIDE), jnp.float32),
            jax.ShapeDtypeStruct((4,), jnp.int32),
            jax.ShapeDtypeStruct((N_PROBES,), jnp.int32),
            jax.ShapeDtypeStruct((N_PROBES,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars, sym2, w2, sym2, cand2, counts2)
    return out_sym, out_w, removed, bins, samp, pcnt, probes, naff


def merge_compact(symbols, weights, n, pair, new_id, interpret=False):
    """One merge + full stable compaction of a hole-free stream.

    symbols/weights are CAP-sized with zeros past ``n`` (zeros never pair:
    the winning pair never has a zero member). Returns (symbols', weights',
    n') with the same CAP, compacted and zero-tailed.

    Semantics identical to ops.train_step.apply_merge_device (tested
    against it); replaces the kernel trio at train.wgsl:433-731.
    """
    sym_out, w_out, n_new, _bins_l, _bins_r, _samp = merge_compact_tracked(
        symbols, weights, n, pair, new_id, interpret=interpret
    )
    return sym_out, w_out, n_new


def _count_pairs_kernel(
    scalars_ref,  # SMEM [4] u32: pair1, pair2, live n, pad
    sym_ref,  # VMEM [ROWS, 128] u32 — this block (logical p at flat t)
    w_ref,  # VMEM [ROWS, 128] i32
    sym_nxt_ref,  # VMEM [ROWS, 128] u32 — next block (halo source)
    cnt_ref,  # SMEM [2] i32 — exact pair-stream counts (written every step)
    acc_ref,  # SMEM scratch [2] i32 — running sums
):
    """Exact pair-stream counts of TWO pairs over a hole-free stream.

    Reproduces ``ops.train_step._masked_pairs`` on a compacted stream
    EXACTLY (including the token-0 guards, so sentinel pairs with a zero
    member count 0): pair (p, p+1) contributes ``w[p]`` iff p < n-1, the
    successor lacks the word-start bit, and neither token is 0
    (train.wgsl:393-399). One streaming read at ceil(n/BLOCK) blocks —
    the per-merge sampled-created-pair counts previously cost a full
    O(capacity) XLA pass."""
    i = pl.program_id(0)
    tok_mask = jnp.uint32(TOKEN_MASK)
    ws_bit = jnp.uint32(WORD_START_BIT)
    p1 = scalars_ref[0]
    p2 = scalars_ref[1]
    n_live = scalars_ref[2].astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = 0
        acc_ref[1] = 0

    fi = _flat_index()
    self_s = sym_ref[:]
    next_s = _shift_left_patched(self_s, sym_nxt_ref[:], 1, fi)
    gpos = i * BLOCK + fi
    s_tok = self_s & tok_mask
    n_tok = next_s & tok_mask
    valid = (
        (gpos < n_live - 1)
        & ((next_s & ws_bit) == 0)
        & (s_tok != 0)
        & (n_tok != 0)
    )
    pairw = jnp.where(valid, (s_tok << jnp.uint32(16)) | n_tok, jnp.uint32(0))
    # weights masked too: pair 0 (the system-wide no-winner value) must
    # count 0 exactly like _masked_pairs, not sum every invalid slot
    w = jnp.where(valid, w_ref[:], 0)
    acc_ref[0] = acc_ref[0] + jnp.sum(jnp.where(pairw == p1, w, 0))
    acc_ref[1] = acc_ref[1] + jnp.sum(jnp.where(pairw == p2, w, 0))
    cnt_ref[0] = acc_ref[0]
    cnt_ref[1] = acc_ref[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_pairs2(symbols, weights, n, pair1, pair2, interpret=False):
    """Exact ``_masked_pairs`` counts of two pairs: i32 [2].

    ``symbols``/``weights`` are CAP-sized, hole-free, zero past ``n``. The
    grid is dynamic (ceil(n/BLOCK) blocks — interpret mode runs the full
    static grid; the zero tail counts nothing either way)."""
    cap = symbols.shape[0]
    nbytes = max(((cap + BLOCK - 1) // BLOCK) * BLOCK, BLOCK)
    if nbytes != cap:
        sym_b = jnp.zeros((nbytes,), _U32).at[:cap].set(symbols)
        w_b = jnp.zeros((nbytes,), jnp.int32).at[:cap].set(weights)
    else:
        sym_b = jnp.asarray(symbols, _U32)
        w_b = jnp.asarray(weights, jnp.int32)
    nb_arr = nbytes // BLOCK
    sym2 = sym_b.reshape(nb_arr * _ROWS, _LANES)
    w2 = w_b.reshape(nb_arr * _ROWS, _LANES)
    scalars = jnp.stack(
        [
            jnp.asarray(pair1, _U32),
            jnp.asarray(pair2, _U32),
            jnp.asarray(n, jnp.int32).astype(_U32),
            jnp.zeros((), _U32),
        ]
    )
    grid_dyn = jnp.maximum((jnp.asarray(n, jnp.int32) + BLOCK - 1) // BLOCK, 1)
    grid = nb_arr if interpret else grid_dyn
    (cnt,) = pl.pallas_call(
        _count_pairs_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((_ROWS, _LANES), lambda i, s: (i, 0)),
                pl.BlockSpec((_ROWS, _LANES), lambda i, s: (i, 0)),
                # halo: next block, clamped to the ARRAY's last block (the
                # grid may stop short); clamped values only reach positions
                # masked by gpos < n - 1
                pl.BlockSpec(
                    (_ROWS, _LANES),
                    lambda i, s: (jnp.minimum(i + 1, nb_arr - 1), 0),
                ),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars, sym2, w2, sym2)
    return cnt


def _make_compact_kernel(n_extra: int):
    """Kernel factory: stable stream compaction of a primary u32 array
    (16-bit payload; sentinel 0xFFFFFFFF = dropped) plus ``n_extra`` full
    u32 payload arrays that ride along.

    The merge kernel's displacement network + aligned-carry DMA: primary
    payloads occupy bits 0..15, the leftward displacement rides in bits
    16..30 (disp < BLOCK = 2^15 always fits), and a vacated or removed
    slot zeroes its disp so it never moves again. Extra arrays shift in
    lockstep with the primary (the merge kernel moves weights the same
    way).
    """

    def kernel(*refs):
        (val_ref, *rest) = refs
        extra_refs = rest[:n_extra]
        out_refs = rest[n_extra : 2 * n_extra + 1]
        total_ref = rest[2 * n_extra + 1]
        (off_ref, m_ref, acc_ref) = rest[2 * n_extra + 2 : 2 * n_extra + 5]
        stages = rest[2 * n_extra + 5 : 3 * n_extra + 6]
        carries = rest[3 * n_extra + 6 : 4 * n_extra + 7]
        sem = rest[4 * n_extra + 7]
        disp_ref = rest[4 * n_extra + 8]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            off_ref[0] = 0
            m_ref[0] = 0
            acc_ref[0] = 0

        fi = _flat_index()
        vals = val_ref[:]
        extras = [r[:] for r in extra_refs]
        keep = vals != jnp.uint32(0xFFFFFFFF)
        rem_i = (~keep).astype(jnp.int32)
        n_rem = jnp.sum(rem_i)

        # exclusive flat prefix sum of removals = leftward displacement
        # (identical hierarchical scheme to _merge_compact_kernel; with
        # n_rem == 0 the shift loop runs 0 rounds, stale scratch unread)
        @pl.when(n_rem > 0)
        def _prefix():
            disp_ref[:] = _flat_prefix_sum_excl(rem_i)

        disp = disp_ref[:]
        pay_mask = jnp.uint32(0xFFFF)
        disp_ok = jnp.where(keep, disp, 0).astype(jnp.uint32)
        pk = (vals & pay_mask) | (disp_ok << jnp.uint32(16))
        n_rounds = 32 - lax.clz(n_rem)

        def round_body(bit, carry_t):
            pk = carry_t[0]
            exs = carry_t[1:]
            s = 1 << bit
            sbit = jnp.uint32(16) + bit.astype(jnp.uint32)
            in_range = fi < BLOCK - s
            src = _fshift(pk, BLOCK - s)
            src_m = in_range & (((src >> sbit) & 1) == 1)
            self_m = ((pk >> sbit) & 1) == 1
            stay = jnp.where(self_m, pk & pay_mask, pk)  # vacated: disp := 0
            pk2 = jnp.where(src_m, src - (jnp.uint32(s) << jnp.uint32(16)), stay)
            exs2 = tuple(jnp.where(src_m, _fshift(e, BLOCK - s), e) for e in exs)
            return (pk2,) + exs2

        moved = lax.fori_loop(0, n_rounds, round_body, (pk,) + tuple(extras))
        streams = [moved[0] & pay_mask, *moved[1:]]

        # aligned-carry DMA (same scheme as _merge_compact_kernel)
        cnt = BLOCK - n_rem
        m = m_ref[0]
        off = off_ref[0]
        fib = _flat_index(_BROWS)
        zpad = jnp.zeros((_TILE // _LANES, _LANES), jnp.uint32)

        total = m + cnt
        writable = (total // _TILE) * _TILE
        new_m = total - writable
        off_a = pl.multiple_of(off, _TILE)

        bigs = []
        for k, vstream in enumerate(streams):
            ext = jnp.concatenate([vstream, zpad], axis=0)
            shifted = _fshift(ext, m)
            carry2d = jnp.concatenate(
                [carries[k][:].reshape(_TILE // _LANES, _LANES),
                 jnp.zeros((_BROWS - _TILE // _LANES, _LANES), jnp.uint32)],
                axis=0,
            )
            big = jnp.where(fib < m, carry2d, shifted)
            bigs.append(big)
            stages[k][:] = big.reshape(_BIG)

        cps = [
            pltpu.make_async_copy(stages[k], out_refs[k].at[pl.ds(off_a, _BIG)], sem.at[k])
            for k in range(len(streams))
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        for k, big in enumerate(bigs):
            carries[k][:] = _fshift(big, _BIG - writable)[: _TILE // _LANES].reshape(_TILE)
        off_ref[0] = off + writable
        m_ref[0] = new_m
        acc_ref[0] = acc_ref[0] + cnt
        total_ref[0] = acc_ref[0]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            off2 = pl.multiple_of(off_ref[0], _TILE)
            cps2 = [
                pltpu.make_async_copy(carries[k], out_refs[k].at[pl.ds(off2, _TILE)], sem.at[k])
                for k in range(len(streams))
            ]
            for cp in cps2:
                cp.start()
            for cp in cps2:
                cp.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("n_extra", "interpret"))
def _compact_mask_call(vals_padded, extras_padded, n_extra, interpret=False):
    npad = vals_padded.shape[0]
    grid = npad // BLOCK
    v2 = vals_padded.reshape(grid * _ROWS, _LANES)
    e2 = [e.reshape(grid * _ROWS, _LANES) for e in extras_padded]
    n_arr = 1 + n_extra
    outs = pl.pallas_call(
        _make_compact_kernel(n_extra),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))] * n_arr,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ]
            + [pltpu.VMEM((_BIG,), jnp.uint32)] * n_arr
            + [pltpu.VMEM((_TILE,), jnp.uint32)] * n_arr
            + [
                pltpu.SemaphoreType.DMA((n_arr,)),
                pltpu.VMEM((_ROWS, _LANES), jnp.int32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((npad + _TILE,), jnp.uint32)] * n_arr
        + [jax.ShapeDtypeStruct((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(v2, *e2)
    return outs[:n_arr], outs[n_arr]


def compact_mask(vals, extras=(), interpret=False):
    """Stable compaction of a u32 stream: entries whose PRIMARY word is
    0xFFFFFFFF are dropped, survivors keep their order. The primary word's
    low 16 bits are the payload (bits 16..30 carry in-flight displacement);
    each array in ``extras`` is a full-width u32 payload compacted by the
    same mask. Returns ``([primary_c, *extras_c], total)`` — outputs have
    the input length, entries past ``total`` are unspecified garbage.
    """
    n = vals.shape[0]
    npad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    if npad != n:
        sent = jnp.full((npad - n,), jnp.uint32(0xFFFFFFFF), _U32)
        vals = jnp.concatenate([vals, sent])
        extras = [jnp.concatenate([e.astype(_U32), jnp.zeros((npad - n,), _U32)]) for e in extras]
    outs, total = _compact_mask_call(
        vals.astype(_U32), tuple(e.astype(_U32) for e in extras), len(extras),
        interpret=interpret,
    )
    return [o[:n] for o in outs], total[0]


def compact_valid(vals, interpret=False):
    """Stable compaction of a u32 stream of 16-bit payloads: entries equal
    to 0xFFFFFFFF (INVALID_TOKEN / PAD) are dropped, survivors keep their
    order. Returns ``(compacted, total)`` where ``compacted`` has the input
    length (entries past ``total`` are unspecified garbage — callers slice).

    Replaces the XLA sort-based PAD strip in the tokenizer's encode pass
    (one O(N log^2 N) sort -> one streaming O(N) pass); the displacement
    network is the proven one from ``merge_compact`` (train.wgsl:664-731's
    role). Payloads MUST fit 16 bits (token ids are 16-bit by design,
    train.wgsl:37) — bits 16..30 carry the in-flight displacement.
    """
    outs, total = compact_mask(vals, (), interpret=interpret)
    return outs[0], total


def _expand_mask_kernel(
    mask_ref,  # VMEM [ROWS, 128] u32 — 1 where a value lands, 0 elsewhere
    vals_ref,  # ANY [MPAD] u32 — full compacted value stream, windowed DMA
    out_ref,  # VMEM [ROWS, 128] u32 — standard blocked output
    acc_ref,  # SMEM scratch [1] i32 — set-mask count before this block
    win_ref,  # VMEM scratch [BIG] u32 — value window staging
    sem,  # DMA semaphore
):
    """Inverse of ``compact_mask``: out[p] = vals[rank(p)] at set positions.

    Per block: (1) DMA the value window vals[align(c0) : +BIG] into VMEM
    (c0 = set count before the block; offsets TILE-aligned), (2) an
    intra-block LEFT compaction moves each set position's target
    displacement d(p) = p_local - rank_local(p) down to its value's slot,
    (3) a mirrored RIGHT displacement network carries (value, d) pairs up
    to their target positions. Both networks are the log-shift scheme;
    movers never collide because d is nondecreasing along the stream and
    targets are strictly increasing — but the right network must consume
    bits MSB-first (see the stage-2 comment) where the left ones go
    LSB-first.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = 0

    fi = _flat_index()
    mask = mask_ref[:] != 0
    mask_i = mask.astype(jnp.int32)
    cnt = jnp.sum(mask_i)
    c0 = acc_ref[0]

    # value window: vals[c0 .. c0 + cnt) lives inside [off_al, off_al + BIG)
    off_al = (c0 // _TILE) * _TILE
    start = c0 - off_al
    cp = pltpu.make_async_copy(vals_ref.at[pl.ds(pl.multiple_of(off_al, _TILE), _BIG)], win_ref, sem)
    cp.start()

    # rank = exclusive prefix sum of mask (hierarchical, as the compaction)
    rank = _flat_prefix_sum_excl(mask_i)

    # ── stage 1: left-compact each set position's displacement d = p - rank
    # down to slot ``rank``; d < BLOCK fits the 16-bit payload field, and
    # the compaction displacement IS d itself ──
    d_tgt = fi - rank
    pay_mask = jnp.uint32(0xFFFF)
    du = d_tgt.astype(jnp.uint32)
    pk = jnp.where(mask, du | (du << jnp.uint32(16)), jnp.uint32(0))
    n_rounds = 32 - lax.clz(jnp.max(jnp.where(mask, d_tgt, 0)))

    def left_round(bit, pk):
        s = 1 << bit
        sbit = jnp.uint32(16) + bit.astype(jnp.uint32)
        in_range = fi < BLOCK - s
        src = _fshift(pk, BLOCK - s)
        src_m = in_range & (((src >> sbit) & 1) == 1)
        self_m = ((pk >> sbit) & 1) == 1
        stay = jnp.where(self_m, pk & pay_mask, pk)
        return jnp.where(src_m, src - (jnp.uint32(s) << jnp.uint32(16)), stay)

    pk = lax.fori_loop(0, n_rounds, left_round, pk)
    # slot r < cnt now holds d of the r-th set position
    d_src = (pk & pay_mask).astype(jnp.int32)
    fj = fi
    d_src = jnp.where(fj < cnt, d_src, 0)

    # local values: v[j] = vals[c0 + j] (shift the DMA window down by start)
    cp.wait()
    win2d = win_ref[:].reshape(_BROWS, _LANES)
    v_local = _fshift(win2d, _BIG - start)[:_ROWS]
    v = jnp.where(fj < cnt, v_local, jnp.uint32(0))

    # ── stage 2: mirrored RIGHT shifts carry (value, d) to target slots.
    # MSB-first is load-bearing: with d non-decreasing and targets strictly
    # increasing, intermediate positions t - (d mod 2^b) stay distinct only
    # when high bits are consumed first (LSB-first collides, e.g. d=[1,2]
    # at slots 0,1: the s=1 round lands element 0 on still-waiting element
    # 1). The left networks are the opposite: t + high-bits(d) needs
    # LSB-first. ──
    n_rounds2 = 32 - lax.clz(jnp.max(d_src))

    def right_round(k, carry):
        v, d = carry
        bit = n_rounds2 - 1 - k
        s = 1 << bit
        in_range = fi >= s
        src_v = _fshift(v, s)
        src_d = _fshift(d, s)
        src_m = in_range & (((src_d >> bit) & 1) == 1)
        self_m = ((d >> bit) & 1) == 1
        d_stay = jnp.where(self_m, 0, d)  # vacated slot never moves again
        d2 = jnp.where(src_m, src_d - s, d_stay)
        v2 = jnp.where(src_m, src_v, v)
        return v2, d2

    v, _d = lax.fori_loop(0, n_rounds2, right_round, (v, d_src))
    out_ref[:] = jnp.where(mask, v, jnp.uint32(0))
    acc_ref[0] = c0 + cnt


@functools.partial(jax.jit, static_argnames=("interpret",))
def _expand_mask_call(mask_padded, vals_padded, interpret=False):
    npad = mask_padded.shape[0]
    grid = npad // BLOCK
    m2 = mask_padded.reshape(grid * _ROWS, _LANES)
    out = pl.pallas_call(
        _expand_mask_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((_BIG,), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((grid * _ROWS, _LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(m2, vals_padded)
    return out.reshape(npad)


def expand_to_mask(mask, vals, interpret=False):
    """Place ``vals[r]`` at the r-th set position of ``mask`` (u32 zeros
    elsewhere) — the inverse of ``compact_mask``. ``mask`` is a boolean (or
    0/1) array of length n; ``vals`` must hold at least ``sum(mask)``
    leading valid entries. Returns a u32 array of length n.
    """
    n = mask.shape[0]
    npad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    mask_u = mask.astype(_U32)
    if npad != n:
        mask_u = jnp.concatenate([mask_u, jnp.zeros((npad - n,), _U32)])
    # window reads reach [align(c0), +BIG); c0 <= m, so pad by BIG
    vals_u = jnp.concatenate(
        [vals.astype(_U32), jnp.zeros((_BIG + (-vals.shape[0]) % _TILE,), _U32)]
    )
    out = _expand_mask_call(mask_u, vals_u, interpret=interpret)
    return out[:n]


_WP_NSC = 18 + 2 * N_PROBES  # window-post scalar words


def _window_post_kernel(
    sc,  # SMEM [_WP_NSC] u32 — packed scalars (see window_post wrapper)
    cand_ref,  # VMEM [W_ROWS, 128] u32 — candidate window (pre-append)
    counts_ref,  # VMEM [W_ROWS, 128] i32 — counts (dense-updated when ~use_probes)
    bins_l_ref,  # VMEM [S, S] f32 — unexcluded created-pair histograms
    bins_r_ref,  # VMEM [S, S] f32
    log_ref,  # VMEM [LOG_ROWS, 128] u32 — merge log, flattened
    cand_out,  # VMEM [W_ROWS, 128] u32
    counts_out,  # VMEM [W_ROWS, 128] i32
    log_out,  # VMEM [LOG_ROWS, 128] u32
    sout,  # SMEM [8] i32 — md2, fill2, early2, ub_new2, pend_count, pend_cert,
    #                        next_id2 (bitcast), pend_pair (bitcast)
):
    """Post-merge window maintenance in ONE kernel (train_step's fused
    path): probe-count adoption, merged-pair zeroing, scratch append,
    histogram exclusion + created-pair ceiling, merge-log row, scalar
    advances, and NEXT-iteration winner selection + certificate. Replaces
    ~40 tiny XLA fusions per training iteration (round-3 HLO diagnosis:
    the loop body was op-count-bound at ~2 us launch overhead per op)."""
    tok_mask = jnp.uint32(TOKEN_MASK)
    i32 = jnp.int32
    pair = sc[0]
    cnt_u = sc[1]
    next_id = sc[2]
    theta = sc[3].astype(i32)
    ub_new = sc[4].astype(i32)
    fill = sc[5].astype(i32)
    md = sc[6].astype(i32)
    active = sc[7] != 0
    early_in = sc[8] != 0
    use_probes = sc[9] != 0
    naff = sc[10].astype(i32)
    c_l = sc[11].astype(i32)
    c_r = sc[12].astype(i32)
    l_ok = sc[13] != 0
    r_ok = sc[14] != 0
    l_tok = sc[15]
    r_tok = sc[16]
    has_room = sc[17] != 0  # includes the active gate (host-computed)

    cand = cand_ref[:]
    counts = counts_ref[:]
    live = counts >= 0

    # ── maintained-count adoption from the fused probe counts (certified
    # merges; ~use_probes means counts_ref is already dense-updated) ──
    a = pair >> jnp.uint32(16)
    b = pair & tok_mask
    ca = cand >> jnp.uint32(16)
    cb = cand & tok_mask
    aff = live & ((cb == a) | (ca == b)) & (cand != pair)
    rec = jnp.zeros_like(counts)
    for k in range(N_PROBES):
        hit = (cand == sc[18 + k]) & (jnp.int32(k) < naff)
        rec = jnp.maximum(rec, jnp.where(hit, sc[18 + N_PROBES + k].astype(i32), 0))
    counts_p = jnp.where(aff & use_probes, rec, counts)
    counts_p = jnp.where(live & (cand == pair), 0, counts_p)

    # ── scratch append of the sampled created pairs ──
    z16 = next_id & tok_mask
    inval = jnp.uint32(0xFFFFFFFF)
    l_pair = jnp.where(l_ok, (l_tok << jnp.uint32(16)) | z16, inval)
    r_pair = jnp.where(r_ok, (z16 << jnp.uint32(16)) | r_tok, inval)
    slot0 = jnp.where(has_room, fill, W_SLOTS - 2)
    fiw = _flat_index(W_ROWS)
    at0 = has_room & (fiw == slot0)
    at1 = has_room & (fiw == slot0 + 1)
    cand2 = jnp.where(at0, l_pair, cand)
    cand2 = jnp.where(at1, r_pair, cand2)
    counts2 = jnp.where(at0, jnp.where(l_ok, c_l, -1), counts_p)
    counts2 = jnp.where(at1, jnp.where(r_ok, c_r, -1), counts2)
    cand_out[:] = cand2
    counts_out[:] = counts2

    # ── histogram exclusion + created-pair ceiling (_ub_from_bins exact:
    # same f32 constants/order as ops.train_step) ──
    side = _TRACK_SIDE
    nbins = side * side
    half = (nbins.bit_length() - 1) // 2
    ri = lax.broadcasted_iota(i32, (side, side), 0)
    ci = lax.broadcasted_iota(i32, (side, side), 1)

    def excl_ub(bins, tok, c):
        h = ((tok * jnp.uint32(2654435761)) >> jnp.uint32(16)) & jnp.uint32(nbins - 1)
        hi = (h >> jnp.uint32(half)).astype(i32)
        lo = (h & jnp.uint32((1 << half) - 1)).astype(i32)
        b2 = bins - jnp.where((ri == hi) & (ci == lo), c.astype(jnp.float32), 0.0)
        mx = jnp.max(b2) * (1.0 + 4e-3) + 4.0
        return jnp.where(mx > 2e9, jnp.int32(2**31 - 1), mx.astype(i32))

    ub_merge = jnp.maximum(
        excl_ub(bins_l_ref[:], l_tok, c_l), excl_ub(bins_r_ref[:], r_tok, c_r)
    )
    ub_merge = jnp.where(active, ub_merge, 0)
    ub_new2 = jnp.maximum(ub_new, ub_merge)

    # ── merge-log row (a neutralized pass writes past md2, never read) ──
    lf = _flat_index(log_ref.shape[0])
    log2 = jnp.where(lf == 3 * md, pair, log_ref[:])
    log2 = jnp.where(lf == 3 * md + 1, next_id, log2)
    log2 = jnp.where(lf == 3 * md + 2, cnt_u, log2)
    log_out[:] = log2

    # ── scalar advances + NEXT-iteration winner (count desc, pair asc:
    # unsigned compare via the sign-bit flip; INVALID maps to i32 max) ──
    adv = jnp.where(active, 1, 0)
    m2 = jnp.max(counts2)
    sgn = jnp.int32(-(2**31))
    cx = lax.bitwise_xor(cand2.astype(i32), sgn)
    wx = jnp.where(counts2 == m2, cx, jnp.int32(2**31 - 1))
    pend_pair_i = lax.bitwise_xor(jnp.min(wx), sgn)
    pend_cert = (m2 > theta) & (m2 > ub_new2) & (m2 >= 2)
    sout[0] = md + adv
    sout[1] = jnp.where(has_room, fill + 2, fill)
    sout[2] = (early_in | ~active).astype(i32)
    sout[3] = ub_new2
    sout[4] = m2
    sout[5] = pend_cert.astype(i32)
    sout[6] = (next_id + adv.astype(jnp.uint32)).astype(i32)
    sout[7] = pend_pair_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def _window_post_call(sc, cand, counts, bins_l, bins_r, log_flat, interpret=False):
    log_rows = log_flat.shape[0] // _LANES
    outs = pl.pallas_call(
        _window_post_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((W_ROWS, _LANES), lambda i, s: (0, 0)),
                pl.BlockSpec((W_ROWS, _LANES), lambda i, s: (0, 0)),
                pl.BlockSpec((_TRACK_SIDE, _TRACK_SIDE), lambda i, s: (0, 0)),
                pl.BlockSpec((_TRACK_SIDE, _TRACK_SIDE), lambda i, s: (0, 0)),
                pl.BlockSpec((log_rows, _LANES), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((W_ROWS, _LANES), lambda i, s: (0, 0)),
                pl.BlockSpec((W_ROWS, _LANES), lambda i, s: (0, 0)),
                pl.BlockSpec((log_rows, _LANES), lambda i, s: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((W_ROWS, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((W_ROWS, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((log_rows, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ],
        interpret=interpret,
    )(
        sc,
        cand.reshape(W_ROWS, _LANES),
        counts.reshape(W_ROWS, _LANES),
        bins_l,
        bins_r,
        log_flat.reshape(log_rows, _LANES),
    )
    return outs


def window_post(
    cand, counts, bins_l, bins_r, log_flat,
    *, pair, count, next_id, theta, ub_new, fill, merges_done, active,
    early_stop, use_probes, n_aff, c_l, c_r, l_ok, r_ok, l_tok, r_tok,
    has_room, probes, pcnt, interpret=False,
):
    """Fused post-merge window update (see ``_window_post_kernel``).

    ``log_flat`` must be a u32 array of length ``rows * 128`` (the
    [BATCH_MERGES, 3] merge log reshaped flat and zero-padded to a lane
    multiple by the caller, once, at state init). Returns
    ``(cand2 [W_SLOTS], counts2 [W_SLOTS], log2, scalars i32 [8])`` with
    scalars = (merges_done2, fill2, early2, ub_new2, pend_count,
    pend_cert, next_id2 bitcast, pend_pair bitcast).
    """
    u = lambda x: jnp.asarray(x).astype(_U32)
    sc = jnp.concatenate([
        jnp.stack([
            u(pair), u(count), u(next_id), u(theta), u(ub_new), u(fill),
            u(merges_done), u(active), u(early_stop), u(use_probes),
            u(n_aff), u(c_l), u(c_r), u(l_ok), u(r_ok), u(l_tok), u(r_tok),
            u(has_room),
        ]),
        jnp.asarray(probes).astype(_U32).reshape(N_PROBES),
        jnp.asarray(pcnt).astype(_U32).reshape(N_PROBES),
    ])
    cand2, counts2, log2, sout = _window_post_call(
        sc, jnp.asarray(cand, _U32), jnp.asarray(counts, jnp.int32),
        bins_l, bins_r, jnp.asarray(log_flat, _U32), interpret=interpret,
    )
    return cand2.reshape(W_SLOTS), counts2.reshape(W_SLOTS), log2.reshape(-1), sout


def merge_compact_tracked(symbols, weights, n, pair, new_id, probes=None,
                          window=None, interpret=False):
    """``merge_compact`` plus fused created-pair tracking: also returns
    (bins_l, bins_r) — UNexcluded [TRACK_SIDE, TRACK_SIDE] f32 hashed
    histograms of the post-merge created-pair masses — and ``samp`` i32[4]
    = (max_wl, tok_l, max_wr, tok_r), the heaviest created-pair sample per
    side (token tie-break: smallest, earliest block wins ties on weight).
    One streaming pass; the caller subtracts the sampled pair's exact
    count from its bin to get the excluded ceiling.

    ``probes`` — optional fused probe-pair counting: ``(words, count)``
    where ``words`` is a u32 [N_PROBES] array of packed pairs and ``count``
    an i32 scalar (0..N_PROBES) of live leading slots. Returns a 7th value
    ``pcnt`` i32 [N_PROBES]: the EXACT post-merge pair-stream count of each
    probed pair (equal to a `_masked_pairs` recount), valid for slots
    ``< count``. CONTRACT: probed pairs must have both members nonzero —
    `_masked_pairs` excludes token 0 but this window does not (see the
    kernel comment); callers route zero-member pairs to the recount path.

    ``window`` — (cand u32 [W_SLOTS], counts i32 [W_SLOTS]): derive the
    probe set IN-KERNEL from the tracked candidate window (block 0)
    instead of host-side XLA ops. Mutually exclusive with ``probes``.
    Returns a 9-tuple ``(..., pcnt, probes_out, n_aff)`` where
    ``probes_out`` (i32 [N_PROBES], bitcast pairs) is the probe list the
    kernel counted and ``n_aff`` (i32 [1]) the affected-candidate count;
    when ``n_aff[0] > N_PROBES`` nothing was probed (the caller falls back
    to a dense window recount). Live candidates never have zero members,
    so the probe contract holds by construction.

    Without ``probes``/``window`` the 6-tuple of round 1 is returned."""
    cap = symbols.shape[0]
    # Blocks hold the stream at its natural positions — no front-pad copy
    # (the kernel carries the cross-block prev symbol in SMEM). Only
    # non-BLOCK-multiple capacities (small rungs / odd shard sizes) pay a
    # zero-pad copy; the trainer's power-of-two ladder >= BLOCK is free.
    nbytes = max(((cap + BLOCK - 1) // BLOCK) * BLOCK, BLOCK)
    if nbytes != cap:
        sym_b = jnp.zeros((nbytes,), _U32).at[:cap].set(symbols)
        w_b = jnp.zeros((nbytes,), jnp.int32).at[:cap].set(weights)
    else:
        sym_b = jnp.asarray(symbols, _U32)
        w_b = jnp.asarray(weights, jnp.int32)
    assert probes is None or window is None
    if window is not None:
        cand, counts = window
        cand = jnp.asarray(cand, _U32)
        counts = jnp.asarray(counts, jnp.int32)
        probe_words = jnp.zeros((N_PROBES,), _U32)
        n_probes = jnp.full((), _MODE_WINDOW, _U32)
    else:
        cand = jnp.zeros((W_SLOTS,), _U32)
        counts = jnp.zeros((W_SLOTS,), jnp.int32)
        if probes is None:
            probe_words = jnp.zeros((N_PROBES,), _U32)
            n_probes = jnp.zeros((), _U32)
        else:
            probe_words, n_probes = probes
            probe_words = jnp.asarray(probe_words, _U32)
            n_probes = jnp.asarray(n_probes, jnp.int32).astype(_U32)
    head = jnp.stack(
        [jnp.asarray(pair, _U32), jnp.asarray(new_id, _U32),
         jnp.asarray(n, jnp.int32).astype(_U32), n_probes]
    )
    scalars = jnp.concatenate([head, probe_words])
    grid_dyn = jnp.maximum(
        (jnp.asarray(n, jnp.int32) + BLOCK - 1) // BLOCK, 1
    )
    out_sym, out_w, removed, bins, samp, pcnt, probes_out, naff = _merge_compact_call(
        sym_b, w_b, cand, counts, scalars, grid_dyn, interpret=interpret
    )
    n_new = n - removed[0]
    # the DMA windows cover only up to the compacted stream end + one tile;
    # re-zero the tail explicitly (the buffer may be recycled memory)
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    sym_out = jnp.where(iota < n_new, out_sym[:cap], _U32(0))
    w_out = jnp.where(iota < n_new, out_w[:cap], 0)
    base = (sym_out, w_out, n_new, bins[:_TRACK_SIDE], bins[_TRACK_SIDE:], samp)
    if window is not None:
        return base + (pcnt, probes_out, naff)
    return base if probes is None else base + (pcnt,)
