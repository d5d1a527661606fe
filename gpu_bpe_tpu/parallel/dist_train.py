"""Multi-chip data-parallel BPE training (shard_map over a 1-D mesh).

Scaling design (SURVEY.md §2e / §5): the corpus — as a deduplicated
unique-word stream — is sharded across the ``data`` mesh axis with whole
words per shard (words never straddle shard boundaries, so merges need no
halo exchange). The merge decision must be a GLOBAL argmax over summed pair
counts; the naive approach (psum a 2^21 hash table every merge, the
reference's single-GPU structure) moves megabytes per merge over ICI.

Instead the distributed step runs the same **lazy-candidate window** as the
single-chip step (ops/train_step.py), with every certificate quantity made
global:

* candidate counts — each shard recounts the K tracked pairs exactly from
  its live stream ([N_shard, K] masked compare) and the counts are psum'd:
  K integers over ICI per merge.
* theta (ceiling for untracked old pairs) — at a full recount each shard
  sorts locally and extracts its top-(K+1) runs; the union is all-gathered,
  counted exactly everywhere, psum'd, and the new candidate set is the
  global top-K. A pair absent from shard d's local top-(K+1) has local
  count <= that shard's (K+1)-th best, so an untracked pair's global count
  is bounded by max(sum_d local_(K+1)th, (K+1)-th union count).
* ub_new (ceiling for pairs containing post-recount tokens) — the per-merge
  created-pair histograms are computed shard-locally and the f32 bins
  psum'd before taking the inflated max: 8 KB over ICI per merge. The
  heaviest created pair per side is sampled globally (pmax weight, pmin
  token among attaining shards), tracked exactly in append-only scratch
  slots, and excluded from the histogram — the same window-extension
  scheme as the single-chip step.
* dual-merge — when the global second-best tracked candidate strictly
  beats every ceiling (including the first merge's psum'd created-pair
  ceiling and the exact psum'd counts of its sampled pairs), two
  member-disjoint merges apply per iteration from one candidate-count
  round, halving ICI round-trips per merge on certified stretches.

Merges and compaction stay purely shard-local (holes + deferred compaction,
shared code with the single-chip step). The merge log is replicated.
Determinism: the winner is the true global (count desc, pair asc) argmax,
so the merge list is bitwise-independent of shard count and layout — the
same guarantee the reference gets from its deterministic reductions
(train.wgsl:83-85), proven by the certificate instead of recount order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import BATCH_MERGES, TOKEN_MASK, WORD_START_BIT
from ..ops.train_step import (
    A_AFFECTED,
    A_FAST,
    COMPACT_EVERY,
    K_CANDIDATES,
    S_CREATED,
    _I32_MAX,
    _NO_EXCL,
    _masked_pairs,
    _next_valid,
    _run_totals,
    _ub_bins,
    _ub_from_bins,
    _use_pallas,
    apply_merge_with_holes,
)

_U32 = jnp.uint32
_TOKEN_MASK = np.uint32(TOKEN_MASK)
_WS_BIT = np.uint32(WORD_START_BIT)
_INVALID = np.uint32(0xFFFFFFFF)


class DistState(NamedTuple):
    symbols: jax.Array  # u32 [D, CAP/D] — sharded along axis 0
    weights: jax.Array  # i32 [D, CAP/D]
    n: jax.Array  # i32 [D] — valid count per shard
    extent: jax.Array  # i32 [D] — filled prefix (n + live holes) per shard
    dirty: jax.Array  # i32 [D] — merges since last local compaction
    next_id: jax.Array  # u32 scalar (replicated)
    early_stop: jax.Array  # bool scalar
    merges_done: jax.Array  # i32 scalar
    merge_log: jax.Array  # u32 [BATCH_MERGES, 3]
    cand: jax.Array  # u32 [K_CANDIDATES + S_CREATED] (replicated)
    # EXACT global count per candidate slot (replicated; -1 = dead slot),
    # maintained incrementally: each merge psums an affected-subset
    # recount (see ops.train_step._post_counts for the affectedness proof)
    # instead of the round-1 per-iteration [K, N/D] pass + [K] psum.
    cand_counts: jax.Array  # i32 [K_CANDIDATES + S_CREATED] (replicated)
    theta: jax.Array  # i32 scalar — ceiling for untracked old pairs
    ub_new: jax.Array  # i32 scalar — ceiling for pairs with post-recount tokens
    recounts: jax.Array  # i32 scalar — full recounts (diagnostics)
    fill: jax.Array  # i32 scalar — next free created-pair scratch slot
    duals: jax.Array  # i32 scalar — dual-merge fires (diagnostics)


def make_dist_train_batch(mesh: Mesh, axis: str = "data"):
    """Build the sharded batched-merge step for a mesh."""

    def shard_step(
        symbols, weights, n, extent, dirty, next_id, early_stop,
        merges_done, merge_log, cand, cand_counts, theta, ub_new, recounts,
        fill, duals, batch_merges,
    ):
        # inside shard_map: symbols [CAP/D]; n/extent/dirty [1] (this shard)
        cap = symbols.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        # On TPU the fused Pallas kernel runs per shard inside shard_map
        # (validated on a 1-device mesh: bitwise-identical to the
        # single-chip path; note donation of sharded state must stay off —
        # see parallel/trainer.py). The jnp deferred-compaction path
        # serves CPU execution and the virtual-mesh tests, or
        # GPU_BPE_TPU_NO_PALLAS=1.
        use_pallas = _use_pallas()
        lookahead = 0 if use_pallas else COMPACT_EVERY
        n_slots = K_CANDIDATES + S_CREATED

        def merge_and_track(sym, w, n_l, ext_l, dirty_l, nid, md, log, cnd,
                            counts, ub, fl, pair_sel, count, nxt):
            """Apply one certified merge shard-locally and maintain the
            replicated window state: global heaviest created-pair sample
            (pmax weight, pmin token among attaining shards), the exact
            maintained candidate counts (affected-subset recount, one
            [A+2] psum), histogram exclusion, psum'd ceiling bins, scratch
            append, and the merge-log entry. Mirrors the single-chip
            ``_merge_and_track`` + ``_post_counts``."""
            z16 = nid & _TOKEN_MASK
            if use_pallas:
                from ..ops.pallas_kernels import merge_compact_tracked

                sym2, w2, n2, bins_l, bins_r, samp = merge_compact_tracked(
                    sym, w, n_l, pair_sel, nid
                )
                ext2, dirty2 = n2, jnp.asarray(0, jnp.int32)
                next2 = None  # compacted stream: merge 2 never needs a hole chain
                lmg = lax.pmax(samp[0], axis)
                rmg = lax.pmax(samp[2], axis)
                lt_loc = jnp.where(samp[0] == lmg, samp[1], 0x7FFFFFFF)
                rt_loc = jnp.where(samp[2] == rmg, samp[3], 0x7FFFFFFF)
            else:
                (sym2, w2, n2, ext2, dirty2,
                 prev2, next2, w_left, w_right) = apply_merge_with_holes(
                    sym, w, n_l, ext_l, dirty_l, pair_sel, nid, nxt, lookahead
                )
                bins_l = bins_r = None
                lmg = lax.pmax(jnp.max(w_left), axis)
                rmg = lax.pmax(jnp.max(w_right), axis)
                lt_loc = jnp.min(jnp.where(
                    (w_left == lmg) & (lmg > 0),
                    (prev2 & _TOKEN_MASK).astype(jnp.int32), 0x7FFFFFFF))
                rt_loc = jnp.min(jnp.where(
                    (w_right == rmg) & (rmg > 0),
                    (next2 & _TOKEN_MASK).astype(jnp.int32), 0x7FFFFFFF))
            has_room = fl <= n_slots - 2
            lt_glob = lax.pmin(lt_loc, axis)
            rt_glob = lax.pmin(rt_loc, axis)
            # token-0 guard: a sampled pair with a zero member is never
            # counted by the pair stream — tracking it would seed a wrong
            # maintained count (see the single-chip _merge_and_track)
            l_ok = has_room & (lmg > 0) & (lt_glob != 0)
            r_ok = has_room & (rmg > 0) & (rt_glob != 0)
            l_tok = jnp.where(l_ok, lt_glob.astype(_U32), _U32(_NO_EXCL))
            r_tok = jnp.where(r_ok, rt_glob.astype(_U32), _U32(_NO_EXCL))

            # ── maintained counts: affected-subset recount on the local
            # post-merge stream, ONE [A+2] (or dense) psum; the sampled
            # created pairs ride the same pass (c_l/c_r) ──
            z_pair_l = jnp.where(l_ok, (l_tok << _U32(16)) | z16, _INVALID)
            z_pair_r = jnp.where(r_ok, (z16 << _U32(16)) | r_tok, _INVALID)
            l_slot = jnp.where(l_ok, z_pair_l, _U32(1))
            r_slot = jnp.where(r_ok, z_pair_r, _U32(1))
            pair2, w2m, _ = _masked_pairs(sym2, w2, ext2, iota, lookahead)
            live = counts >= 0
            ma, mb = pair_sel >> _U32(16), pair_sel & _TOKEN_MASK
            ca, cb = cnd >> _U32(16), cnd & _TOKEN_MASK
            affected = live & ((cb == ma) | (ca == mb)) & (cnd != pair_sel)
            n_aff = jnp.sum(affected.astype(jnp.int32))

            keys = jnp.where(affected, _U32(0), _U32(1))
            _, aff_sorted = lax.sort((keys, cnd), num_keys=1)

            def sparse(width: int):
                def tier(_):
                    ia = lax.broadcasted_iota(jnp.int32, (width,), 0)
                    aff = jnp.where(ia < n_aff, aff_sorted[:width], _U32(1))
                    lst = jnp.concatenate([aff, jnp.stack([l_slot, r_slot])])
                    eq = lst[:, None] == pair2[None, :]
                    cnt = lax.psum(
                        jnp.sum(jnp.where(eq, w2m[None, :], 0), axis=1), axis
                    )
                    match = cnd[:, None] == aff[None, :]
                    rec = jnp.max(jnp.where(match, cnt[None, :width], 0), axis=1)
                    return (jnp.where(affected, rec, counts),
                            cnt[width], cnt[width + 1])

                return tier

            def dense_all(_):
                lst = jnp.concatenate([cnd, jnp.stack([l_slot, r_slot])])
                eq = lst[:, None] == pair2[None, :]
                cnt = lax.psum(jnp.sum(jnp.where(eq, w2m[None, :], 0), axis=1), axis)
                return jnp.where(live, cnt[:n_slots], counts), cnt[-2], cnt[-1]

            counts2, c_l, c_r = lax.cond(
                n_aff <= A_FAST,
                sparse(A_FAST),
                lambda _: lax.cond(
                    n_aff <= A_AFFECTED, sparse(A_AFFECTED), dense_all, None
                ),
                None,
            )
            counts2 = jnp.where(live & (cnd == pair_sel), 0, counts2)
            if use_pallas:
                # kernel histograms are unexcluded; subtract each sampled
                # pair's exact global count from its bin after the psum
                def _excl(bins, tok, c):
                    nb = bins.shape[0] * bins.shape[1]
                    h = ((tok * _U32(2654435761)) >> _U32(16)) & _U32(nb - 1)
                    half = (nb.bit_length() - 1) // 2
                    return bins.at[(h >> _U32(half)).astype(jnp.int32),
                                   (h & _U32((1 << half) - 1)).astype(jnp.int32)].add(
                        -c.astype(jnp.float32))

                ub_merge = jnp.maximum(
                    _ub_from_bins(_excl(lax.psum(bins_l, axis), l_tok, c_l)),
                    _ub_from_bins(_excl(lax.psum(bins_r, axis), r_tok, c_r)),
                )
            else:
                w_left_x = jnp.where((prev2 & _TOKEN_MASK) == l_tok, 0, w_left)
                w_right_x = jnp.where((next2 & _TOKEN_MASK) == r_tok, 0, w_right)
                bins_l = _ub_bins(prev2 & _TOKEN_MASK, w_left_x)
                bins_r = _ub_bins(next2 & _TOKEN_MASK, w_right_x)
                ub_merge = jnp.maximum(
                    _ub_from_bins(lax.psum(bins_l, axis)),
                    _ub_from_bins(lax.psum(bins_r, axis)),
                )
            slot0 = jnp.where(has_room, fl, n_slots - 2)
            cnd2 = lax.dynamic_update_slice(
                cnd, jnp.stack([z_pair_l, z_pair_r]), (slot0,)
            )
            cnd2 = jnp.where(has_room, cnd2, cnd)
            counts3 = lax.dynamic_update_slice(
                counts2,
                jnp.stack([jnp.where(l_ok, c_l, -1), jnp.where(r_ok, c_r, -1)]),
                (slot0,),
            )
            counts3 = jnp.where(has_room, counts3, counts2)
            fl2 = jnp.where(has_room, fl + 2, fl)
            log2 = lax.dynamic_update_slice(
                log, jnp.stack([pair_sel, nid, count.astype(_U32)])[None, :], (md, 0)
            )
            return ((sym2, w2, n2, ext2, dirty2, nid + _U32(1), md + 1, log2,
                     cnd2, counts3, jnp.maximum(ub, ub_merge), fl2),
                    ub_merge, c_l, c_r, next2)

        def one_merge(carry):
            (sym, w, n_l, ext_l, dirty_l, nid, stop, md, log, cnd, ccnt, th,
             ub, rc, fl, du) = carry

            # ── winner from the MAINTAINED exact global counts (replicated;
            # no stream pass and no collective — counts were psum-updated
            # when the previous merge applied) ──
            cand_counts = ccnt
            m = jnp.max(cand_counts)
            cand_winner = jnp.min(jnp.where(cand_counts == m, cnd, _INVALID))
            certified = (m > th) & (m > ub) & (m >= 2)

            # ── second winner for the dual-merge certificate (identical
            # proof to the single-chip _one_merge: all quantities global) ──
            counts2 = jnp.where(cnd == cand_winner, -1, cand_counts)
            m2 = jnp.max(counts2)
            q = jnp.min(jnp.where(counts2 == m2, cnd, _INVALID))
            a1, b1 = cand_winner >> _U32(16), cand_winner & _TOKEN_MASK
            qa, qb = q >> _U32(16), q & _TOKEN_MASK
            disjoint = (qa != a1) & (qa != b1) & (qb != a1) & (qb != b1)
            dual_pre = (
                certified & disjoint & (m2 >= 2) & (m2 > th) & (m2 > ub)
                & (nid + _U32(1) <= _TOKEN_MASK) & (md + 2 <= batch_merges)
            )
            counts3 = jnp.where(cnd == q, -1, counts2)
            m3 = jnp.max(counts3)
            r3 = jnp.min(jnp.where(counts3 == m3, cnd, _INVALID))
            ra, rb = r3 >> _U32(16), r3 & _TOKEN_MASK
            disjoint3 = (
                (ra != a1) & (ra != b1) & (rb != a1) & (rb != b1)
                & (ra != qa) & (ra != qb) & (rb != qa) & (rb != qb)
            )
            triple_pre = (
                dual_pre & disjoint3 & (m3 >= 2) & (m3 > th) & (m3 > ub)
                & (nid + _U32(2) <= _TOKEN_MASK) & (md + 3 <= batch_merges)
            )

            def from_candidates(_):
                return cand_winner, m, cnd, ccnt, th, ub, fl

            def full_recount(_):
                pair_vec, w_vec, _nxt = _masked_pairs(sym, w, ext_l, iota, lookahead)
                sp, sw = lax.sort((pair_vec, w_vec), num_keys=1)
                rt = _run_totals(sp, sw)
                # approx top-(K+1) is sound here: the outside-local-set
                # ceiling below is an EXACT masked max, so a missed heavy
                # pair only loosens bound1 (more dense fallbacks, never a
                # wrong winner). ~10x cheaper than exact lax.top_k.
                _av, idx = lax.approx_max_k(rt.astype(jnp.float32), K_CANDIDATES + 1)
                vals = rt[idx]
                loc_pairs = jnp.where(vals > 0, sp[idx], _INVALID)
                union = lax.all_gather(loc_pairs, axis, tiled=True)  # [D*(K+1)]
                # dedupe (same pair can top several shards): sort by pair,
                # invalidate repeats — tiny arrays, negligible cost
                su = jnp.sort(union)
                dup = jnp.concatenate([jnp.zeros((1,), bool), su[1:] == su[:-1]])
                su = jnp.where(dup, _INVALID, su)
                # exact global counts of the union
                equ = su[:, None] == pair_vec[None, :]  # [K', N]
                uc_local = jnp.sum(jnp.where(equ, w_vec[None, :], 0), axis=1)
                uc = lax.psum(uc_local, axis)
                uc = jnp.where(su == _INVALID, 0, uc)
                # global top-K with the reference tie-break (count desc,
                # pair asc): sort by (-count, pair)
                neg = -uc
                _, sorted_pairs, sorted_counts = lax.sort((neg, su, uc), num_keys=2)
                # Any pair absent from EVERY shard's local selection has
                # global count <= sum_d (exact max local count OUTSIDE that
                # shard's selection) — computed as an exact masked max, so
                # it stays sound under approximate selection. The sparse
                # result is exact only if the union winner strictly beats
                # that bound (ties could hide a smaller pair id outside).
                in_loc = jnp.any(loc_pairs[:, None] == sp[None, :], axis=0)
                outside_max = jnp.max(jnp.where(in_loc, 0, rt))
                bound1 = lax.psum(outside_max, axis)
                provable = sorted_counts[0] > bound1

                def sparse(_):
                    new_theta = jnp.maximum(bound1, sorted_counts[K_CANDIDATES])
                    # exact global seed counts ride along; INVALID padding
                    # slots (count 0 by construction) become dead (-1)
                    sc = jnp.where(
                        sorted_pairs[:K_CANDIDATES] == _INVALID,
                        -1, sorted_counts[:K_CANDIDATES],
                    )
                    return (sorted_pairs[:K_CANDIDATES], sc, sorted_counts[0], new_theta)

                def dense(_):
                    # Exact global recount: all-gather the already-masked
                    # pair streams (holes/extents/word-starts applied
                    # shard-side; shards start at word boundaries so no
                    # cross-shard pairs exist) and redo runs globally.
                    # Yields a TIGHT theta, reviving the candidate window
                    # in flat-count regimes where bound1 is useless.
                    gp = lax.all_gather(pair_vec, axis, tiled=True)
                    gw = lax.all_gather(w_vec, axis, tiled=True)
                    sp2, sw2 = lax.sort((gp, gw), num_keys=1)
                    rt2 = _run_totals(sp2, sw2)
                    # exact winner (count desc, pair asc)
                    bc2 = jnp.max(rt2)
                    bp2 = jnp.min(jnp.where((rt2 == bc2) & (sp2 != 0), sp2, _INVALID))
                    bp2 = jnp.where(bc2 > 0, bp2, jnp.uint32(0))
                    _av2, ai2 = lax.approx_max_k(rt2.astype(jnp.float32), K_CANDIDATES)
                    picked2 = rt2[ai2]
                    # non-run-end picks (streams with < K distinct pairs)
                    # must not seed a wrong count 0 — invalidate the slot,
                    # theta covers the pair (see single-chip full_recount)
                    ok2 = picked2 > 0
                    cand2 = jnp.where(ok2, sp2[ai2], _INVALID).at[0].set(bp2)
                    counts_seed = jnp.where(ok2, picked2, -1).at[0].set(bc2)
                    tr2 = jnp.any(cand2[:, None] == sp2[None, :], axis=0)
                    theta2 = jnp.max(jnp.where(tr2, 0, rt2))
                    return (cand2, counts_seed, bc2, theta2)

                new_cand, new_counts, count, new_theta = lax.cond(
                    provable, sparse, dense, None
                )
                new_cand = jnp.concatenate(
                    [new_cand, jnp.full((S_CREATED,), _INVALID, _U32)]
                )
                new_counts = jnp.concatenate(
                    [new_counts, jnp.full((S_CREATED,), -1, jnp.int32)]
                )
                return (new_cand[0], count, new_cand, new_counts, new_theta,
                        jnp.asarray(0, jnp.int32), jnp.asarray(K_CANDIDATES, jnp.int32))

            best_pair, count, cnd2, ccnt2, th2, ub2, fl2 = lax.cond(
                certified, from_candidates, full_recount, None
            )
            rc2 = rc + jnp.where(certified, 0, 1)
            do_stop = (count < 2) | (nid > _TOKEN_MASK)

            def merge_branch(args):
                (sym, w, n_l, ext_l, dirty_l, nid, md, log, ub2, cnd2, ccnt2,
                 fl2, du) = args
                # pre-merge next-valid chain, needed only by the jnp path
                nxt = None if use_pallas else _next_valid(sym, lookahead)
                st1, ub_merge1, c_l, c_r, next2 = merge_and_track(
                    sym, w, n_l, ext_l, dirty_l, nid, md, log, cnd2, ccnt2,
                    ub2, fl2, best_pair, count, nxt,
                )
                dual = dual_pre & (m2 > ub_merge1) & (m2 > c_l) & (m2 > c_r)

                def second(args):
                    st, du1 = args
                    (sym1, w1, n1, ext1, dirty1, nid1, md1, log1, cnd1, cc1,
                     ub1, fl1) = st
                    st2, ub_merge2, c_l2, c_r2, next3 = merge_and_track(
                        sym1, w1, n1, ext1, dirty1, nid1, md1, log1, cnd1, cc1,
                        ub1, fl1, q, m2, next2,
                    )
                    triple = (
                        triple_pre
                        & (m3 > ub_merge1) & (m3 > c_l) & (m3 > c_r)
                        & (m3 > ub_merge2) & (m3 > c_l2) & (m3 > c_r2)
                    )

                    def third(args2):
                        st2i, _ = args2
                        (s2, w2i, n2i, e2, d2, nid2i, md2i, lg2, cn2, cc2,
                         u2, f2) = st2i
                        st3, _u, _cl, _cr, _nx = merge_and_track(
                            s2, w2i, n2i, e2, d2, nid2i, md2i, lg2, cn2, cc2,
                            u2, f2, r3, m3, next3,
                        )
                        return st3, du1 + 2

                    return lax.cond(triple, third, lambda a: (a[0], du1 + 1), (st2, du1))

                st, du2 = lax.cond(dual, second, lambda a: a, (st1, du))
                (sym2, w2, n2, ext2, dirty2, nid2, md2, log2, cnd3, ccnt3,
                 ub3, fl3) = st
                return (sym2, w2, n2, ext2, dirty2, nid2, md2, log2, ub3,
                        cnd3, ccnt3, fl3, du2)

            def stop_branch(args):
                return args

            (sym, w, n_l, ext_l, dirty_l, nid, md, log, ub2, cnd2, ccnt2,
             fl2, du) = lax.cond(
                do_stop, stop_branch, merge_branch,
                (sym, w, n_l, ext_l, dirty_l, nid, md, log, ub2, cnd2, ccnt2,
                 fl2, du),
            )
            return (sym, w, n_l, ext_l, dirty_l, nid, stop | do_stop, md, log,
                    cnd2, ccnt2, th2, ub2, rc2, fl2, du)

        def cond(carry):
            stop, md = carry[6], carry[7]
            return (md < batch_merges) & ~stop

        out = lax.while_loop(
            cond,
            one_merge,
            (symbols, weights, n[0], extent[0], dirty[0], next_id, early_stop,
             merges_done, merge_log, cand, cand_counts, theta, ub_new,
             recounts, fill, duals),
        )
        (sym, w, n_l, ext_l, dirty_l, nid, stop, md, log, cnd, ccnt, th, ub,
         rc, fl, du) = out
        return (sym, w, n_l[None], ext_l[None], dirty_l[None], nid, stop, md,
                log, cnd, ccnt, th, ub, rc, fl, du)

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def batch(state: DistState, batch_merges) -> DistState:
        state = state._replace(merges_done=jnp.asarray(0, jnp.int32))
        d = state.symbols.shape[0]
        out = sharded(
            state.symbols.reshape(-1),
            state.weights.reshape(-1),
            state.n,
            state.extent,
            state.dirty,
            state.next_id,
            state.early_stop,
            state.merges_done,
            state.merge_log,
            state.cand,
            state.cand_counts,
            state.theta,
            state.ub_new,
            state.recounts,
            state.fill,
            state.duals,
            batch_merges,
        )
        (sym, w, n, ext, dirty, nid, stop, md, log, cnd, ccnt, th, ub, rc,
         fl, du) = out
        return DistState(
            symbols=sym.reshape(d, -1),
            weights=w.reshape(d, -1),
            n=n,
            extent=ext,
            dirty=dirty,
            next_id=nid,
            early_stop=stop,
            merges_done=md,
            merge_log=log,
            cand=cnd,
            cand_counts=ccnt,
            theta=th,
            ub_new=ub,
            recounts=rc,
            fill=fl,
            duals=du,
        )

    return batch


def shard_stream(symbols: np.ndarray, weights: np.ndarray, n_devices: int):
    """Host-side: split a unique-word stream into per-device shards.

    Whole words per shard (greedy round-robin by word), padded to a common
    capacity. Returns (symbols [D, CAP], weights [D, CAP], n [D]).
    """
    symbols = np.asarray(symbols, np.uint32)
    weights = np.asarray(weights, np.int32)
    starts = np.flatnonzero(symbols & np.uint32(WORD_START_BIT))
    if len(starts) == 0 and len(symbols):
        starts = np.array([0])
    ends = np.append(starts[1:], len(symbols))

    shard_words: list[list[tuple[int, int]]] = [[] for _ in range(n_devices)]
    shard_sizes = np.zeros(n_devices, dtype=np.int64)
    for s, e in zip(starts.tolist(), ends.tolist()):
        d = int(np.argmin(shard_sizes))
        shard_words[d].append((s, e))
        shard_sizes[d] += e - s

    cap = int(max(shard_sizes.max(), 1))
    cap = ((cap + 1023) // 1024) * 1024 + 1024
    out_sym = np.zeros((n_devices, cap), np.uint32)
    out_w = np.zeros((n_devices, cap), np.int32)
    n_arr = np.zeros(n_devices, np.int32)
    for d in range(n_devices):
        pos = 0
        for s, e in shard_words[d]:
            ln = e - s
            out_sym[d, pos : pos + ln] = symbols[s:e]
            out_w[d, pos : pos + ln] = weights[s:e]
            pos += ln
        n_arr[d] = pos
    return out_sym, out_w, n_arr


def init_dist_state(mesh: Mesh, symbols, weights, n, next_id, axis: str = "data") -> DistState:
    """Place the sharded stream + replicated window state on the mesh.

    Multi-process safe: every process computes the same deterministic host
    split (shard_stream) but uploads only the rows its local devices own;
    replicated fields are assembled per-process (see parallel/multihost.py
    — the equivalent of the reference's zero-copy corpus transfer across
    its worker boundary, training-manager.js:129-138).
    """
    from .multihost import make_replicated, make_row_sharded

    n_arr = np.asarray(n, np.int32)
    rep = lambda x: make_replicated(x, mesh)
    return DistState(
        symbols=make_row_sharded(np.asarray(symbols, np.uint32), mesh, axis),
        weights=make_row_sharded(np.asarray(weights, np.int32), mesh, axis),
        n=make_row_sharded(n_arr, mesh, axis),
        extent=make_row_sharded(n_arr, mesh, axis),
        dirty=make_row_sharded(np.zeros_like(n_arr), mesh, axis),
        next_id=rep(np.asarray(next_id, np.uint32)),
        early_stop=rep(np.asarray(False)),
        merges_done=rep(np.asarray(0, np.int32)),
        merge_log=rep(np.zeros((BATCH_MERGES, 3), np.uint32)),
        cand=rep(np.full((K_CANDIDATES + S_CREATED,), 0xFFFFFFFF, np.uint32)),
        cand_counts=rep(np.full((K_CANDIDATES + S_CREATED,), -1, np.int32)),
        theta=rep(np.asarray(_I32_MAX, np.int32)),  # force a recount first
        ub_new=rep(np.asarray(0, np.int32)),
        recounts=rep(np.asarray(0, np.int32)),
        fill=rep(np.asarray(K_CANDIDATES, np.int32)),
        duals=rep(np.asarray(0, np.int32)),
    )
