"""Device-resident BPE training step (single chip).

TPU-native re-design of the reference's 8-dispatch GPU iteration
(train.wgsl / training-pipeline.js): one jitted function executes a batch of
up to 128 merges entirely on device inside ``lax.while_loop`` with
device-side early stopping and a device merge log — the host reads back only
the log + scalars once per batch, mirroring the reference's
128-merges-per-roundtrip architecture (training-pipeline.js:13).

Where the reference uses an open-addressing atomic hash table + two-pass max
reduction + Blelloch scan/scatter compaction (all GPU idioms), this
implementation uses TPU idioms:

* pair counting  — lazy-candidate windows: a full count is one ``lax.sort``
  of (pair_id, weight) + segmented run totals via cumsum/cummax scans (no
  scatter: TPU has no fast scatter). Between full counts, the winner is
  certified from a top-K candidate set whose exact counts are MAINTAINED
  incrementally: a merge (a,b) -> Z can only change counts of pairs ending
  in a / starting with b / equal to (a,b) / containing Z (proof in
  ``_post_counts``), so each merge recounts just that affected subset with
  a tiered [A_FAST | A_AFFECTED, N] masked compare (~6-15x cheaper than the round-1
  per-iteration [K, N] pass, ~300x cheaper than the sort); the certificate
  (see ``_one_merge``) proves the candidate winner equals the global
  argmax, else the step falls back to a full recount. The merge list is
  bitwise-identical to recounting every merge.
* winner         — deterministic ordering identical to ``is_better``
  (train.wgsl:83-85): count desc, pair id asc.
* merge          — fully vectorized elementwise rule computed from the
  original array (same read-all-before-write semantics as
  train.wgsl:475-496, including the overlap-collapse quirk).
* compaction     — DEFERRED: removed symbols become holes (sentinel), and
  adjacency is recovered with a bounded next/prev-valid select chain (a
  hole run grows by ≤1 per merge, so ``m`` merges after a compaction the
  lookahead never exceeds ``m``). A real compaction (stable sort by
  flagged position) runs once every COMPACT_EVERY merges, amortizing the
  expensive sort that the reference pays per merge via its scan+scatter.

Weights make the step work on deduplicated unique-word streams (see
ops/ingest.py) — counts are exact corpus counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import BATCH_MERGES, TOKEN_MASK, WORD_START_BIT

_U32 = jnp.uint32
_TOKEN_MASK = np.uint32(TOKEN_MASK)
_WS_BIT = np.uint32(WORD_START_BIT)
_INVALID = np.uint32(0xFFFFFFFF)
_HOLE = np.uint32(0xFFFFFFFF)  # removed-symbol sentinel (never a valid symbol)

# Merges between real compactions. Hole runs are bounded by the number of
# merges since the last compaction, so lookahead depth == COMPACT_EVERY.
COMPACT_EVERY = 8


import functools as _functools
import os as _os


@_functools.cache
def _multi_merge_enabled() -> bool:
    """Multi-merge (dual/triple) iterations in the SINGLE-CHIP step.

    Off by default (see the comment at the dual_pre gate in _one_merge);
    GPU_BPE_TPU_MULTI=1 re-enables. The distributed step is unaffected —
    it has its own iteration and always multi-merges."""
    return bool(_os.environ.get("GPU_BPE_TPU_MULTI"))


@_functools.cache
def _use_pallas() -> bool:
    """Use the fused Pallas merge+compact kernel (TPU only).

    On TPU the stream is recompacted after EVERY merge by
    ops.pallas_kernels.merge_compact, so holes never materialize and the
    deferred-compaction machinery below is bypassed. The jnp path remains
    for CPU execution and as an escape hatch (GPU_BPE_TPU_NO_PALLAS=1).

    GPU_BPE_TPU_PALLAS_INTERPRET=1 forces the Pallas paths ON with every
    kernel in interpret mode — the CI hook that runs the TPU code path
    (including the fused-window iteration) on the CPU backend, bit-exact.
    Single-chip only: the distributed step does not thread the flag.
    """
    if _pallas_interpret():
        return True
    if _os.environ.get("GPU_BPE_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@_functools.cache
def _pallas_interpret() -> bool:
    return bool(_os.environ.get("GPU_BPE_TPU_PALLAS_INTERPRET"))

# Lazy-candidate window: number of tracked top pairs between full recounts.
# Round 2: with counts MAINTAINED incrementally (no per-iteration [K, N]
# pass), K costs almost nothing per iteration, so a larger window buys
# strictly fewer sort recounts: K 64 -> 128 (lower theta), S 32 -> 64
# (windows were scratch-bound at ~16 merges; sampling 2 pairs/merge now
# sustains ~32). Merge lists are invariant under K/S by construction.
K_CANDIDATES = 128
# Append-only scratch slots for created pairs sampled during the window
# (2 per merge: the heaviest-position left and right neighbor of the new
# token). A sampled pair is tracked exactly AND excluded from the ub
# histogram, which keeps the created-pair ceiling from ending the window
# the moment a dominant new pair (e.g. "th"+"e") appears.
# Round 4: 64 -> 128 so the whole window (K + S = 256) fills exactly
# [2, 128] VPU tiles for the fused window kernels — and scratch-bound
# window ends halve as a side effect. Merge lists are invariant under
# K/S by construction.
S_CREATED = 128
_NO_EXCL = 0x10000  # 17-bit sentinel: matches no 16-bit token
# Hash bins for the new-pair upper-bound histogram: 16x16 = 256 bins built
# as a one-hot outer-product matmul. MUST equal pallas_kernels._TRACK_SIDE —
# the host-side exclusion hash (bin subtraction in _apply_tracked) has to
# address the same bins the kernel accumulated (asserted at the import site).
_UB_SIDE = 16
_I32_MAX = 2**31 - 1  # plain int: a shared jax array would die under donation
# Affected-recount widths: after merging (a,b) -> Z, only candidates whose
# pair ends in ``a``, starts with ``b``, or IS (a,b) can change count (see
# _post_counts proof). Two sparse tiers (measured on real text over a
# 192-slot window: 81% of merges affect <= 4 candidates, 99% <= 16), then
# a dense recount of the whole window as the fallback.
A_FAST = 4
A_AFFECTED = 16


class TrainState(NamedTuple):
    """Device-side iteration state (the reference's IterState, train.wgsl:45-58)."""

    symbols: jax.Array  # u32 [CAP] — tok | word-start bit; HOLE at removed; 0 past extent
    weights: jax.Array  # i32 [CAP] — word frequency per position
    n: jax.Array  # i32 scalar — valid (non-hole) symbol count
    extent: jax.Array  # i32 scalar — filled prefix length (n + live holes)
    dirty: jax.Array  # i32 scalar — merges since last compaction
    next_id: jax.Array  # u32 scalar — next token id to assign
    early_stop: jax.Array  # bool scalar
    merges_done: jax.Array  # i32 scalar — merges done this batch
    merge_log: jax.Array  # u32 [BATCH_MERGES, 3] — (pair, new_id, count)
    # Lazy-candidate window (see _one_merge): tracked top pairs, the count
    # ceiling for every untracked old pair, and the count ceiling for every
    # pair containing a token created since the last full recount.
    cand: jax.Array  # u32 [K_CANDIDATES + S_CREATED]
    # EXACT live count per candidate slot, maintained incrementally across
    # merges (-1 marks a dead slot). The per-iteration [K, N] recount of
    # round 1 is gone: a merge (a,b) -> Z can only change counts of pairs
    # ending in a / starting with b / equal to (a,b) / containing Z, so
    # each merge recounts just that affected subset (see _update_counts).
    cand_counts: jax.Array  # i32 [K_CANDIDATES + S_CREATED]
    theta: jax.Array  # i32 scalar
    ub_new: jax.Array  # i32 scalar
    recounts: jax.Array  # i32 scalar — full recounts performed (diagnostics)
    fill: jax.Array  # i32 scalar — next free created-pair scratch slot
    duals: jax.Array  # i32 scalar — dual-merge certificate fires (diagnostics)
    # Fused-path pipeline (see _one_merge_fused): the NEXT iteration's
    # winner + certificate, computed by the window-post kernel of the
    # previous iteration. Inert on the jnp/multi paths.
    pend_pair: jax.Array  # u32 scalar
    pend_count: jax.Array  # i32 scalar
    pend_cert: jax.Array  # bool scalar — False forces a full recount


def init_state(symbols: jax.Array, weights: jax.Array, n, next_id) -> TrainState:
    return TrainState(
        symbols=jnp.asarray(symbols, _U32),
        weights=jnp.asarray(weights, jnp.int32),
        n=jnp.asarray(n, jnp.int32),
        extent=jnp.asarray(n, jnp.int32),
        dirty=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(next_id, _U32),
        early_stop=jnp.asarray(False),
        merges_done=jnp.asarray(0, jnp.int32),
        merge_log=jnp.zeros((BATCH_MERGES, 3), _U32),
        cand=jnp.full((K_CANDIDATES + S_CREATED,), _INVALID, _U32),
        cand_counts=jnp.full((K_CANDIDATES + S_CREATED,), -1, jnp.int32),
        theta=jnp.asarray(_I32_MAX, jnp.int32),  # forces a recount first
        ub_new=jnp.asarray(0, jnp.int32),
        recounts=jnp.asarray(0, jnp.int32),
        fill=jnp.asarray(K_CANDIDATES, jnp.int32),
        duals=jnp.asarray(0, jnp.int32),
        pend_pair=jnp.asarray(0, _U32),
        pend_count=jnp.asarray(-1, jnp.int32),
        pend_cert=jnp.asarray(False),
    )


def _next_valid(symbols: jax.Array, lookahead: int):
    """Next valid (non-HOLE) symbol for each position, up to ``lookahead``
    holes skipped.

    Exact only while hole runs are ≤ lookahead — guaranteed by the compaction
    schedule (every merge measures the max hole run and compacts immediately
    when it exceeds the lookahead; a single merge of an overlapping pattern
    like a run of identical symbols can create arbitrarily long runs).
    Rolled wrap-around is harmless: the tail beyond extent is 0-filled and
    pad_stream guarantees cap ≥ extent + lookahead + 2.
    """
    nxt = jnp.roll(symbols, -1)
    for d in range(2, lookahead + 2):
        nxt = jnp.where(nxt == _HOLE, jnp.roll(symbols, -d), nxt)
    return nxt


def _prev_valid(symbols: jax.Array, lookahead: int):
    prv = jnp.roll(symbols, 1)
    for d in range(2, lookahead + 2):
        prv = jnp.where(prv == _HOLE, jnp.roll(symbols, d), prv)
    return prv


def _masked_pairs(symbols, weights, extent, iota, lookahead: int):
    """Packed pair ids + weights over the holed stream.

    Pair (i, next_valid(i)) counts unless: i is a hole, i >= extent-? (the
    last valid symbol has no successor — its rolled successor is a 0 pad or
    wrapped element, masked below), the successor starts a word, or either
    token id is 0 (train.wgsl:393-399).
    """
    tok = symbols & _TOKEN_MASK
    nxt = _next_valid(symbols, lookahead)
    nxt_tok = nxt & _TOKEN_MASK
    valid = (
        (symbols != _HOLE)
        & (iota < extent - 1)
        & (nxt != _HOLE)
        & ((nxt & _WS_BIT) == 0)
        & (tok != 0)
        & (nxt_tok != 0)
    )
    pair = jnp.where(valid, (tok << _U32(16)) | nxt_tok, _U32(0))
    w = jnp.where(valid, weights, 0)
    return pair, w, nxt


# Backwards-compatible hole-free pair mask (used by the distributed path).
def _pair_ids(symbols: jax.Array, n: jax.Array, iota: jax.Array):
    tok = symbols & _TOKEN_MASK
    nxt = jnp.roll(symbols, -1)
    nxt_tok = nxt & _TOKEN_MASK
    valid = (iota < n - 1) & ((nxt & _WS_BIT) == 0) & (tok != 0) & (nxt_tok != 0)
    pair = jnp.where(valid, (tok << _U32(16)) | nxt_tok, _U32(0))
    return pair, valid


def _run_totals(sp: jax.Array, sw: jax.Array) -> jax.Array:
    """Per-run weight totals of a sorted pair stream, placed at run ends
    (0 elsewhere and for the invalid pair id 0).

    The prefix sum runs in WRAPPING u32: the global stream mass may exceed
    2^31 (a 10 GB corpus has ~10G total pair mass), but only per-run
    DIFFERENCES are consumed, and a mod-2^32 difference is exact whenever
    the run's own mass < 2^32 — the same envelope as the reference's u32
    atomic counters (train.wgsl pair_counts). The previous-end lookup uses
    a cummax over END POSITIONS (monotone by construction, wrap-immune)
    plus one gather — recount-path only, so the gather is rare."""
    n = sp.shape[0]
    iota = lax.broadcasted_iota(jnp.uint32, (n,), 0)
    is_end = jnp.concatenate([sp[:-1] != sp[1:], jnp.ones((1,), bool)])
    csum = jnp.cumsum(sw.astype(jnp.uint32), dtype=jnp.uint32)  # wraps; diffs exact
    end_pos1 = jnp.where(is_end, iota + 1, 0)  # 1-based end positions
    prev_end1 = jnp.concatenate([jnp.zeros((1,), jnp.uint32), lax.cummax(end_pos1)[:-1]])
    prev_csum = jnp.where(prev_end1 > 0, csum[jnp.maximum(prev_end1, 1) - 1], 0)
    return jnp.where(is_end & (sp != 0), (csum - prev_csum).astype(jnp.int32), 0)


def _best_of_runs(sp: jax.Array, sw: jax.Array):
    """Winner over a sorted pair stream: (pair, count) with the reference
    tie-break (count desc, pair asc)."""
    run_total = _run_totals(sp, sw)
    best_count = jnp.max(run_total)
    best_pair = jnp.min(jnp.where((run_total == best_count) & (sp != 0), sp, _INVALID))
    best_pair = jnp.where(best_count > 0, best_pair, _U32(0))
    return best_pair, best_count


def _ub_bins(toks: jax.Array, w_masked: jax.Array) -> jax.Array:
    """Hashed weighted histogram of 16-bit token values, [_UB_SIDE]^2 f32 bins.

    _UB_SIDE^2 bins decomposed as a one-hot outer product, so the whole
    histogram is one [N, S] x [N, S] matmul on the MXU. Positions with
    ``w_masked == 0`` contribute nothing; collisions only ever ADD mass.
    """
    bits = (_UB_SIDE * _UB_SIDE).bit_length() - 1
    half = bits // 2
    h = ((toks * _U32(2654435761)) >> _U32(16)) & _U32(_UB_SIDE * _UB_SIDE - 1)
    hi = (h >> _U32(half)).astype(jnp.int32)
    lo = (h & _U32((1 << half) - 1)).astype(jnp.int32)
    io = lax.broadcasted_iota(jnp.int32, (1, _UB_SIDE), 1)
    a = jnp.where(hi[:, None] == io, w_masked[:, None].astype(jnp.float32), 0.0)
    c = jnp.where(lo[:, None] == io, 1.0, 0.0)
    return lax.dot_general(a, c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _ub_from_bins(bins: jax.Array) -> jax.Array:
    """Sound i32 ceiling from f32 bins: the max bin inflated past any f32
    accumulation error (safe direction: only ever over-estimates).

    The one-hot matmul accumulates up to ~N products through f32 adders
    with limited parallelism; the worst-case relative error is roughly
    (N/chunk + chunk) * 2^-24 ~ 5e-4 at N = 4M. The 4e-3 multiplicative
    slack covers that with ~8x margin for streams up to ~32M symbols (a
    1e-5 slack was measurably unsound at 64 MB corpus scale: an
    under-estimated ceiling let a stale candidate win a near-tie). The
    cost is a slightly earlier window end — never a wrong merge.
    """
    mx = jnp.max(bins) * (1.0 + 4e-3) + 4.0
    return jnp.where(mx > 2e9, jnp.int32(_I32_MAX), mx.astype(jnp.int32))


def find_best_pair(symbols: jax.Array, weights: jax.Array, n: jax.Array):
    """Exact weighted argmax pair (hole-free stream; single-call API)."""
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pair, valid = _pair_ids(symbols, n, iota)
    w = jnp.where(valid, weights, 0)
    sp, sw = lax.sort((pair, w), num_keys=1)
    return _best_of_runs(sp, sw)


def apply_merge_device(symbols, weights, n, pair, new_id):
    """One merge + immediate compaction (hole-free; used by replay/dist)."""
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    tok = symbols & _TOKEN_MASK
    ws = symbols & _WS_BIT
    nxt = jnp.roll(symbols, -1)
    a = pair >> _U32(16)
    b = pair & _TOKEN_MASK
    sites = (iota < n - 1) & (tok == a) & ((nxt & _TOKEN_MASK) == b) & ((nxt & _WS_BIT) == 0)
    merged = jnp.where(sites, new_id | ws, symbols)
    removed = jnp.concatenate([jnp.zeros((1,), bool), sites[:-1]])
    key = jnp.where(removed, _U32(cap) + iota.astype(_U32), iota.astype(_U32))
    _, sym_c, w_c = lax.sort((key, merged, weights), num_keys=1)
    n_new = n - jnp.sum(removed, dtype=jnp.int32)
    sym_c = jnp.where(iota < n_new, sym_c, _U32(0))
    w_c = jnp.where(iota < n_new, w_c, 0)
    return sym_c, w_c, n_new


def _compact(symbols, weights, n, extent, iota):
    """Stable left-pack: drop holes; zero the tail; extent := n."""
    is_hole = symbols == _HOLE
    cap = symbols.shape[0]
    key = jnp.where(is_hole, _U32(cap) + iota.astype(_U32), iota.astype(_U32))
    _, sym_c, w_c = lax.sort((key, symbols, weights), num_keys=1)
    sym_c = jnp.where(iota < n, sym_c, _U32(0))
    w_c = jnp.where(iota < n, w_c, 0)
    return sym_c, w_c


def apply_merge_with_holes(symbols, weights, n, extent, dirty, pair, new_id, nxt, lookahead):
    """Apply one merge to a holed stream (deferred compaction) and measure
    the created-pair histogram bins for the lazy-candidate certificate.

    Shared by the single-chip step and the per-shard body of the
    distributed step (which psums the bins across shards before taking the
    ceiling). Returns (symbols', weights', n', extent', dirty',
    prev_valid', next_valid', w_left, w_right) — the histogram inputs are
    returned raw so callers can exclude sampled/tracked created pairs
    before binning.
    """
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    tok = symbols & _TOKEN_MASK
    ws = symbols & _WS_BIT
    a = pair >> _U32(16)
    b = pair & _TOKEN_MASK
    valid = symbols != _HOLE
    nxt_tok = nxt & _TOKEN_MASK

    # pair 0 means NO merge (the system-wide "no winner" value; token-0
    # ADJACENCIES can exist in binary corpora, so (0,0) must not match) —
    # used by the neutralized-stop iteration in _one_merge
    noop = pair == _U32(0)
    # A-side: position i whose next-valid matches (a,b) — rewrite to Z.
    sites = (
        valid
        & (iota < extent - 1)
        & (nxt != _HOLE)
        & (tok == a)
        & (nxt_tok == b)
        & ((nxt & _WS_BIT) == 0)
        & ~noop
    )
    # B-side: position j whose prev-valid is the A of the pair — remove.
    prv = _prev_valid(symbols, lookahead)
    removed = (
        valid
        & (iota > 0)
        & (tok == b)
        & ((symbols & _WS_BIT) == 0)
        & (prv != _HOLE)
        & ((prv & _TOKEN_MASK) == a)
        & ~noop
    )
    merged = jnp.where(sites, new_id | ws, symbols)
    merged = jnp.where(removed, _HOLE, merged)
    n_new = n - jnp.sum(removed, dtype=jnp.int32)
    dirty_new = dirty + 1

    # Hole runs grow by more than 1 per merge when occurrences overlap
    # (e.g. "aaaa" under (a,a) removes adjacent symbols); compact as soon
    # as any run exceeds the next-valid lookahead. A run in the interior
    # longer than the lookahead is exactly a valid position whose
    # next-valid chain exhausted (returned HOLE); trailing runs that bleed
    # into the zero padding are harmless (tok 0 never pairs).
    nxt_m = _next_valid(merged, lookahead)
    prv_m = _prev_valid(merged, lookahead)
    overflow = jnp.any((merged != _HOLE) & (nxt_m == _HOLE))

    def with_compact(args):
        sym, wts = _compact(args[0], args[1], n_new, extent, iota)
        return sym, wts, n_new, jnp.asarray(0, jnp.int32), jnp.roll(sym, 1), jnp.roll(sym, -1)

    def no_compact(args):
        return args[0], args[1], extent, dirty_new, prv_m, nxt_m

    sym2, w2, extent2, dirty2, prev2, next2 = lax.cond(
        (dirty_new >= COMPACT_EVERY) | overflow,
        with_compact,
        no_compact,
        (merged, weights),
    )

    # ── created-pair histogram inputs for the lazy-candidate certificate ──
    # Every pair containing the token Z created by THIS merge sits at a Z
    # position of the post-merge stream: (prev, Z) and (Z, next). The masks
    # are permissive — extra mass only ever loosens the ceiling.
    tok2 = sym2 & _TOKEN_MASK
    z_mask = (tok2 == (new_id & _TOKEN_MASK)) & (sym2 != _HOLE)
    w_left = jnp.where(z_mask & ((sym2 & _WS_BIT) == 0), w2, 0)
    w_right = jnp.where(z_mask & ((next2 & _WS_BIT) == 0), w2, 0)
    return sym2, w2, n_new, extent2, dirty2, prev2, next2, w_left, w_right


def _post_counts(cand, counts, merged_pair, l_slot, r_slot, sym2, w2, extent2, lookahead):
    """Maintain exact candidate counts across one merge (a,b) -> Z.

    Proof that only the affected subset can change: any pair instance
    destroyed by the merge has an endpoint at a modified position, and
    every modified position held ``a`` (a rewritten site) or ``b`` (a
    removed B-side) pre-merge — so destroyed pairs have second member
    ``a``, first member ``b``, or are (a,b) itself (this covers the
    overlap-collapse quirk: inside a collapsed run every pre-pair is
    (a,b)). Every pair CREATED by the merge contains Z (new adjacencies
    only form across a removed position, whose compacted left neighbor is
    the Z its site produced), and no tracked candidate contains Z except
    the two sampled slots appended afterwards. All counted (a,b)
    instances are sites, so the merged pair's own count is 0 post-merge.

    The affected subset is recounted exactly on the post-merge stream
    with a tiered [A_FAST | A_AFFECTED, N] masked compare (81% of merges
    affect <= A_FAST candidates on real text); if more than A_AFFECTED
    candidates are affected (rare), the whole window is recounted
    densely — the round-1 per-iteration [K, N] pass, now the fallback.
    ``l_slot``/``r_slot`` (sentinel 1 when unused: no valid stream pair
    has a zero first member) ride the same pass, returning the sampled
    created pairs' exact counts for scratch-slot seeding + histogram
    exclusion. Returns (counts', c_l, c_r).
    """
    cap = sym2.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pair2, w2m, _ = _masked_pairs(sym2, w2, extent2, iota, lookahead)
    live = counts >= 0
    a = merged_pair >> _U32(16)
    b = merged_pair & _TOKEN_MASK
    ca, cb = cand >> _U32(16), cand & _TOKEN_MASK
    affected = live & ((cb == a) | (ca == b)) & (cand != merged_pair)
    n_aff = jnp.sum(affected.astype(jnp.int32))

    keys = jnp.where(affected, _U32(0), _U32(1))
    _, aff_sorted = lax.sort((keys, cand), num_keys=1)

    def sparse(width: int):
        def tier(_):
            ia = lax.broadcasted_iota(jnp.int32, (width,), 0)
            aff = jnp.where(ia < n_aff, aff_sorted[:width], _U32(1))
            lst = jnp.concatenate([aff, jnp.stack([l_slot, r_slot])])
            eq = lst[:, None] == pair2[None, :]
            cnt = jnp.sum(jnp.where(eq, w2m[None, :], 0), axis=1)
            match = cand[:, None] == aff[None, :]
            rec = jnp.max(jnp.where(match, cnt[None, :width], 0), axis=1)
            return jnp.where(affected, rec, counts), cnt[width], cnt[width + 1]

        return tier

    def dense(_):
        lst = jnp.concatenate([cand, jnp.stack([l_slot, r_slot])])
        eq = lst[:, None] == pair2[None, :]
        cnt = jnp.sum(jnp.where(eq, w2m[None, :], 0), axis=1)
        return jnp.where(live, cnt[: cand.shape[0]], counts), cnt[-2], cnt[-1]

    counts2, c_l, c_r = lax.cond(
        n_aff <= A_FAST,
        sparse(A_FAST),
        lambda _: lax.cond(n_aff <= A_AFFECTED, sparse(A_AFFECTED), dense, None),
        None,
    )
    counts2 = jnp.where(live & (cand == merged_pair), 0, counts2)
    return counts2, c_l, c_r


def _merge_and_track(st: TrainState, best_pair, count, nxt, lookahead, active=None):
    """Apply one certified merge to ``st`` and maintain the window state.

    ``active`` (traced bool, or None for unconditionally active) is the
    neutralized-stop gate: when False, the merge pair is replaced by the
    no-op pair 0 (matches nothing — see the noop guard in the kernel and
    in ``apply_merge_with_holes``), every state mutation is suppressed,
    and ``early_stop`` is set. The stream passes still run once — that
    single wasted iteration per training run is what removes the
    do_stop/do_merge conditional, whose identity branch copies the full
    symbol/weight arrays EVERY iteration (~10 us/merge measured on v5e;
    scripts/microbench_overhead.py).

    Applies ``best_pair`` -> ``st.next_id``, samples the heaviest created
    pairs into scratch slots (excluding them from the ceiling histogram),
    folds the created-pair ceiling into ``ub_new``, and appends to the
    merge log. ``st`` must already carry the window fields (cand, theta,
    ub_new, fill, recounts) for this merge.

    Returns ``(new_state, ub_merge, c_l, c_r, next2)`` where ``ub_merge``
    is the created-pair ceiling of THIS merge (sampled pairs excluded),
    ``c_l``/``c_r`` are the EXACT post-merge counts of the two sampled
    (histogram-excluded) pairs, and ``next2`` is the next-valid array of
    the post-merge stream — everything the dual-merge certificate in
    ``_one_merge`` needs.
    """
    # SOUNDNESS: when next_id > _TOKEN_MASK on a neutralized-stop pass,
    # this 16-bit truncation can alias a LIVE token, making the kernel's
    # created-pair bins/samp nonzero for a merge that did nothing. That is
    # inert only because every consumer is gated: sampling through
    # l_ok/r_ok (via has_room & active below) and the running ceiling via
    # the ub_merge zeroing when inactive. Keep them fully gated.
    z_tok16 = st.next_id & _TOKEN_MASK
    has_room = st.fill <= K_CANDIDATES + S_CREATED - 2
    if active is not None:
        best_pair = jnp.where(active, best_pair, _U32(0))  # no-op pair
        has_room = has_room & active
    if _use_pallas():
        from .pallas_kernels import (
            _TRACK_SIDE,
            N_PROBES,
            count_pairs2,
            merge_compact_tracked,
        )

        assert _UB_SIDE == _TRACK_SIDE, "host exclusion hash must match kernel bins"
        # ── affected candidates, computed BEFORE the merge from the
        # pre-merge window (the affected-subset rule needs only the merged
        # pair — see the _post_counts proof). The fused kernel counts them
        # exactly on the post-merge stream inside its existing streaming
        # pass, replacing the separate [A, N] affected-recount pass.
        # Kernel probe contract (token-0): probed pairs must have nonzero
        # members — holds for every live candidate by construction (stream
        # pairs never contain token 0 per _masked_pairs, and scratch slots
        # guard token 0 at sampling). Slots past n_aff are index-masked in
        # the kernel, so the pad word is irrelevant. ──
        live0 = st.cand_counts >= 0
        a_m = best_pair >> _U32(16)
        b_m = best_pair & _TOKEN_MASK
        ca0, cb0 = st.cand >> _U32(16), st.cand & _TOKEN_MASK
        affected = live0 & ((cb0 == a_m) | (ca0 == b_m)) & (st.cand != best_pair)
        n_aff = jnp.sum(affected.astype(jnp.int32))
        # gather the <= N_PROBES affected pairs into probe slots WITHOUT a
        # sort: each affected slot's exclusive rank is unique, so probe
        # slot k's masked sum has exactly one contributor — same window
        # order a stable sort would give, and order is irrelevant anyway
        # (probe counts are matched back by pair equality). A [192]
        # lax.sort costs ~10 us of fixed overhead per iteration on TPU.
        rank = jnp.cumsum(affected.astype(jnp.int32)) - 1
        ia_p = lax.broadcasted_iota(jnp.int32, (N_PROBES,), 0)
        sel = affected[None, :] & (rank[None, :] == ia_p[:, None])
        probes = jnp.sum(jnp.where(sel, st.cand[None, :], _U32(0)), axis=1)
        probes = jnp.where(ia_p < n_aff, probes, _U32(1))
        use_probes = n_aff <= N_PROBES
        # one streaming kernel: merge + compaction + created-pair tracking
        # (unexcluded histograms + heaviest-pair sample) + probe counts
        sym2, w2, n_new, bins_l, bins_r, samp, pcnt = merge_compact_tracked(
            st.symbols, st.weights, st.n, best_pair, st.next_id,
            probes=(probes, jnp.where(use_probes, n_aff, 0)),
            interpret=_pallas_interpret(),
        )
        extent2, dirty2 = n_new, jnp.asarray(0, jnp.int32)
        next2 = None  # compacted stream: merge 2 never needs a hole chain
        # token-0 guard: a sampled pair with a zero member is never counted
        # by _masked_pairs (train.wgsl:393-399 skips token 0), so tracking
        # it would seed a maintained count that over-states its pair-stream
        # count. Leave it unsampled — its bin mass stays in the ceiling.
        l_ok = has_room & (samp[0] > 0) & (samp[1] != 0)
        r_ok = has_room & (samp[2] > 0) & (samp[3] != 0)
        l_tok = jnp.where(l_ok, samp[1].astype(_U32), _U32(_NO_EXCL))
        r_tok = jnp.where(r_ok, samp[3].astype(_U32), _U32(_NO_EXCL))
    else:
        (sym2, w2, n_new, extent2, dirty2,
         prev2, next2, w_left, w_right) = apply_merge_with_holes(
            st.symbols, st.weights, st.n, st.extent, st.dirty,
            best_pair, st.next_id, nxt, lookahead,
        )

        # ── sample the heaviest-position created pairs, track them
        # exactly, and exclude them from the ceiling histogram. Only
        # performed when scratch slots remain: a tracked pair must stay
        # tracked until the next recount, or its exclusion would be
        # unsound. ──
        li = jnp.argmax(w_left)
        ri = jnp.argmax(w_right)
        # token-0 guard: see the Pallas branch above
        l_ok = has_room & (w_left[li] > 0) & ((prev2[li] & _TOKEN_MASK) != 0)
        r_ok = has_room & (w_right[ri] > 0) & ((next2[ri] & _TOKEN_MASK) != 0)
        l_tok = jnp.where(l_ok, prev2[li] & _TOKEN_MASK, _U32(_NO_EXCL))
        r_tok = jnp.where(r_ok, next2[ri] & _TOKEN_MASK, _U32(_NO_EXCL))
        w_left_x = jnp.where((prev2 & _TOKEN_MASK) == l_tok, 0, w_left)
        w_right_x = jnp.where((next2 & _TOKEN_MASK) == r_tok, 0, w_right)
        bins_l = _ub_bins(prev2 & _TOKEN_MASK, w_left_x)
        bins_r = _ub_bins(next2 & _TOKEN_MASK, w_right_x)

    # ── exact counts: the sampled created pairs ride the same affected-
    # recount pass that maintains the candidate counts (see _post_counts);
    # the masked pair-stream sums are exact counts, not histogram bounds ──
    l_pair = jnp.where(l_ok, (l_tok << _U32(16)) | z_tok16, _INVALID)
    r_pair = jnp.where(r_ok, (z_tok16 << _U32(16)) | r_tok, _INVALID)
    l_slot = jnp.where(l_ok, l_pair, _U32(1))
    r_slot = jnp.where(r_ok, r_pair, _U32(1))
    if _use_pallas():
        # candidate counts come from the kernel's fused probe pass when the
        # affected set fits the probe slots (>99% of merges); the sampled
        # created pairs still need one cheap fused elementwise pass (their
        # identity is only known from the kernel's output sample, and the
        # exclusion + dual-merge certificate need their counts NOW). A
        # dense _post_counts recount remains the rare wide-merge fallback.
        def from_probes(_):
            # exact _masked_pairs counts of the two sampled created pairs
            # via one O(n) dynamic-grid streaming kernel — this was a full
            # O(capacity) XLA pass (the kernel's token-0 guard makes the
            # sentinel slots count 0, exactly like _masked_pairs)
            cnt2 = count_pairs2(sym2, w2, n_new, l_slot, r_slot,
                                interpret=_pallas_interpret())
            c_l, c_r = cnt2[0], cnt2[1]
            match = (st.cand[:, None] == probes[None, :]) & (ia_p < n_aff)[None, :]
            rec = jnp.max(jnp.where(match, pcnt[None, :], 0), axis=1)
            counts2 = jnp.where(affected, rec, st.cand_counts)
            counts2 = jnp.where(live0 & (st.cand == best_pair), 0, counts2)
            return counts2, c_l, c_r

        def dense_fallback(_):
            return _post_counts(
                st.cand, st.cand_counts, best_pair, l_slot, r_slot,
                sym2, w2, extent2, lookahead,
            )

        counts2, c_l, c_r = lax.cond(use_probes, from_probes, dense_fallback, None)
    else:
        counts2, c_l, c_r = _post_counts(
            st.cand, st.cand_counts, best_pair, l_slot, r_slot, sym2, w2, extent2, lookahead
        )
    if _use_pallas():
        # subtract each sampled pair's exact count from its bin — identical
        # to in-stream exclusion because the pair's whole mass lives there.
        # One-hot mask instead of .at[].add: a 1-element scatter is a slow
        # op on TPU, and this runs twice per merge.
        def _excl(bins, tok, c):
            h = ((tok * _U32(2654435761)) >> _U32(16)) & _U32(_UB_SIDE * _UB_SIDE - 1)
            half = ((_UB_SIDE * _UB_SIDE).bit_length() - 1) // 2  # matches the kernel
            hi = (h >> _U32(half)).astype(jnp.int32)
            lo = (h & _U32((1 << half) - 1)).astype(jnp.int32)
            ri = lax.broadcasted_iota(jnp.int32, (_UB_SIDE, _UB_SIDE), 0)
            ci = lax.broadcasted_iota(jnp.int32, (_UB_SIDE, _UB_SIDE), 1)
            return bins - jnp.where((ri == hi) & (ci == lo), c.astype(jnp.float32), 0.0)

        bins_l = _excl(bins_l, l_tok, c_l)
        bins_r = _excl(bins_r, r_tok, c_r)
    ub_merge = jnp.maximum(_ub_from_bins(bins_l), _ub_from_bins(bins_r))
    slot0 = jnp.where(has_room, st.fill, K_CANDIDATES + S_CREATED - 2)
    cand2 = lax.dynamic_update_slice(st.cand, jnp.stack([l_pair, r_pair]), (slot0,))
    cand2 = jnp.where(has_room, cand2, st.cand)
    counts3 = lax.dynamic_update_slice(
        counts2,
        jnp.stack([jnp.where(l_ok, c_l, -1), jnp.where(r_ok, c_r, -1)]),
        (slot0,),
    )
    counts3 = jnp.where(has_room, counts3, counts2)
    fill2 = jnp.where(has_room, st.fill + 2, st.fill)

    log = lax.dynamic_update_slice(
        st.merge_log,
        jnp.stack([best_pair, st.next_id, count.astype(_U32)])[None, :],
        (st.merges_done, 0),
    )
    if active is None:
        adv, early = _U32(1), st.early_stop
    else:
        # a neutralized iteration advances nothing (its log row sits past
        # merges_done, never consumed) and raises early_stop; ub_merge of
        # a no-op pass is gated out of the running ceiling
        adv = jnp.where(active, _U32(1), _U32(0))
        early = st.early_stop | ~active
        ub_merge = jnp.where(active, ub_merge, 0)
    new_state = st._replace(
        symbols=sym2,
        weights=w2,
        n=n_new,
        extent=extent2,
        dirty=dirty2,
        next_id=st.next_id + adv,
        early_stop=early,
        merges_done=st.merges_done + adv.astype(jnp.int32),
        merge_log=log,
        cand=cand2,
        cand_counts=counts3,
        ub_new=jnp.maximum(st.ub_new, ub_merge),
        fill=fill2,
    )
    return new_state, ub_merge, c_l, c_r, next2


def _pick_window(sp, run_total):
    """Winner + fresh candidate window + theta from a sorted pair stream
    with per-run totals at run ends. Shared by the monolithic and the
    two-level segmented recounts (identical selection semantics)."""
    # exact winner with the reference's is_better ordering
    # (train.wgsl:83-85): count desc, pair id asc
    bc = jnp.max(run_total)
    bp = jnp.min(jnp.where((run_total == bc) & (sp != 0), sp, _INVALID))
    bp = jnp.where(bc > 0, bp, _U32(0))
    # candidate set: approx top-K is fine BECAUSE theta below is the
    # EXACT max count over non-candidates — a missed heavy pair only
    # shortens the window (more recounts), never breaks exactness.
    # approx_max_k is ~10x cheaper than exact lax.top_k here.
    _av, ai = lax.approx_max_k(run_total.astype(jnp.float32), K_CANDIDATES)
    picked = run_total[ai]
    # a picked position with run_total == 0 is NOT a run end (possible
    # when the stream has fewer than K distinct pairs): its sp value is
    # some run's interior, and seeding it with count 0 would track a
    # pair with a WRONG maintained count. Invalidate such slots — the
    # pair stays untracked and theta covers it exactly.
    ok = picked > 0
    new_cand = jnp.where(ok, sp[ai], _INVALID).at[0].set(bp)
    new_counts = jnp.where(ok, picked, -1).at[0].set(bc)  # exact seeds
    tracked = jnp.any(new_cand[:, None] == sp[None, :], axis=0)
    new_theta = jnp.max(jnp.where(tracked, 0, run_total))
    new_cand = jnp.concatenate([new_cand, jnp.full((S_CREATED,), _INVALID, _U32)])
    new_counts = jnp.concatenate([new_counts, jnp.full((S_CREATED,), -1, jnp.int32)])
    return (bp, bc, new_cand, new_counts, new_theta,
            jnp.asarray(0, jnp.int32), jnp.asarray(K_CANDIDATES, jnp.int32))


# Above this capacity the recount's monolithic O(cap log cap) sort is
# replaced by the two-level segmented scheme (measured ~32 ns/element of
# capacity at the 2^25 rung — the dominant term of the 10 GB train).
_SEG_RECOUNT_MIN_CAP = 1 << 22
_SEG_RECOUNT_M = 1 << 17  # segment length: the sort's VMEM sweet spot


def _seg_recount_enabled() -> bool:
    """Trace-time gate: the two-level recount needs the Pallas compaction
    kernel; GPU_BPE_TPU_SEG_RECOUNT=0 is the escape hatch."""
    if _os.environ.get("GPU_BPE_TPU_SEG_RECOUNT") == "0":
        return False
    return _use_pallas()


def _run_totals_reset(sp: jax.Array, sw: jax.Array) -> jax.Array:
    """Per-run totals of a [nseg, m] segment-sorted pair stream, at run
    ends (0 elsewhere and for pair id 0) — runs break at row boundaries.

    Gather-free: a segmented-reset Hillis-Steele scan carries (sum, seen-
    start) pairs, so no csum[prev_end] lookup is needed (the monolithic
    ``_run_totals`` pays an O(n) gather). Sums accumulate in wrapping u32
    WITHIN a run only — exact whenever the run's own mass < 2^32, the
    same envelope as the reference's u32 atomics (train.wgsl pair_counts).
    """
    rows, m = sp.shape
    start = jnp.concatenate(
        [jnp.ones((rows, 1), bool), sp[:, 1:] != sp[:, :-1]], axis=1
    )
    rs = sw.astype(jnp.uint32)
    flag = start
    s = 1
    while s < m:
        pad_v = jnp.zeros((rows, s), jnp.uint32)
        pad_f = jnp.zeros((rows, s), bool)
        lv = jnp.concatenate([pad_v, rs[:, :-s]], axis=1)
        lf = jnp.concatenate([pad_f, flag[:, :-s]], axis=1)
        rs = rs + jnp.where(flag, 0, lv)
        flag = flag | lf
        s <<= 1
    is_end = jnp.concatenate(
        [sp[:, :-1] != sp[:, 1:], jnp.ones((rows, 1), bool)], axis=1
    )
    return jnp.where(is_end & (sp != 0), rs.astype(jnp.int32), 0)


def _full_recount_segmented(pair, w, cap):
    """Two-level exact recount (round 5): per-segment sort + run totals,
    Pallas-compact the (pair, count) run summaries, then ONE much smaller
    monolithic sort combines per-segment counts into global totals.

    Exactness: every per-segment count is an exact sum; the second level
    sums a pair's per-segment counts (``_run_totals`` over the compacted
    summaries), so global totals equal the monolithic recount's. Window
    selection is the shared ``_pick_window`` — winner/theta identical by
    construction; candidate PICKS may differ from the monolithic layout
    (approx_max_k sees a different array), which only moves certificate
    windows, never a merge (the same robustness the word-order-permutation
    conformance tests pin). Summary counts are tiered (cap/8 then cap/2)
    with a monolithic fallback when the stream has more runs than that —
    each tier bitwise-exact.
    """
    from .pallas_kernels import compact_mask

    m = _SEG_RECOUNT_M
    nseg = cap // m
    sp, sw = lax.sort(
        (pair.reshape(nseg, m), w.reshape(nseg, m)), dimension=1, num_keys=1
    )
    rt = _run_totals_reset(sp, sw)
    flat_sp = sp.reshape(-1)
    flat_rt = rt.reshape(-1)
    # the compaction's PRIMARY word only preserves its low 16 bits (bits
    # 16..30 are in-flight displacement scratch) — full-width pair ids and
    # counts ride as extras
    prim = jnp.where(flat_rt > 0, _U32(0), _INVALID)
    outs, cnt = compact_mask(
        prim, [flat_sp, flat_rt.astype(jnp.uint32)], interpret=_pallas_interpret()
    )

    def level2(rcap: int):
        def branch():
            sp2 = outs[1][:rcap]
            c2 = outs[2][:rcap].astype(jnp.int32)
            io = lax.broadcasted_iota(jnp.int32, (rcap,), 0)
            live = io < cnt
            sp2 = jnp.where(live, sp2, _U32(0))
            c2 = jnp.where(live, c2, 0)
            ssp, ssw = lax.sort((sp2, c2), num_keys=1)
            return _pick_window(ssp, _run_totals(ssp, ssw))

        return branch

    def monolithic():
        sp1, sw1 = lax.sort((pair, w), num_keys=1)
        return _pick_window(sp1, _run_totals(sp1, sw1))

    rcap1, rcap2 = cap >> 3, cap >> 1
    return lax.cond(
        cnt <= rcap1,
        level2(rcap1),
        lambda: lax.cond(cnt <= rcap2, level2(rcap2), monolithic),
    )


def _full_recount_impl(symbols, weights, extent, iota, lookahead):
    """Exact full recount: sort-based winner + fresh candidate window.

    Returns (best_pair, count, cand, counts, theta, ub_new=0,
    fill=K_CANDIDATES) — the 7-tuple both iteration structures adopt.
    At large capacities the sort runs the two-level segmented scheme
    (``_full_recount_segmented``).
    """
    pair, w, _nxt = _masked_pairs(symbols, weights, extent, iota, lookahead)
    cap = symbols.shape[0]
    if cap >= _SEG_RECOUNT_MIN_CAP and cap % _SEG_RECOUNT_M == 0 and _seg_recount_enabled():
        return _full_recount_segmented(pair, w, cap)
    sp, sw = lax.sort((pair, w), num_keys=1)
    return _pick_window(sp, _run_totals(sp, sw))


def _ensure_pending(state: TrainState) -> TrainState:
    """Refresh the pending winner via a full recount when the carried
    certificate failed (or ground-truth mode demands it). Runs OUTSIDE
    the per-merge loop — round 5: a ``lax.cond`` whose untaken branch
    contains the O(cap log cap) recount sort costs ~269 µs per EXECUTION
    of the surrounding loop body on TPU even when never taken (bisected:
    45 -> 314 µs/merge at the 16 MB depth-1024 state), so the per-merge
    body must not contain it; the nested-loop ``train_batch`` pays it
    once per actual recount instead."""
    cap = state.symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)

    certified = state.pend_cert
    if _os.environ.get("GPU_BPE_TPU_FORCE_RECOUNT"):
        # ground-truth mode (see _one_merge): every merge recounts
        certified = jnp.asarray(False)

    def adopt(st):
        return st

    def full_recount(st):
        bp, bc, cand, ccounts, theta, ub_new, fill = _full_recount_impl(
            st.symbols, st.weights, st.extent, iota, 0
        )
        return st._replace(
            pend_pair=bp, pend_count=bc, cand=cand, cand_counts=ccounts,
            theta=theta, ub_new=ub_new, fill=fill,
            pend_cert=jnp.asarray(True),
            recounts=st.recounts + 1,
        )

    return lax.cond(certified, adopt, full_recount, state)


def _one_merge_fused_certified(state: TrainState, batch_merges) -> TrainState:
    """One device iteration over an ALREADY-CERTIFIED pending winner —
    the fused-window structure's inner body (single-chip Pallas default).

    Same certificate and merge semantics as ``_one_merge`` (bitwise-equal
    merge lists — validated vs the classic structure and the
    FORCE_RECOUNT ground truth), restructured so the while body is ~3
    custom calls + a handful of fusions instead of ~66 tiny window ops
    (round-3 HLO diagnosis: the iteration was op-count-bound at ~2 us
    launch overhead per op):

    * winner + certificate — computed by the PREVIOUS iteration's
      window-post kernel, carried in ``pend_pair/pend_count/pend_cert``
      (``_ensure_pending`` refreshes them when the certificate fails —
      round 5: OUTSIDE this body, see its docstring);
    * probe prep — block 0 of the merge kernel derives the affected
      candidate subset from the window in-kernel;
    * post-merge window maintenance + next-winner selection — ONE
      [2,128]-tile Pallas kernel (ops.pallas_kernels.window_post).

    Multi-merge (GPU_BPE_TPU_MULTI) keeps the classic structure: its
    nested conds cost more than they save single-chip (see _one_merge).
    """
    from .pallas_kernels import (
        N_PROBES,
        W_SLOTS,
        count_pairs2,
        merge_compact_tracked,
        window_post,
    )

    assert K_CANDIDATES + S_CREATED == W_SLOTS

    best_pair, count, cand, ccounts, theta, ub_new, fill = (
        state.pend_pair, state.pend_count, state.cand,
        state.cand_counts, state.theta, state.ub_new, state.fill,
    )
    recounts = state.recounts
    interp = _pallas_interpret()
    stop = (count < 2) | (state.next_id > _TOKEN_MASK)
    active = ~stop
    # neutralized stop: pair 0 matches nothing (see _merge_and_track)
    pair_eff = jnp.where(active, best_pair, _U32(0))
    has_room = (fill <= W_SLOTS - 2) & active

    (sym2, w2, n_new, bins_l, bins_r, samp, pcnt, probes_out, naff_a) = (
        merge_compact_tracked(
            state.symbols, state.weights, state.n, pair_eff, state.next_id,
            window=(cand, ccounts), interpret=interp,
        )
    )
    n_aff = naff_a[0]
    use_probes = n_aff <= N_PROBES

    # sampled created pairs: slots + exact counts (token-0 guard as in
    # _merge_and_track; see the z_tok16 aliasing note there — everything
    # below is gated through has_room/active)
    z16 = state.next_id & _TOKEN_MASK
    l_ok = has_room & (samp[0] > 0) & (samp[1] != 0)
    r_ok = has_room & (samp[2] > 0) & (samp[3] != 0)
    l_tok = jnp.where(l_ok, samp[1].astype(_U32), _U32(_NO_EXCL))
    r_tok = jnp.where(r_ok, samp[3].astype(_U32), _U32(_NO_EXCL))
    l_slot = jnp.where(l_ok, (l_tok << _U32(16)) | z16, _U32(1))
    r_slot = jnp.where(r_ok, (z16 << _U32(16)) | r_tok, _U32(1))
    cnt2 = count_pairs2(sym2, w2, n_new, l_slot, r_slot, interpret=interp)

    # rare wide-merge fallback: dense window recount in XLA (the cheap
    # branch passes the maintained counts through; c_l/c_r come from the
    # streaming kernel). >99% of merges take the cheap branch.
    def dense_fallback(_):
        return _post_counts(
            cand, ccounts, pair_eff, l_slot, r_slot, sym2, w2, n_new, 0
        )

    def from_kernel(_):
        return ccounts, cnt2[0], cnt2[1]

    counts_sel, c_l, c_r = lax.cond(use_probes, from_kernel, dense_fallback, None)

    cand2, counts3, log2, sc_out = window_post(
        cand, counts_sel, bins_l, bins_r, state.merge_log.reshape(-1),
        pair=pair_eff, count=count, next_id=state.next_id, theta=theta,
        ub_new=ub_new, fill=fill, merges_done=state.merges_done,
        active=active, early_stop=state.early_stop, use_probes=use_probes,
        n_aff=n_aff, c_l=c_l, c_r=c_r, l_ok=l_ok, r_ok=r_ok,
        l_tok=l_tok, r_tok=r_tok, has_room=has_room,
        probes=probes_out, pcnt=pcnt, interpret=interp,
    )

    pend_cert = sc_out[5] != 0
    if _os.environ.get("GPU_BPE_TPU_FORCE_RECOUNT"):
        # ground-truth mode: never carry a certificate, so the outer
        # loop recounts before every merge
        pend_cert = jnp.asarray(False)

    return state._replace(
        symbols=sym2,
        weights=w2,
        n=n_new,
        extent=n_new,
        dirty=jnp.asarray(0, jnp.int32),
        next_id=sc_out[6].astype(_U32),
        early_stop=sc_out[2] != 0,
        merges_done=sc_out[0],
        merge_log=log2.reshape(BATCH_MERGES, 3),
        cand=cand2,
        cand_counts=counts3,
        theta=theta,
        ub_new=sc_out[3],
        recounts=recounts,
        fill=sc_out[1],
        pend_pair=sc_out[7].astype(_U32),
        pend_count=sc_out[4],
        pend_cert=pend_cert,
    )


def _one_merge_fused(state: TrainState, batch_merges) -> TrainState:
    """One device iteration, fused-window structure: refresh the pending
    winner if uncertified, then merge. Single-dispatch-per-merge callers
    (tests, the CI interpret driver) use this; ``train_batch`` calls the
    two pieces in its nested-loop structure instead so the recount cond
    stays out of the hot inner body (see ``_ensure_pending``)."""
    return _one_merge_fused_certified(_ensure_pending(state), batch_merges)


def _one_merge(state: TrainState, batch_merges) -> TrainState:
    """One device iteration: one exact merge, or TWO when the dual-merge
    certificate fires (sharing a single candidate-count pass).

    On the single-chip Pallas path (multi-merge off) the fused-window
    structure runs instead — see ``_one_merge_fused``; this classic
    structure serves the jnp/CPU path and GPU_BPE_TPU_MULTI.

    The winner is the global weighted argmax pair with the reference
    tie-break. Proof of exactness of the candidate fast path: let R be the
    last full recount. (1) Every pair present at R that is not in ``cand``
    had count <= theta at R, and counts of pairs containing no post-R token
    never increase (merges only destroy such pairs; every created pair
    contains the token the merge created). (2) Every pair containing a
    post-R token Z_j had, at its creation, count <= the max hash-bin of the
    Z_j-position histograms (collisions only add), recorded in ``ub_new``;
    such pairs never gain occurrences afterwards (new adjacencies always
    involve a strictly newer token, which carries its own bound). (3)
    Candidate counts are recomputed exactly from the live stream every
    iteration. Hence if max-candidate-count m > max(theta, ub_new), the
    candidate winner is the global winner; ties need strict inequality,
    which the certificate enforces. Otherwise fall back to a full recount.

    Dual-merge certificate (second winner q from the SAME counts): q is
    the argmax-with-tie-break over tracked candidates excluding the first
    winner p1. After merging p1 -> Z, the serial trainer's next argmax is
    provably q when ALL of:

    * q shares no member token with p1 — then merge 1 cannot change q's
      count, so m2 (q's pre-merge count) is exact post-merge;
    * m2 > theta and m2 > ub_new — beats untracked old pairs and pairs
      created earlier in the window (their counts never increase), strict
      because a smaller-id pair at equal count would win the tie-break;
    * every other tracked r satisfies (m2, q) >= (c_r_pre, r) in the
      (count desc, pair asc) order — automatic from the argmax selection,
      and sound because post-merge counts of old pairs only decrease: a
      strict count win stays a win, and an equal-count win holds because
      q's id is smaller and r can only have dropped;
    * m2 > ub_merge1 (ceiling on merge 1's unsampled created pairs) and
      m2 > c_l, c_r (EXACT post-merge counts of merge 1's two sampled,
      histogram-excluded pairs) — beats every pair containing Z, strict
      because created pair ids are not ordered above q's.

    The same argument applies one level deeper for a THIRD winner r3
    (argmax excluding p1 and q): r3 must additionally be member-disjoint
    from q and strictly beat merge 2's created-pair ceilings. When any
    condition fails, the iteration applies fewer merges — the multi-merge
    path never changes WHICH merges happen, only how many candidate-count
    passes they cost.
    """
    if _use_pallas() and not _multi_merge_enabled():
        return _one_merge_fused(state, batch_merges)
    cap = state.symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    # Pallas path: the stream is compacted after every merge, so there are
    # never holes and the next/prev-valid chains collapse to single rolls.
    lookahead = 0 if _use_pallas() else COMPACT_EVERY

    # ── winner from the MAINTAINED exact candidate counts (no stream pass:
    # counts were updated by _post_counts when the previous merge applied) ──
    cand_counts = state.cand_counts
    m = jnp.max(cand_counts)
    cand_winner = jnp.min(jnp.where(cand_counts == m, state.cand, _INVALID))
    certified = (m > state.theta) & (m > state.ub_new) & (m >= 2)
    if _os.environ.get("GPU_BPE_TPU_FORCE_RECOUNT"):
        # ground-truth mode for soundness validation: every merge is a
        # full sort-based recount; the window/dual fast paths never fire.
        # (An env flag, not a monkeypatch: JAX memoizes traces on function
        # identity, so patching module functions after a first trace is
        # silently ignored.)
        certified = jnp.asarray(False)

    # ── second and third winners for the multi-merge certificate ──
    counts2 = jnp.where(state.cand == cand_winner, -1, cand_counts)
    m2 = jnp.max(counts2)
    q = jnp.min(jnp.where(counts2 == m2, state.cand, _INVALID))
    a1, b1 = cand_winner >> _U32(16), cand_winner & _TOKEN_MASK
    qa, qb = q >> _U32(16), q & _TOKEN_MASK
    disjoint = (qa != a1) & (qa != b1) & (qb != a1) & (qb != b1)
    dual_pre = (
        certified
        & disjoint
        & (m2 >= 2)
        & (m2 > state.theta)
        & (m2 > state.ub_new)
        & (state.next_id + _U32(1) <= _TOKEN_MASK)
        & (state.merges_done + 2 <= batch_merges)
    )
    if not _multi_merge_enabled():
        # Single-chip default since round 3: with candidate counts
        # MAINTAINED (probe-fused kernel recounts), a multi-merge
        # iteration no longer shares any stream pass — it only shares
        # iteration overhead, and the nested cond boundaries it needs
        # cost MORE than that overhead on TPU (measured at the 16 MB
        # depth-1024 state: 223 µs/merge dual+triple vs 166 µs/merge
        # single). The DISTRIBUTED step keeps multi-merge: there an
        # iteration pays ICI collective latency, which dualing halves.
        # Merge lists are invariant either way (the certificate never
        # changes WHICH merges apply). Re-enable: GPU_BPE_TPU_MULTI=1.
        dual_pre = jnp.asarray(False)
    counts3 = jnp.where(state.cand == q, -1, counts2)
    m3 = jnp.max(counts3)
    r3 = jnp.min(jnp.where(counts3 == m3, state.cand, _INVALID))
    ra, rb = r3 >> _U32(16), r3 & _TOKEN_MASK
    disjoint3 = (
        (ra != a1) & (ra != b1) & (rb != a1) & (rb != b1)
        & (ra != qa) & (ra != qb) & (rb != qa) & (rb != qb)
    )
    triple_pre = (
        dual_pre
        & disjoint3
        & (m3 >= 2)
        & (m3 > state.theta)
        & (m3 > state.ub_new)
        & (state.next_id + _U32(2) <= _TOKEN_MASK)
        & (state.merges_done + 3 <= batch_merges)
    )

    def full_recount(_):
        return _full_recount_impl(
            state.symbols, state.weights, state.extent, iota, lookahead
        )

    def from_candidates_full(_):
        return (cand_winner, m, state.cand, state.cand_counts, state.theta,
                state.ub_new, state.fill)

    best_pair, count, cand, ccounts, theta, ub_new, fill = lax.cond(
        certified, from_candidates_full, full_recount, None
    )
    recounts = state.recounts + jnp.where(certified, 0, 1)
    stop = (count < 2) | (state.next_id > _TOKEN_MASK)

    # Neutralized stop: the iteration that discovers the stop still runs
    # the merge body once with the no-op pair 0 and every state mutation
    # gated off (active=~stop in _merge_and_track) — the result equals the
    # pre-iteration state except early_stop plus the adopted window fields
    # (cand/theta/recounts), all inert because the loop exits immediately.
    # This removes the former do_stop/do_merge conditional, whose identity
    # branch copied the full symbol/weight arrays every iteration.
    st_base = state._replace(
        cand=cand, cand_counts=ccounts, theta=theta, ub_new=ub_new,
        fill=fill, recounts=recounts,
    )
    # pre-merge next-valid chain, needed only by the jnp holed path
    nxt = None if _use_pallas() else _next_valid(state.symbols, lookahead)
    st1, ub_merge1, c_l, c_r, next2 = _merge_and_track(
        st_base, best_pair, count, nxt, lookahead, active=~stop
    )
    dual = dual_pre & ~stop & (m2 > ub_merge1) & (m2 > c_l) & (m2 > c_r)

    def second(s: TrainState) -> TrainState:
        s2, ub_merge2, c_l2, c_r2, next3 = _merge_and_track(s, q, m2, next2, lookahead)
        # third winner: same proof one level deeper — r3's pre-merge
        # count is exact (member-disjoint from BOTH applied pairs, and
        # old-pair counts only decrease), and it must strictly beat
        # every ceiling of both merges' created pairs
        triple = (
            triple_pre
            & (m3 > ub_merge1) & (m3 > c_l) & (m3 > c_r)
            & (m3 > ub_merge2) & (m3 > c_l2) & (m3 > c_r2)
        )

        def third(t: TrainState) -> TrainState:
            t2, _ub, _cl, _cr, _nx = _merge_and_track(t, r3, m3, next3, lookahead)
            return t2._replace(duals=t2.duals + 2)

        return lax.cond(triple, third, lambda t: t._replace(duals=t.duals + 1), s2)

    return lax.cond(dual, second, lambda s: s, st1)


# Capacity below which the mid-batch collapse stop is disabled (stopping
# to shrink is pointless once the host cannot shrink further).
_MIN_SHRINK_CAP = 4096


def train_batch(
    state: TrainState, batch_merges: jax.Array, recount_budget: jax.Array | None = None
) -> TrainState:
    """Run up to ``batch_merges`` merges on device with early stopping.

    Equivalent of encodeBatch + the GPU-driven IterState loop
    (training-pipeline.js:178-233): zero host round trips inside the batch.
    Ends with a compaction so the host sees a hole-free prefix (capacity
    shrinking and checkpoint replay rely on it).

    Collapse stop: every sort/scan in the loop is O(capacity), and the
    stream often shrinks several-fold within one batch (905K -> 342K
    symbols in the first 512 merges of the 16 MB bench). When the live
    count falls below half capacity the loop returns early so the host
    can re-pad onto the next rung of the power-of-two ladder — one extra
    round trip buys a 2x cheaper iteration for the rest of the batch.

    Recount budget: ``recount_budget`` (traced i32, optional) caps the
    number of FULL sort recounts one dispatch performs — the loop returns
    early (merges_done < batch_merges, no flags set) once the cap is hit,
    and the host simply re-dispatches. A full recount costs O(cap log cap)
    (~1 s at the 2^25 rung), so an unlucky recount-dense stretch can push
    a single dispatch past execution watchdogs (the 10 GB train died
    deterministically at merge 17,573: batch 18's recount rate doubled to
    59, crossing this environment's measured ~60 s per-dispatch limit —
    scripts/probe_dispatch_limit.py). Bounding recounts bounds dispatch
    wall time data-independently; the merge list is invariant (the budget
    only moves batch boundaries). Progress is guaranteed: the check reads
    recounts BEFORE the iteration, so at least one merge happens per
    dispatch even at budget 1.
    """
    state = state._replace(merges_done=jnp.asarray(0, jnp.int32))
    cap = state.symbols.shape[0]
    recounts0 = state.recounts

    def cond(st: TrainState):
        go = (st.merges_done < batch_merges) & ~st.early_stop
        if cap > _MIN_SHRINK_CAP:  # static per trace
            collapsed = (st.n + 32 <= cap // 2) & (st.merges_done > 0)
            go &= ~collapsed
        if recount_budget is not None:
            go &= (st.recounts - recounts0) < recount_budget
        return go

    if _use_pallas() and not _multi_merge_enabled():
        # Fused path, nested loops (round 5): the inner while runs only
        # CERTIFIED merges — its body has no recount branch, because a
        # lax.cond containing the O(cap log cap) sort costs ~269 µs per
        # body execution even when untaken (bisected 45 -> 314 µs/merge).
        # The outer loop recounts once per actual certificate failure
        # (~2.5% of merges on the 16 MB bench).
        def inner_cond(st: TrainState):
            # no budget term: inner merges never recount, and allowing
            # the merge that follows the budget-th recount preserves the
            # old structure's "at least one merge per dispatch" guarantee
            go = (st.merges_done < batch_merges) & ~st.early_stop
            if cap > _MIN_SHRINK_CAP:
                collapsed = (st.n + 32 <= cap // 2) & (st.merges_done > 0)
                go &= ~collapsed
            return go & st.pend_cert

        inner_body = _functools.partial(
            _one_merge_fused_certified, batch_merges=batch_merges
        )

        def outer_body(st: TrainState):
            st = _ensure_pending(st)
            return lax.while_loop(inner_cond, inner_body, st)

        state = lax.while_loop(cond, outer_body, state)
    else:
        body = _functools.partial(_one_merge, batch_merges=batch_merges)
        state = lax.while_loop(cond, body, state)

    def final_compact(st: TrainState) -> TrainState:
        cap = st.symbols.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        sym, w = _compact(st.symbols, st.weights, st.n, st.extent, iota)
        return st._replace(symbols=sym, weights=w, extent=st.n, dirty=jnp.asarray(0, jnp.int32))

    return lax.cond(state.dirty > 0, final_compact, lambda s: s, state)


train_batch_jit = jax.jit(train_batch, donate_argnums=(0,))


def _pack_summary(st: TrainState) -> jax.Array:
    """Merge log + batch scalars packed into ONE u32 array: the host's
    entire per-batch readback (each separate device->host read pays the
    full link latency — ~29 ms on the axon tunnel)."""
    scalars = jnp.stack(
        [st.duals, st.merges_done, st.n, st.early_stop.astype(jnp.int32), st.recounts]
    ).astype(_U32)
    return jnp.concatenate([st.merge_log.reshape(-1), scalars])


def train_batch_with_summary(
    state: TrainState, batch_merges: jax.Array, recount_budget: jax.Array
):
    """``train_batch`` + the packed host summary in the SAME dispatch (a
    separate jitted summary call costs one more host->device command per
    batch on a high-latency link)."""
    st = train_batch(state, batch_merges, recount_budget)
    return st, _pack_summary(st)


train_batch_summary_jit = jax.jit(train_batch_with_summary, donate_argnums=(0,))
