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

* pair counting  — one ``lax.sort`` of (pair_id, weight) + segmented run
  totals via cumsum/cummax scans (no scatter: TPU has no fast scatter).
* winner         — two-pass reduction: max count, then min pair id among
  ties. Identical deterministic ordering to ``is_better``
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
from jax import lax

from ..constants import BATCH_MERGES, TOKEN_MASK, WORD_START_BIT

_U32 = jnp.uint32
_TOKEN_MASK = jnp.uint32(TOKEN_MASK)
_WS_BIT = jnp.uint32(WORD_START_BIT)
_INVALID = jnp.uint32(0xFFFFFFFF)
_HOLE = jnp.uint32(0xFFFFFFFF)  # removed-symbol sentinel (never a valid symbol)

# Merges between real compactions. Hole runs are bounded by the number of
# merges since the last compaction, so lookahead depth == COMPACT_EVERY.
COMPACT_EVERY = 8


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


def _best_of_runs(sp: jax.Array, sw: jax.Array):
    """Winner over a sorted pair stream: (pair, count) with the reference
    tie-break (count desc, pair asc)."""
    is_end = jnp.concatenate([sp[:-1] != sp[1:], jnp.ones((1,), bool)])
    csum = jnp.cumsum(sw, dtype=jnp.int32)
    end_csum = jnp.where(is_end, csum, 0)
    prev_end = jnp.concatenate([jnp.zeros((1,), jnp.int32), lax.cummax(end_csum)[:-1]])
    run_total = jnp.where(is_end & (sp != 0), csum - prev_end, 0)
    best_count = jnp.max(run_total)
    best_pair = jnp.min(jnp.where((run_total == best_count) & (sp != 0), sp, _INVALID))
    best_pair = jnp.where(best_count > 0, best_pair, _U32(0))
    return best_pair, best_count


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


def _one_merge(state: TrainState) -> TrainState:
    cap = state.symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    lookahead = COMPACT_EVERY

    pair, w, nxt = _masked_pairs(state.symbols, state.weights, state.extent, iota, lookahead)
    sp, sw = lax.sort((pair, w), num_keys=1)
    best_pair, count = _best_of_runs(sp, sw)
    stop = (count < 2) | (state.next_id > _TOKEN_MASK)

    def do_merge(st: TrainState) -> TrainState:
        tok = st.symbols & _TOKEN_MASK
        ws = st.symbols & _WS_BIT
        a = best_pair >> _U32(16)
        b = best_pair & _TOKEN_MASK
        valid = st.symbols != _HOLE
        nxt_tok = nxt & _TOKEN_MASK

        # A-side: position i whose next-valid matches (a,b) — rewrite to Z.
        sites = (
            valid
            & (iota < st.extent - 1)
            & (nxt != _HOLE)
            & (tok == a)
            & (nxt_tok == b)
            & ((nxt & _WS_BIT) == 0)
        )
        # B-side: position j whose prev-valid is the A of the pair — remove.
        prv = _prev_valid(st.symbols, lookahead)
        removed = (
            valid
            & (iota > 0)
            & (tok == b)
            & ((st.symbols & _WS_BIT) == 0)
            & (prv != _HOLE)
            & ((prv & _TOKEN_MASK) == a)
        )
        # prev-valid wrap-around guard: position 0 has no predecessor and the
        # roll could alias the array tail; (iota > 0) plus zero-padding past
        # extent keeps this exact.
        merged = jnp.where(sites, st.next_id | ws, st.symbols)
        merged = jnp.where(removed, _HOLE, merged)
        n_new = st.n - jnp.sum(removed, dtype=jnp.int32)

        log = lax.dynamic_update_slice(
            st.merge_log,
            jnp.stack([best_pair, st.next_id, count.astype(_U32)])[None, :],
            (st.merges_done, 0),
        )

        dirty = st.dirty + 1

        # Hole runs grow by more than 1 per merge when occurrences overlap
        # (e.g. "aaaa" under (a,a) removes adjacent symbols); compact as soon
        # as any run would exceed the next-valid lookahead.
        is_hole = merged == _HOLE
        last_valid = lax.cummax(jnp.where(~is_hole, iota, -1))
        max_run = jnp.max(jnp.where(is_hole & (iota < st.extent), iota - last_valid, 0))

        def with_compact(args):
            sym, wts = _compact(args[0], args[1], n_new, st.extent, iota)
            return sym, wts, n_new, jnp.asarray(0, jnp.int32)

        def no_compact(args):
            return args[0], args[1], st.extent, dirty

        sym2, w2, extent2, dirty2 = lax.cond(
            (dirty >= COMPACT_EVERY) | (max_run > lookahead),
            with_compact,
            no_compact,
            (merged, st.weights),
        )
        return TrainState(
            symbols=sym2,
            weights=w2,
            n=n_new,
            extent=extent2,
            dirty=dirty2,
            next_id=st.next_id + _U32(1),
            early_stop=st.early_stop,
            merges_done=st.merges_done + 1,
            merge_log=log,
        )

    def do_stop(st: TrainState) -> TrainState:
        return st._replace(early_stop=jnp.asarray(True))

    return lax.cond(stop, do_stop, do_merge, state)


def train_batch(state: TrainState, batch_merges: jax.Array) -> TrainState:
    """Run up to ``batch_merges`` merges on device with early stopping.

    Equivalent of encodeBatch + the GPU-driven IterState loop
    (training-pipeline.js:178-233): zero host round trips inside the batch.
    Ends with a compaction so the host sees a hole-free prefix (capacity
    shrinking and checkpoint replay rely on it).
    """
    state = state._replace(merges_done=jnp.asarray(0, jnp.int32))

    def cond(st: TrainState):
        return (st.merges_done < batch_merges) & ~st.early_stop

    state = lax.while_loop(cond, _one_merge, state)

    def final_compact(st: TrainState) -> TrainState:
        cap = st.symbols.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        sym, w = _compact(st.symbols, st.weights, st.n, st.extent, iota)
        return st._replace(symbols=sym, weights=w, extent=st.n, dirty=jnp.asarray(0, jnp.int32))

    return lax.cond(state.dirty > 0, final_compact, lambda s: s, state)


train_batch_jit = jax.jit(train_batch, donate_argnums=(0,))
