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
* compaction     — stable sort by keep-flagged position (the TPU-fast
  equivalent of the scan+scatter pipeline).

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


class TrainState(NamedTuple):
    """Device-side iteration state (the reference's IterState, train.wgsl:45-58)."""

    symbols: jax.Array  # u32 [CAP] — tok | word-start bit; 0 past n
    weights: jax.Array  # i32 [CAP] — word frequency per position
    n: jax.Array  # i32 scalar — valid symbol count
    next_id: jax.Array  # u32 scalar — next token id to assign
    early_stop: jax.Array  # bool scalar
    merges_done: jax.Array  # i32 scalar — merges done this batch
    merge_log: jax.Array  # u32 [BATCH_MERGES, 3] — (pair, new_id, count)


def init_state(symbols: jax.Array, weights: jax.Array, n, next_id) -> TrainState:
    return TrainState(
        symbols=jnp.asarray(symbols, _U32),
        weights=jnp.asarray(weights, jnp.int32),
        n=jnp.asarray(n, jnp.int32),
        next_id=jnp.asarray(next_id, _U32),
        early_stop=jnp.asarray(False),
        merges_done=jnp.asarray(0, jnp.int32),
        merge_log=jnp.zeros((BATCH_MERGES, 3), _U32),
    )


def _pair_ids(symbols: jax.Array, n: jax.Array, iota: jax.Array):
    """Masked packed pair ids for every adjacent position.

    Pair (i, i+1) counts unless: i+1 >= n, the second symbol starts a word,
    or either token id is 0 (train.wgsl:393-399).
    """
    tok = symbols & _TOKEN_MASK
    nxt = jnp.roll(symbols, -1)
    nxt_tok = nxt & _TOKEN_MASK
    valid = (
        (iota < n - 1)
        & ((nxt & _WS_BIT) == 0)
        & (tok != 0)
        & (nxt_tok != 0)
    )
    pair = jnp.where(valid, (tok << _U32(16)) | nxt_tok, _U32(0))
    return pair, valid


def find_best_pair(symbols: jax.Array, weights: jax.Array, n: jax.Array):
    """Exact weighted argmax pair via sort + segmented totals.

    Returns (pair_id u32, count i32). pair_id 0 / count 0 when no pairs.
    """
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pair, valid = _pair_ids(symbols, n, iota)
    w = jnp.where(valid, weights, 0)

    sp, sw = lax.sort((pair, w), num_keys=1)
    # Run ends: last element of each equal-pair run.
    is_end = jnp.concatenate([sp[:-1] != sp[1:], jnp.ones((1,), bool)])
    csum = jnp.cumsum(sw, dtype=jnp.int32)
    # Exclusive cumsum at the previous run end — monotone, so cummax works.
    end_csum = jnp.where(is_end, csum, 0)
    prev_end = jnp.concatenate([jnp.zeros((1,), jnp.int32), lax.cummax(end_csum)[:-1]])
    run_total = jnp.where(is_end & (sp != 0), csum - prev_end, 0)

    best_count = jnp.max(run_total)
    best_pair = jnp.min(jnp.where((run_total == best_count) & (sp != 0), sp, _INVALID))
    best_pair = jnp.where(best_count > 0, best_pair, _U32(0))
    return best_pair, best_count


def apply_merge_device(symbols, weights, n, pair, new_id):
    """One merge + compaction; exact reference semantics (train.wgsl:433-520)."""
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    tok = symbols & _TOKEN_MASK
    ws = symbols & _WS_BIT
    nxt = jnp.roll(symbols, -1)
    a = pair >> _U32(16)
    b = pair & _TOKEN_MASK

    sites = (
        (iota < n - 1)
        & (tok == a)
        & ((nxt & _TOKEN_MASK) == b)
        & ((nxt & _WS_BIT) == 0)
    )
    merged = jnp.where(sites, new_id | ws, symbols)
    removed = jnp.concatenate([jnp.zeros((1,), bool), sites[:-1]])

    # Stable left-pack: sort by (removed, position) carrying symbol + weight.
    key = jnp.where(removed, _U32(cap) + iota.astype(_U32), iota.astype(_U32))
    _, sym_c, w_c = lax.sort((key, merged, weights), num_keys=1)
    n_new = n - jnp.sum(removed, dtype=jnp.int32)
    sym_c = jnp.where(iota < n_new, sym_c, _U32(0))
    w_c = jnp.where(iota < n_new, w_c, 0)
    return sym_c, w_c, n_new


def _one_merge(state: TrainState) -> TrainState:
    pair, count = find_best_pair(state.symbols, state.weights, state.n)
    stop = (count < 2) | (state.next_id > _TOKEN_MASK)

    def do_merge(st: TrainState) -> TrainState:
        sym, w, n = apply_merge_device(st.symbols, st.weights, st.n, pair, st.next_id)
        log = lax.dynamic_update_slice(
            st.merge_log,
            jnp.stack([pair, st.next_id, count.astype(_U32)])[None, :],
            (st.merges_done, 0),
        )
        return TrainState(
            symbols=sym,
            weights=w,
            n=n,
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
    """
    state = state._replace(merges_done=jnp.asarray(0, jnp.int32))

    def cond(st: TrainState):
        return (st.merges_done < batch_merges) & ~st.early_stop

    return lax.while_loop(cond, _one_merge, state)


train_batch_jit = jax.jit(train_batch, donate_argnums=(0,))
