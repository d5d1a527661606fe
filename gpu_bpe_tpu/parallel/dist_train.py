"""Multi-chip data-parallel BPE training (shard_map over a 1-D mesh).

Scaling design (SURVEY.md §2e / §5): the corpus — as a deduplicated
unique-word stream — is sharded across the ``data`` mesh axis with whole
words per shard (words never straddle shard boundaries, so merges need no
halo exchange). The merge decision must be a GLOBAL argmax over summed pair
counts; the naive approach (psum a 2^21 hash table every merge, the
reference's single-GPU structure) moves megabytes per merge over ICI. We
instead use an exact sparse protocol:

1. each shard computes its local distinct-pair run totals (sort + scans,
   same kernel as single-chip) and extracts its top-K (count desc, pair asc);
2. the K candidates per shard are all-gathered (K·D·8 bytes over ICI);
3. every shard computes its exact local count of every candidate (dense
   masked sums — no gather), and candidates are psum-reduced to exact
   global counts;
4. winner = argmax with the reference tie-break. A pair missing from every
   shard's top-K has global count ≤ Σ_d topk_min_d =: bound. If
   winner_count > bound the winner is provably the true global argmax;
   otherwise an exact fallback all-gathers the shard pair streams and
   recounts globally (rare: only when counts are nearly uniform).

Merges and compaction are purely shard-local. The merge log is replicated.
Determinism: the result is the true global (count desc, pair asc) argmax,
so the merge list is independent of shard count and layout — the same
guarantee the reference gets from its deterministic reductions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import BATCH_MERGES, TOKEN_MASK, WORD_START_BIT
from ..ops.train_step import _pair_ids  # shared masking rules

_U32 = jnp.uint32
_TOKEN_MASK = jnp.uint32(TOKEN_MASK)
_WS_BIT = jnp.uint32(WORD_START_BIT)
_INVALID = jnp.uint32(0xFFFFFFFF)

TOPK = 64  # candidates per shard per merge


class DistState(NamedTuple):
    symbols: jax.Array  # u32 [D, CAP/D] — sharded along axis 0
    weights: jax.Array  # i32 [D, CAP/D]
    n: jax.Array  # i32 [D] — valid count per shard
    next_id: jax.Array  # u32 scalar (replicated)
    early_stop: jax.Array  # bool scalar
    merges_done: jax.Array  # i32 scalar
    merge_log: jax.Array  # u32 [BATCH_MERGES, 3]


def _local_runs(symbols, weights, n):
    """Sorted pair stream + per-run totals (run end marked). Local to a shard."""
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pair, valid = _pair_ids(symbols, n, iota)
    w = jnp.where(valid, weights, 0)
    sp, sw = lax.sort((pair, w), num_keys=1)
    is_end = jnp.concatenate([sp[:-1] != sp[1:], jnp.ones((1,), bool)])
    csum = jnp.cumsum(sw, dtype=jnp.int32)
    end_csum = jnp.where(is_end, csum, 0)
    prev_end = jnp.concatenate([jnp.zeros((1,), jnp.int32), lax.cummax(end_csum)[:-1]])
    run_total = jnp.where(is_end & (sp != 0), csum - prev_end, 0)
    return sp, run_total


def _local_topk(sp, run_total):
    """Shard-local top-K distinct pairs by (count desc, pair asc)."""
    counts, idx = lax.top_k(run_total, TOPK)
    pairs = sp[idx]
    pairs = jnp.where(counts > 0, pairs, _INVALID)
    return pairs, counts


def _exact_candidate_counts(symbols, weights, n, cand_pairs):
    """Exact local counts of each candidate pair (dense masked sums)."""
    cap = symbols.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pair, valid = _pair_ids(symbols, n, iota)
    w = jnp.where(valid, weights, 0)
    # [CAP, C] equality — C = D*TOPK is small; tile over positions via reshape
    pos = pair.reshape(-1, 128)
    wts = w.reshape(-1, 128)
    eq = pos[..., None] == cand_pairs[None, None, :]
    return jnp.sum(jnp.where(eq, wts[..., None], 0), axis=(0, 1)).astype(jnp.int32)


def _apply_merge_local(symbols, weights, n, pair, new_id):
    """Shard-local merge + stable-sort compaction (same as single-chip)."""
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


def _global_best_pair(symbols, weights, n, axis: str):
    """Exact global (pair, count) winner across the mesh axis."""
    sp, run_total = _local_runs(symbols, weights, n)
    loc_pairs, loc_counts = _local_topk(sp, run_total)

    cand = lax.all_gather(loc_pairs, axis, tiled=True)  # [D*K]
    # dedupe candidates so ties resolve once (duplicates are harmless for
    # correctness but we keep them — counts are computed per slot identically)
    my_counts = _exact_candidate_counts(symbols, weights, n, cand)
    glob_counts = lax.psum(my_counts, axis)

    valid = cand != _INVALID
    best_count = jnp.max(jnp.where(valid, glob_counts, 0))
    best_pair = jnp.min(jnp.where(valid & (glob_counts == best_count), cand, _INVALID))
    best_pair = jnp.where(best_count > 0, best_pair, _U32(0))

    # Soundness bound: any pair outside every shard's top-K sums to at most
    # Σ_d (K-th best local count).
    kth = jnp.min(loc_counts)  # counts sorted desc → last is K-th best
    bound = lax.psum(kth, axis)
    provable = best_count > bound

    def fallback(_):
        # Exact global recount: gather all shards' pair streams and re-run the
        # run-total kernel over the concatenation. O(D·CAP) memory — only hit
        # when count mass is nearly uniform (tiny corpora or exhausted merges).
        all_sym = lax.all_gather(symbols, axis, tiled=True)
        all_w = lax.all_gather(weights, axis, tiled=True)
        # Rebuild per-shard masking: positions beyond each shard's n were
        # zeroed, and zero symbols never pair, so one concatenated pass is
        # exact — except the pair formed across shard edges, which is always
        # masked because every shard starts with a word-start symbol (or 0).
        n_tot = lax.psum(n, axis)
        sp2, rt2 = _local_runs(all_sym, all_w, jnp.asarray(all_sym.shape[0], jnp.int32))
        bc = jnp.max(rt2)
        bp = jnp.min(jnp.where(rt2 == bc, sp2, _INVALID))
        bp = jnp.where(bc > 0, bp, _U32(0))
        del n_tot
        return bp, bc

    def fast(_):
        return best_pair, best_count

    return lax.cond(provable, fast, fallback, None)


def make_dist_train_batch(mesh: Mesh, axis: str = "data"):
    """Build the sharded batched-merge step for a mesh."""

    def shard_step(symbols, weights, n, next_id, early_stop, merges_done, merge_log, batch_merges):
        # inside shard_map: symbols [CAP/D], n [1]
        n_loc = n[0]

        def one_merge(carry):
            sym, w, n_l, nid, stop, md, log = carry
            pair, count = _global_best_pair(sym, w, n_l, axis)
            do_stop = (count < 2) | (nid > _TOKEN_MASK)

            def merge_branch(args):
                sym, w, n_l, nid, md, log = args
                sym2, w2, n2 = _apply_merge_local(sym, w, n_l, pair, nid)
                log2 = lax.dynamic_update_slice(
                    log, jnp.stack([pair, nid, count.astype(_U32)])[None, :], (md, 0)
                )
                return sym2, w2, n2, nid + _U32(1), md + 1, log2

            def stop_branch(args):
                return args

            sym, w, n_l, nid, md, log = lax.cond(
                do_stop, stop_branch, merge_branch, (sym, w, n_l, nid, md, log)
            )
            return sym, w, n_l, nid, stop | do_stop, md, log

        def cond(carry):
            _, _, _, _, stop, md, _ = carry
            return (md < batch_merges) & ~stop

        sym, w, n_l, nid, stop, md, log = lax.while_loop(
            cond, one_merge, (symbols, weights, n_loc, next_id, early_stop, merges_done, merge_log)
        )
        return sym, w, n_l[None], nid, stop, md, log

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        check_vma=False,
    )

    def batch(state: DistState, batch_merges) -> DistState:
        state = state._replace(merges_done=jnp.asarray(0, jnp.int32))
        d = state.symbols.shape[0]
        out = sharded(
            state.symbols.reshape(-1),
            state.weights.reshape(-1),
            state.n,
            state.next_id,
            state.early_stop,
            state.merges_done,
            state.merge_log,
            batch_merges,
        )
        sym, w, n, nid, stop, md, log = out
        return DistState(
            symbols=sym.reshape(d, -1),
            weights=w.reshape(d, -1),
            n=n,
            next_id=nid,
            early_stop=stop,
            merges_done=md,
            merge_log=log,
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
    d = mesh.shape[axis]
    sym_sh = jax.device_put(jnp.asarray(symbols, _U32), NamedSharding(mesh, P(axis, None)))
    w_sh = jax.device_put(jnp.asarray(weights, jnp.int32), NamedSharding(mesh, P(axis, None)))
    return DistState(
        symbols=sym_sh,
        weights=w_sh,
        n=jax.device_put(jnp.asarray(n, jnp.int32), NamedSharding(mesh, P(axis))),
        next_id=jnp.asarray(next_id, _U32),
        early_stop=jnp.asarray(False),
        merges_done=jnp.asarray(0, jnp.int32),
        merge_log=jnp.zeros((BATCH_MERGES, 3), _U32),
    )
