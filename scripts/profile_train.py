"""Per-phase timing of the merge iteration on the real chip.

Splits one certified merge into its two device phases and times each with
chained dispatches + a single scalar readback (block_until_ready is a
no-op on the axon tunnel; see CLAUDE.md):

  A. fused merge+compact+track Pallas kernel (merge_compact_tracked),
     chained over real merges replayed from a trained log
  B. maintained-count update (_masked_pairs + tiered [A, N] affected
     recount), chained with a data dependency at each tier width
  C. the full train_batch loop (ground truth: µs per applied merge)

The split directs optimization: if B ~ A, fusing the recount into the
kernel (or widening multi-merge iterations) is the next lever; if A
dominates, the kernel itself is.

    python scripts/profile_train.py [--mb 16] [--merges 2048] [--depth 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--merges", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=1024,
                    help="profile at the state AFTER this many merges")
    ap.add_argument("--chain", type=int, default=64,
                    help="merges per timed chained dispatch")
    ap.add_argument("--out", default="docs/artifacts/train_phases.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import synth_corpus
    from gpu_bpe_tpu.ops import TPUTrainer, make_stream, pad_stream
    from gpu_bpe_tpu.ops.train_step import (
        A_AFFECTED,
        A_FAST,
        _masked_pairs,
        _U32,
        init_state,
    )
    from gpu_bpe_tpu.pretok import PreTokenizer

    corpus = synth_corpus(args.mb << 20)
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize_bytes(corpus)
    stream = make_stream(data, starts, dedup=True)

    # full train for the merge log (also warms every compile rung)
    t0 = time.perf_counter()
    result = TPUTrainer().train_stream(stream, target_vocab_size=256 + args.merges)
    full_s = time.perf_counter() - t0
    merges = result.merges  # [(a, b, new_id)]
    n_m = len(merges)
    depth = min(args.depth, max(0, n_m - args.chain - 1))
    print(f"trained {n_m} merges in {full_s:.1f}s (warm rung)", flush=True)

    padded = pad_stream(stream, multiple=1024)
    log = np.array([[(a << 16) | b, z] for a, b, z in merges], np.uint32)
    log_dev = jnp.asarray(log)

    from gpu_bpe_tpu.ops.pallas_kernels import merge_compact_tracked

    interp = bool(args.cpu)  # Pallas on CPU only runs in interpret mode

    @jax.jit
    def replay(sym, w, n, lo, hi):
        def body(i, carry):
            sym, w, n = carry
            sym2, w2, n2, _bl, _br, _s = merge_compact_tracked(
                sym, w, n, log_dev[i, 0], log_dev[i, 1], interpret=interp
            )
            return sym2, w2, n2
        return lax.fori_loop(lo, hi, body, (sym, w, n))

    sym0 = jnp.asarray(padded.symbols)
    w0 = jnp.asarray(padded.weights)
    n0 = jnp.asarray(padded.n, jnp.int32)

    # state at depth (also compiles the replay chain)
    sym, w, n = replay(sym0, w0, n0, 0, depth)
    n_at = int(n)
    print(f"state at merge {depth}: n = {n_at}", flush=True)

    def timed(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        # force a scalar readback (the only reliable sync on this tunnel)
        jax.tree_util.tree_leaves(out)[-1].block_until_ready()
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = np.asarray(leaf.reshape(-1)[0]) if hasattr(leaf, "reshape") else leaf
        return time.perf_counter() - t0

    # ── A: kernel chain over real merges at depth ──
    k = args.chain
    timed(replay, sym, w, n, depth, depth + k)  # warm this rung
    t1 = timed(replay, sym, w, n, depth, depth + k)
    t2 = timed(replay, sym, w, n, depth, depth + 2 * k) if depth + 2 * k <= n_m else None
    a_us = ((t2 - t1) / k if t2 else t1 / k) * 1e6

    # ── B: maintained-count update chain at each tier width ──
    cap = sym0.shape[0]

    def count_chain(width):
        @jax.jit
        def chain(sym, w, n, seed):
            iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)

            def body(i, acc):
                pair2, w2m, _ = _masked_pairs(sym, w, n, iota, 0)
                # W probe pairs dependent on acc (defeats CSE across steps)
                base = (acc & _U32(0xFFFF)) | (jnp.uint32(i) << _U32(16))
                lst = base + lax.broadcasted_iota(jnp.uint32, (width + 2,), 0)
                eq = lst[:, None] == pair2[None, :]
                cnt = jnp.sum(jnp.where(eq, w2m[None, :], 0), axis=1)
                return acc + cnt.astype(jnp.uint32)[0]

            return lax.fori_loop(0, k, body, seed)

        chain(sym, w, n, jnp.uint32(1))  # compile + warm
        t1 = timed(chain, sym, w, n, jnp.uint32(1))
        return t1 / k * 1e6

    b_fast_us = count_chain(A_FAST)
    b_full_us = count_chain(A_AFFECTED)

    # ── C: ground truth — the real batch loop at depth. Re-pad to the
    # right capacity rung first: the device loop's collapse stop returns
    # early when n < capacity/2 (the trainer normally shrinks between
    # batches), which would make the batch measure 1 merge. ──
    from gpu_bpe_tpu.ops.ingest import SymbolStream
    from gpu_bpe_tpu.ops.train_step import train_batch

    sym_h, w_h = np.asarray(sym)[:n_at], np.asarray(w)[:n_at]
    repad = pad_stream(
        SymbolStream(sym_h, w_h, n_at, padded.total_bytes), multiple=1024
    )
    sym_p = jnp.asarray(repad.symbols)
    w_p = jnp.asarray(repad.weights)
    st = init_state(sym_p, w_p, repad.n, 256 + depth)
    tb = jax.jit(train_batch)
    out = tb(st, jnp.asarray(k, jnp.int32))  # compile + warm
    st2 = init_state(sym_p, w_p, repad.n, 256 + depth)
    t0 = time.perf_counter()
    out = tb(st2, jnp.asarray(k, jnp.int32))
    done = int(out.merges_done)
    c_us = (time.perf_counter() - t0) / max(1, done) * 1e6

    report = {
        "device": str(jax.devices()[0]),
        "corpus_mb": args.mb,
        "depth": depth,
        "n_at_depth": n_at,
        "capacity": int(cap),
        "kernel_us_per_merge": round(a_us, 1),
        "count_update_fast_us": round(b_fast_us, 1),
        "count_update_full_us": round(b_full_us, 1),
        "train_batch_us_per_merge": round(c_us, 1),
        "batch_merges_done": done,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report), flush=True)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
