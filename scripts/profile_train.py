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

    def marginal(fn_of_k, k1, k2, reps=3):
        """Median over reps of (t(k2)-t(k1))/(k2-k1): cancels the fixed
        dispatch+sync cost (~29 ms on this tunnel), which would otherwise
        dominate any single-call measurement."""
        fn_of_k(k1), fn_of_k(k2)  # warm
        vals = []
        for _ in range(reps):
            t1, t2 = fn_of_k(k1), fn_of_k(k2)
            vals.append((t2 - t1) / (k2 - k1))
        return sorted(vals)[len(vals) // 2] * 1e6

    # ── A: kernel chain over real merges at depth ──
    k = args.chain
    a_us = marginal(lambda kk: timed(replay, sym, w, n, depth, depth + kk),
                    k, 2 * k if depth + 2 * k <= n_m else k + 1)

    # ── B: maintained-count update chain at each tier width ──
    cap = sym0.shape[0]

    def count_chain(width):
        # stream perturbed per step (defeats loop-invariant hoisting of
        # _masked_pairs — the production pass runs on a fresh stream every
        # merge), probes dependent on acc (defeats CSE)
        @jax.jit
        def chain(sym, w, n, seed, kk):
            iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)

            def body(i, carry):
                sym, acc = carry
                sym = sym.at[i % 64].set(sym[i % 64])
                pair2, w2m, _ = _masked_pairs(sym, w, n, iota, 0)
                base = (acc & _U32(0xFFFF)) | (jnp.uint32(i) << _U32(16))
                lst = base + lax.broadcasted_iota(jnp.uint32, (width + 2,), 0)
                eq = lst[:, None] == pair2[None, :]
                cnt = jnp.sum(jnp.where(eq, w2m[None, :], 0), axis=1)
                return sym, acc + cnt.astype(jnp.uint32)[0]

            return lax.fori_loop(0, kk, body, (sym, seed))[1]

        return marginal(
            lambda kk: timed(chain, sym, w, n, jnp.uint32(1), kk), k, 3 * k
        )

    b_fast_us = count_chain(A_FAST)
    b_full_us = count_chain(A_AFFECTED)

    # ── D/E/F: fused-iteration constituents (round-5: attribute the gap
    # between the ~40 us kernel and the ~313 us wall at HEAD) ──
    from gpu_bpe_tpu.ops.pallas_kernels import (
        N_PROBES, W_SLOTS, count_pairs2, window_post,
    )
    from gpu_bpe_tpu.constants import BATCH_MERGES

    @jax.jit
    def cp2_chain(sym, w, n, kk):
        def body(i, acc):
            l_slot = (_U32(300) << _U32(16)) | (_U32(257) + acc[0])
            r_slot = (_U32(301) << _U32(16)) | (_U32(258) + acc[0])
            c = count_pairs2(sym, w, n, l_slot, r_slot, interpret=interp)
            return (c[0].astype(_U32) & _U32(1), acc[1] + c[1])
        return lax.fori_loop(0, kk, body, (jnp.uint32(0), jnp.int32(0)))[1]

    d_us = marginal(lambda kk: timed(cp2_chain, sym, w, n, kk), k, 3 * k)

    @jax.jit
    def wpost_chain(kk):
        cand0 = jnp.full((W_SLOTS,), 0xFFFFFFFF, _U32)
        cnts0 = jnp.full((W_SLOTS,), -1, jnp.int32)
        binz = jnp.zeros((16, 16), jnp.float32)
        log0 = jnp.zeros((BATCH_MERGES * 3,), _U32)
        probes0 = jnp.zeros((N_PROBES,), jnp.int32)

        def body(i, carry):
            cand, cnts = carry
            cand2, cnts2, _log, sc = window_post(
                cand, cnts, binz, binz, log0,
                pair=_U32(0), count=jnp.int32(5), next_id=_U32(300) + jnp.uint32(i),
                theta=jnp.int32(3), ub_new=jnp.int32(2), fill=jnp.int32(4),
                merges_done=jnp.int32(0), active=jnp.asarray(False),
                early_stop=jnp.asarray(False), use_probes=jnp.asarray(True),
                n_aff=jnp.int32(0), c_l=jnp.int32(0), c_r=jnp.int32(0),
                l_ok=jnp.asarray(False), r_ok=jnp.asarray(False),
                l_tok=_U32(1), r_tok=_U32(1), has_room=jnp.asarray(False),
                probes=probes0, pcnt=probes0, interpret=interp,
            )
            return cand2, cnts2
        return lax.fori_loop(0, kk, body, (cand0, cnts0))[1]

    e_us = marginal(lambda kk: timed(wpost_chain, kk), k, 3 * k)

    @jax.jit
    def rezero_chain(sym, w, n, kk):
        iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)

        def body(i, carry):
            s2, w2 = carry
            s2 = jnp.where(iota < n - (i & 1), s2, _U32(0))
            w2 = jnp.where(iota < n - (i & 1), w2, 0)
            return s2, w2
        out = lax.fori_loop(0, kk, body, (sym, w))
        return out[0][0] + out[1][0].astype(_U32)

    f_us = marginal(lambda kk: timed(rezero_chain, sym, w, n, kk), k, 3 * k)

    # ── C: ground truth — the real batch loop at depth, re-padded to the
    # trainer's power-of-two rung (the production capacity; an off-ladder
    # capacity both compiles fresh and mis-measures). Marginal between two
    # batch sizes cancels the fixed sync cost; sizes stay below the
    # collapse-stop horizon. ──
    from gpu_bpe_tpu.ops.train_step import train_batch

    rung = 1 << 15
    while rung < n_at:
        rung <<= 1
    sym_h = np.zeros(rung, np.uint32); sym_h[:n_at] = np.asarray(sym)[:n_at]
    w_h = np.zeros(rung, np.int32); w_h[:n_at] = np.asarray(w)[:n_at]
    sym_p = jnp.asarray(sym_h)
    w_p = jnp.asarray(w_h)
    tb = jax.jit(train_batch)

    def run_batch(kk):
        st = init_state(sym_p, w_p, n_at, 256 + depth)
        t0 = time.perf_counter()
        out = tb(st, jnp.asarray(kk, jnp.int32))
        done = int(out.merges_done)
        assert done == kk, f"batch stopped early ({done}/{kk}); lower --chain"
        return time.perf_counter() - t0

    c_us = marginal(run_batch, 16, 16 + k)

    report = {
        "device": str(jax.devices()[0]),
        "corpus_mb": args.mb,
        "depth": depth,
        "n_at_depth": n_at,
        "capacity": int(rung),
        "kernel_us_per_merge": round(a_us, 1),
        "count_update_fast_us": round(b_fast_us, 1),
        "count_update_full_us": round(b_full_us, 1),
        "count_pairs2_us": round(d_us, 1),
        "window_post_us": round(e_us, 1),
        "tail_rezero_us": round(f_us, 1),
        "train_batch_us_per_merge": round(c_us, 1),
        "batch_merges_done": 16 + k,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report), flush=True)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
