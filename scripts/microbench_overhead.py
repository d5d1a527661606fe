"""Decompose the certified merge iteration's fixed overhead on the real chip.

The phase profile (profile_train.py) showed kernel ~38 µs + count pass
~24 µs but train_batch ~166 µs/merge at the 16 MB depth-1024 state — ~100 µs
of per-iteration cost is unexplained. The two hypotheses:

  H1. ``lax.cond`` with multi-MB operands (the full symbol/weight arrays
      are captured by the rare branches: full_recount, dense_fallback,
      do_stop) pays per-iteration HBM copies on TPU even when the cheap
      branch is taken.
  H2. The winner/window scalar logic (many small fusions) dominates.

Measures, via chained ``fori_loop`` marginals (cancels the ~29 ms tunnel
sync):

  base        carry [cap] arrays through a loop with one elementwise touch
  cond_big    base + one data-dependent cond whose branches consume the
              big arrays (both branches cheap — isolates the cond cost)
  cond_big3   base + three such conds
  cond_small  base + one cond over scalars only
  window      the _one_merge winner/window logic alone (no kernel, no
              stream pass): candidate argmax + probe prep + state rebuild

    python scripts/microbench_overhead.py [--cap 524288] [--chain 256]
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
    ap.add_argument("--cap", type=int, default=1 << 19)
    ap.add_argument("--chain", type=int, default=256)
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

    cap = args.cap
    sym = jnp.arange(cap, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
    w = jnp.ones((cap,), jnp.int32)

    def timed(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = np.asarray(leaf.reshape(-1)[0]) if hasattr(leaf, "reshape") else leaf
        return time.perf_counter() - t0

    def marginal(fn_of_k, k1, k2, reps=5):
        fn_of_k(k1), fn_of_k(k2)  # warm/compile
        vals = []
        for _ in range(reps):
            t1, t2 = fn_of_k(k1), fn_of_k(k2)
            vals.append((t2 - t1) / (k2 - k1))
        return sorted(vals)[len(vals) // 2] * 1e6

    k = args.chain

    # ── base: carry the arrays, one elementwise touch per step ──
    @jax.jit
    def base(sym, w, kk):
        def body(i, c):
            s, ww = c
            return s + jnp.uint32(1), ww

        return lax.fori_loop(0, kk, body, (sym, w))

    base_us = marginal(lambda kk: timed(base, sym, w, kk), k, 3 * k)

    # ── cond with BIG operands, data-dependent predicate, cheap branches ──
    def make_cond_big(n_conds):
        @jax.jit
        def f(sym, w, kk):
            def body(i, c):
                s, ww = c
                pred = (s[0] & jnp.uint32(1)) == 0  # data-dependent
                for _ in range(n_conds):
                    s, ww = lax.cond(
                        pred,
                        lambda a, b: (a, b),
                        lambda a, b: (a + jnp.uint32(2), b),
                        s, ww,
                    )
                return s + jnp.uint32(1), ww

            return lax.fori_loop(0, kk, body, (sym, w))

        return f

    c1 = make_cond_big(1)
    c3 = make_cond_big(3)
    cond1_us = marginal(lambda kk: timed(c1, sym, w, kk), k, 3 * k)
    cond3_us = marginal(lambda kk: timed(c3, sym, w, kk), k, 3 * k)

    # ── write-through baseline vs the same write behind a (rarely taken)
    # identity cond: if equal, a cond whose taken branch produces the new
    # arrays anyway is free, and restructuring do_stop/do_merge buys nothing ──
    @jax.jit
    def wbase(sym, w, kk):
        def body(i, c):
            s, ww = c
            return s + jnp.uint32(2), ww + 1

        return lax.fori_loop(0, kk, body, (sym, w))

    wbase_us = marginal(lambda kk: timed(wbase, sym, w, kk), k, 3 * k)

    @jax.jit
    def wcond(sym, w, kk):
        def body(i, c):
            s, ww = c
            pred = s[0] > jnp.uint32(0xFFFFFFF0)  # data-dependent, never true
            return lax.cond(
                pred,
                lambda a, b: (a, b),  # identity (the do_stop shape)
                lambda a, b: (a + jnp.uint32(2), b + 1),  # the do_merge shape
                s, ww,
            )

        return lax.fori_loop(0, kk, body, (sym, w))

    wcond_us = marginal(lambda kk: timed(wcond, sym, w, kk), k, 3 * k)

    # ── big CAPTURED operands, small result (the certified/full_recount
    # and use_probes/dense_fallback shape): rare branch reduces the big
    # arrays, taken branch is scalar-cheap ──
    @jax.jit
    def copsmall(sym, w, kk):
        def body(i, c):
            s, ww, acc = c
            pred = acc < jnp.int32(0x7FFFFFF0)  # data-dependent, always true
            acc = lax.cond(
                pred,
                lambda: acc + 1,
                lambda: jnp.max(s).astype(jnp.int32) + jnp.max(ww),  # captures both
            )
            return s + jnp.uint32(1), ww, acc

        return lax.fori_loop(0, kk, body, (sym, w, jnp.int32(0)))

    cop_small_us = marginal(lambda kk: timed(copsmall, sym, w, kk), k, 3 * k)

    # ── cond over scalars only (big arrays NOT operands of the cond) ──
    @jax.jit
    def csmall(sym, w, kk):
        def body(i, c):
            s, ww, acc = c
            pred = (acc & jnp.int32(1)) == 0
            acc = lax.cond(pred, lambda a: a + 1, lambda a: a + 2, acc)
            return s + jnp.uint32(1), ww, acc

        return lax.fori_loop(0, kk, body, (sym, w, jnp.int32(0)))

    cond_small_us = marginal(lambda kk: timed(csmall, sym, w, kk), k, 3 * k)

    # ── window logic alone: candidate argmax + probe prep + log update ──
    from gpu_bpe_tpu.ops.train_step import K_CANDIDATES, S_CREATED

    KS = K_CANDIDATES + S_CREATED
    cand = jnp.arange(KS, dtype=jnp.uint32) + jnp.uint32(0x10001)
    counts = jnp.arange(KS, dtype=jnp.int32)
    logbuf = jnp.zeros((1024, 3), jnp.uint32)

    @jax.jit
    def window(cand, counts, logbuf, kk):
        def body(i, c):
            cand, counts, logbuf = c
            m = jnp.max(counts)
            winner = jnp.min(jnp.where(counts == m, cand, jnp.uint32(0xFFFFFFFF)))
            ca, cb = cand >> jnp.uint32(16), cand & jnp.uint32(0xFFFF)
            a = winner >> jnp.uint32(16)
            b = winner & jnp.uint32(0xFFFF)
            affected = (counts >= 0) & ((cb == a) | (ca == b)) & (cand != winner)
            n_aff = jnp.sum(affected.astype(jnp.int32))
            keys = jnp.where(affected, jnp.uint32(0), jnp.uint32(1))
            _, aff_sorted = lax.sort((keys, cand), num_keys=1)
            probes = jnp.where(
                lax.broadcasted_iota(jnp.int32, (16,), 0) < n_aff,
                aff_sorted[:16],
                jnp.uint32(1),
            )
            counts = jnp.where(cand == winner, -1, counts) + probes[0].astype(jnp.int32)
            logbuf = lax.dynamic_update_slice(
                logbuf,
                jnp.stack([winner, jnp.uint32(i), jnp.uint32(0)])[None, :],
                (i % 1024, 0),
            )
            return cand, counts, logbuf

        return lax.fori_loop(0, kk, body, (cand, counts, logbuf))

    window_us = marginal(lambda kk: timed(window, cand, counts, logbuf, kk), k, 3 * k)

    report = {
        "device": str(jax.devices()[0]),
        "cap": cap,
        "base_us": round(base_us, 1),
        "write_base_us": round(wbase_us, 1),
        "write_cond_us": round(wcond_us, 1),
        "cond_captured_smallres_us": round(cop_small_us, 1),
        "cond_big1_us": round(cond1_us, 1),
        "cond_big3_us": round(cond3_us, 1),
        "cond_small_us": round(cond_small_us, 1),
        "window_logic_us": round(window_us, 1),
        "cond_big_marginal_us": round((cond3_us - cond1_us) / 2, 1),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
