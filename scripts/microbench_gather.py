"""Device rates for the ops that could replace the level-1 stab sort-join
(real TPU): XLA gather (jnp.take) from small tables, a manual lexicographic
binary search (fori loop of gathers), jnp.searchsorted variants, and the
current 3-operand sort for comparison.

The decision this feeds: tokenize's level-1 join sorts n+2V rows per pass.
The vocab side is static, so rank-in-vocab (binary search) + a per-gap
precomputed state table would replace both sorts and the [depths, m]
overlay scan — IF gather throughput beats sort throughput at n ~ 16M.

Usage: python scripts/microbench_gather.py [--n 16777216] [--v 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


def timed(fn, *args, reps=(2, 6)):
    out = fn(*args)
    sync(out)
    ts = []
    for k in reps:
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (reps[1] - reps[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 24)
    ap.add_argument("--v", type=int, default=1 << 14)
    args = ap.parse_args()

    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    n, v = args.n, args.v
    rng = np.random.default_rng(0)
    table = jnp.asarray(np.sort(rng.integers(0, 1 << 31, v, np.int64)).astype(np.uint32))
    table2 = jnp.asarray(rng.integers(0, 1 << 31, v, np.int64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, v, n, np.int64).astype(np.int32))
    probes = jnp.asarray(rng.integers(0, 1 << 31, n, np.int64).astype(np.uint32))

    def report(name, secs):
        print(json.dumps({"op": name, "ms": round(secs * 1e3, 2),
                          "melem_per_sec": round(n / secs / 1e6, 1)}), flush=True)

    # 1. plain gather: n indices into a [v] u32 table
    report("take_u32", timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, idx))

    # 1b. gather of a [v, 2] row table (two words per hit)
    trows = jnp.stack([table, table2], axis=1)
    report("take_rows2", timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), trows, idx))

    # 2. manual binary search: log2(v) rounds, 1 gather per round
    k = (v - 1).bit_length()

    @jax.jit
    def bsearch1(t, p):
        lo = jnp.zeros(p.shape, jnp.int32)
        hi = jnp.full(p.shape, v, jnp.int32)

        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi) >> 1
            e = jnp.take(t, mid, axis=0)
            lt = e <= p
            return jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid)

        lo, hi = lax.fori_loop(0, k, body, (lo, hi))
        return lo

    report(f"bsearch_{k}r_1word", timed(bsearch1, table, probes))

    # 2b. lexicographic 2-word binary search (the real level-1 key)
    @jax.jit
    def bsearch2(t0, t1, p0, p1):
        lo = jnp.zeros(p0.shape, jnp.int32)
        hi = jnp.full(p0.shape, v, jnp.int32)

        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi) >> 1
            e0 = jnp.take(t0, mid, axis=0)
            e1 = jnp.take(t1, mid, axis=0)
            lt = (e0 < p0) | ((e0 == p0) & (e1 <= p1))
            return jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid)

        lo, hi = lax.fori_loop(0, k, body, (lo, hi))
        return lo

    report(f"bsearch_{k}r_2word", timed(bsearch2, table, table2, probes, probes))

    # 3. jnp.searchsorted default
    report("searchsorted", timed(
        jax.jit(lambda t, p: jnp.searchsorted(t, p)), table, probes))

    # 4. the incumbent: 3-operand 3-key sort at n + 2v rows
    ow = jnp.concatenate([table, jnp.zeros(v, jnp.uint32)])

    @jax.jit
    def sort3(p):
        iota = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        k0 = jnp.concatenate([p, ow])
        k1 = jnp.concatenate([p, ow])
        kp = jnp.concatenate([iota, jnp.zeros(2 * v, jnp.uint32)])
        a, b, c = lax.sort((k0, k1, kp), num_keys=3)
        return a[0] + b[0] + c[0]

    report("sort3_3key", timed(sort3, probes))

    # 5. 1-key restore sort (3 operands) — the other full-n sort
    @jax.jit
    def sort1(p):
        a, b, c = lax.sort((p, p, p), num_keys=1)
        return a[0] + b[0] + c[0]

    report("sort1_3op", timed(sort1, probes))


if __name__ == "__main__":
    main()
