"""Measure the Pallas compare-exchange round cost on the real TPU.

Decides whether a custom in-VMEM segment bitonic sort can beat XLA's
lax.sort (measured 39.7 ms join / 34.7 ms restore at the 16 MB tokenize
pass). A bitonic sort of m=2^17 per segment is ~153 rounds; this kernel
runs R representative rounds (lane-stride partner exchange on 3 u32
arrays with a 3-word lexicographic compare — the worst-case round body)
over one [1024, 128] block per grid step and times it.

    python scripts/microbench_bitonic.py [--rounds 32] [--blocks 147]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=147)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, LANES = 1024, 128  # one 2^17-element segment
    R = args.rounds

    def kernel(a_ref, b_ref, c_ref, oa_ref, ob_ref, oc_ref):
        a, b, c = a_ref[:, :], b_ref[:, :], c_ref[:, :]
        MIN = jnp.int32(-(1 << 31))
        lane = lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        row = lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
        fi = row * LANES + lane
        for r in range(R):
            j = 1 << (r % 7)  # lane strides 1..64 (the common case)
            k = 1 << (7 + (r % 10))
            lo = (lane & j) == 0
            pa = jnp.where(lo, pltpu.roll(a, LANES - j, axis=1), pltpu.roll(a, j, axis=1))
            pb = jnp.where(lo, pltpu.roll(b, LANES - j, axis=1), pltpu.roll(b, j, axis=1))
            pc = jnp.where(lo, pltpu.roll(c, LANES - j, axis=1), pltpu.roll(c, j, axis=1))
            # biased signed compares == unsigned order (Mosaic has no maxui)
            sa, sb2 = a ^ MIN, pa ^ MIN
            ta, tb = b ^ MIN, pb ^ MIN
            ua, ub = c ^ MIN, pc ^ MIN
            e0 = sa == sb2
            e1 = ta == tb
            lt = (sa < sb2) | (e0 & ((ta < tb) | (e1 & (ua < ub))))
            eq = e0 & e1 & (ua == ub)
            gt = ~(lt | eq)
            asc = (fi & k) == 0
            x1 = asc ^ lo
            take = (x1 & lt) | (~x1 & gt)
            a = jnp.where(take, pa, a)
            b = jnp.where(take, pb, b)
            c = jnp.where(take, pc, c)
        oa_ref[:, :] = a
        ob_ref[:, :] = b
        oc_ref[:, :] = c

    grid = args.blocks
    shape = (grid * ROWS, LANES)
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))] * 3,
            out_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)] * 3,
        interpret=args.interpret,
    )
    fn = jax.jit(fn)

    rng = np.random.default_rng(0)
    arrs = [jnp.asarray(rng.integers(0, 1 << 31, size=shape, dtype=np.int64).astype(np.int32))
            for _ in range(3)]

    def sync(o):
        np.asarray(jax.device_get(o[0][0, :1]))

    out = fn(*arrs)
    sync(out)
    ts = []
    for kreps in (2, 6):
        t0 = time.perf_counter()
        for _ in range(kreps):
            out = fn(*arrs)
        sync(out)
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / 4
    elems = grid * ROWS * LANES
    per_round_elem_ns = dt / (R * elems) * 1e9
    total_sort_ms = per_round_elem_ns * 153 * elems / 1e6
    print(f"rounds={R} blocks={grid} dt={dt*1e3:.2f} ms "
          f"-> {per_round_elem_ns:.3f} ns/elem/round "
          f"-> est full 153-round sort of {elems/1e6:.1f}M elems: {total_sort_ms:.1f} ms")


if __name__ == "__main__":
    main()
