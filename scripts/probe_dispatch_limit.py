"""Probe the axon worker's per-dispatch execution limit (10 GB crash suspect).

Runs a single jitted fori_loop of matmuls sized to a target wall time and
reports whether the dispatch survives. The 10 GB train's batch dispatches
crash at ~35 s while the same merges run fine split across dispatches —
this isolates pure dispatch DURATION from everything BPE-specific.

    python scripts/probe_dispatch_limit.py 10 20 30 40 50
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax


def main() -> None:
    targets = [float(a) for a in sys.argv[1:]] or [10.0, 20.0, 30.0, 40.0]
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n = 2048
    x = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def burn(x, iters):
        def body(_, x):
            y = x @ x
            # renormalize so values stay finite and XLA can't fold the loop
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-3).astype(x.dtype)

        return lax.fori_loop(0, iters, body, x)

    # calibrate: iterations/second of device time
    import numpy as np

    _ = np.asarray(burn(x, jnp.asarray(8, jnp.int32)))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(burn(x, jnp.asarray(256, jnp.int32)))
    per_iter = (time.perf_counter() - t0) / 256
    print(f"~{per_iter * 1e3:.2f} ms/iter", flush=True)

    for target in targets:
        iters = max(8, int(target / per_iter))
        t0 = time.perf_counter()
        try:
            _ = np.asarray(burn(x, jnp.asarray(iters, jnp.int32)))
            dt = time.perf_counter() - t0
            print(f"target {target:5.1f}s ({iters} iters): OK in {dt:.1f}s", flush=True)
        except Exception as e:
            dt = time.perf_counter() - t0
            print(f"target {target:5.1f}s ({iters} iters): CRASHED after {dt:.1f}s "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
            break


if __name__ == "__main__":
    main()
