"""Range-compress reference property tables from the oracle sweep.

Emits gpu_bpe_tpu/unicode/data/ref_properties.json holding the reference
decoder.wasm's EXACT per-codepoint `script` and `category` assignments
(run-length ranges), taken from the exhaustive sweep
(docs/artifacts/oracle_sweep).  gen_tables.py consumes this so our
native library classifies identically to the reference's Unicode 17.0
tables — including its range-based script values over unassigned
codepoints, which feed `decoder_is_suspicious`'s mixed-script clause.

    python scripts/gen_ref_property_data.py
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
SWEEP = REPO / "docs/artifacts/oracle_sweep"
OUT = REPO / "gpu_bpe_tpu/unicode/data/ref_properties.json"
TOP = 0x110000


def rle(values: np.ndarray) -> list[list[int]]:
    """[[start, value], ...] runs (end implied by the next start)."""
    change = np.nonzero(np.diff(values))[0] + 1
    starts = np.concatenate([[0], change])
    return [[int(s), int(values[s])] for s in starts]


def flag_ranges(flags: np.ndarray, bit: int) -> list[list[int]]:
    """Inclusive [start, end] ranges where the given flag bit is set."""
    on = ((flags >> bit) & 1).astype(bool)
    edges = np.nonzero(np.diff(on.astype(np.int8)))[0] + 1
    bounds = np.concatenate([[0], edges, [len(on)]])
    out = []
    for i in range(len(bounds) - 1):
        if on[bounds[i]]:
            out.append([int(bounds[i]), int(bounds[i + 1] - 1)])
    return out


def main() -> None:
    chunks = sorted(SWEEP.glob("chunk_*.npz"))

    def field(name: str) -> np.ndarray:
        return np.concatenate([np.load(c)[name] for c in chunks])

    script = field("script")
    category = field("category")
    assert len(script) == TOP, f"sweep incomplete: {len(script):#x}"

    # simple case maps: store only cp -> mapped (mapped != cp)
    cases = {}
    cps = np.arange(TOP)
    for name in ("upper", "lower", "title", "fold"):
        arr = field(name)
        idx = np.nonzero(arr != cps)[0]
        cases[name] = [[int(cp), int(arr[cp])] for cp in idx]

    flags = field("flags")
    ident_start = flag_ranges(flags, 8)   # bit order: scripts/sweep_oracle.py
    ident_cont = flag_ranges(flags, 9)

    # single-level canonical decomposition (the reference's decoder_decompose)
    dlen = field("decomp_len")
    dseq = np.concatenate([np.load(c)["decomp"] for c in chunks])
    didx = np.nonzero(dlen > 0)[0]
    decomp = [[int(cp)] + [int(x) for x in dseq[cp, : dlen[cp]]] for cp in didx]

    data = {
        "source": "exhaustive per-codepoint sweep of the reference decoder.wasm "
                  "(scripts/sweep_oracle.py); script/category are run-length "
                  "[start, value] pairs (next start ends each run); case maps are "
                  "[cp, mapped] with identity omitted; identifier sets are "
                  "inclusive [start, end] ranges; decomp is [cp, seq...] "
                  "single-level canonical",
        "script": rle(script),
        "category": rle(category),
        "case": cases,
        "identifier_start": ident_start,
        "identifier_continue": ident_cont,
        "decomp": decomp,
    }
    OUT.write_text(json.dumps(data, indent=0))
    print(f"script runs: {len(data['script'])}, category runs: "
          f"{len(data['category'])}, case: "
          f"{ {k: len(v) for k, v in cases.items()} }, ident ranges: "
          f"{len(ident_start)}/{len(ident_cont)}, decomp: {len(decomp)} -> {OUT}")


if __name__ == "__main__":
    main()
