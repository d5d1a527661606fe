"""Extract the reference decoder.wasm's UTS #39 confusables table.

The reference (/root/reference/src/wasm/decoder.wasm) embeds its confusable
data as an open-addressed hash table of 16384 slots x 12 bytes
{key_cp u32, prototype_first_cp u32, (len<<16)|pool_offset u32} located by
tracing `decoder_is_confusable` loads (scripts/wasm_vm.py trace_loads hook).
Multi-char prototype continuation pools are dead-stripped from the binary
(no exported function reads them — verified: `decoder_check_confusables`
compares equal-length strings positionwise on the FIRST prototype cp only,
and no u16/u32 rendering of any multi-char prototype, e.g. "oe" for U+0153,
exists anywhere in linear memory).

Every extracted entry is verified against the live oracle:
`decoder_is_confusable(key, proto) == 1`.

Writes gpu_bpe_tpu/unicode/data/ref_confusables.json, the generation input
for the native tables (unicode/cpp/gen_tables.py) and the pure-Python
fallback.

    python scripts/extract_confusables.py
"""

from __future__ import annotations

import json
import random
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import wasm_vm  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "gpu_bpe_tpu/unicode/data/ref_confusables.json"
SLOTS = 16384
STRIDE = 12


def main() -> None:
    d = wasm_vm.RefDecoder()

    # locate the table by tracing entry loads for a spread of codepoints
    loads: list[int] = []
    d.inst.trace_loads = lambda a, w: loads.append(a)
    random.seed(2)
    probes = list(range(0x20, 0x500)) + [random.randrange(0x500, 0x110000) for _ in range(2500)]
    header: set[int] = set()
    entry_addrs: list[int] = []
    for cp in probes:
        loads.clear()
        d.c("decoder_is_confusable", cp, 0x20)
        if not header:
            # the first three distinct loads are the table header (count, slots, shift)
            header = set(loads[:3])
        ent = [a for a in loads if a not in header]
        if ent:
            entry_addrs.append(ent[0])
    d.inst.trace_loads = None
    lo, hi = min(entry_addrs), max(entry_addrs)
    assert hi - lo <= SLOTS * STRIDE, "probed span exceeds one table"
    # probes bound the table loosely (min/max observed slots); widen to a
    # full table length on BOTH sides of the observed span — every scanned
    # candidate is oracle-verified below, so over-scanning is safe, while
    # under-scanning silently drops entries (caught in round 2: 13 entries
    # lived below the observed min)
    base = max(0, hi + STRIDE - SLOTS * STRIDE)
    base -= (base - entry_addrs[0]) % STRIDE
    end = min(len(d.inst.memory), lo + SLOTS * STRIDE)

    buf = bytes(d.inst.memory[base:end])
    cands: list[tuple[int, int, int, int]] = []
    for off in range(0, len(buf) - STRIDE + 1, STRIDE):
        k, v, t = struct.unpack_from("<III", buf, off)
        if k and v and k <= 0x10FFFF and v <= 0x10FFFF:
            cands.append((k, v, t, base + off))

    # verify every candidate by TRACING the oracle's own lookup: the open-
    # addressing probe sequence for key k must READ the scanned record's
    # address (collided keys land after several probes, so match anywhere
    # in the sequence).  Value-level checks alone could admit garbage
    # records from adjacent memory that happen to decode as plausible
    # pairs; an address that the lookup itself touches cannot be garbage
    # unless it is also a probed slot — and then the k==key comparison
    # inside the wasm already validated it.
    verified = {}
    rejected = 0
    for k, v, t, addr in sorted(cands):
        if str(k) in verified:
            continue
        # trace is_confusable(k, k): BOTH lookups probe key k, so every
        # entry load in the trace belongs to k's probe sequence
        loads.clear()
        d.inst.trace_loads = lambda a, w: loads.append(a)
        d.c("decoder_is_confusable", k, k)
        d.inst.trace_loads = None
        k_probes = [a for a in loads if a not in header]
        if addr in k_probes and d.c("decoder_is_confusable", k, v) == 1:
            verified[str(k)] = [v, (t >> 16) if t else 1]
        else:
            rejected += 1
    print(f"scan window {base:#x}..{end:#x}; {len(cands)} candidates, "
          f"{rejected} rejected by trace verification")

    data = {
        "source": "extracted from /root/reference/src/wasm/decoder.wasm confusables hash "
                  f"table ({SLOTS} slots x {STRIDE}B at {base:#x}) via scripts/wasm_vm.py + "
                  "scripts/extract_confusables.py; every entry verified against "
                  "decoder_is_confusable oracle",
        "note": "value = [prototype first codepoint, prototype length]. Multi-char prototype "
                "continuations are dead-stripped from the reference binary (no export reads "
                "them); observable reference behavior uses only the first prototype codepoint.",
        "entries": verified,
    }
    OUT.write_text(json.dumps(data, indent=0))
    print(f"extracted {len(verified)} verified entries -> {OUT}")


if __name__ == "__main__":
    main()
