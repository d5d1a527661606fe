"""Exhaustive property sweep of the reference decoder.wasm (conformance oracle).

Runs the reference's Unicode 17.0 engine (via scripts/wasm_vm.py) over the
full repertoire 0..0x10FFFF and records, per codepoint:

  tier 1 (full sweep, one .npz chunk per 64K plane slice):
    category, script, combining class, simple case mappings (upper/lower/
    title/fold), canonical decomposition (decoder_decompose, up to 4 cps),
    identifier start/continue, is_suspicious([cp]), and a flag word packing
    the property-table booleans (assigned, alphabetic, numeric, whitespace,
    control, uppercase, lowercase).

The output (/root/repo/docs/artifacts/oracle_sweep/*.npz) is the ground
truth for docs/CONFORMANCE.md's Unicode-parity claims: our native tables
(gpu_bpe_tpu/unicode/cpp) are diffed against it by
tests/test_unicode_oracle_parity.py and scripts/diff_unicode_parity.py.

Resume-able: existing chunk files are skipped.  ~1h in the pure-Python
interpreter at ~6k calls/s.

    python scripts/sweep_oracle.py [--out DIR] [--start N] [--stop N]
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import wasm_vm  # noqa: E402

CHUNK = 0x10000
TOP = 0x110000

# (field name, C function) — one i32 in, one i32 out
SIMPLE = [
    ("category", "decoder_get_category"),
    ("script", "decoder_get_script"),
    ("ccc", "decoder_get_combining_class"),
    ("upper", "decoder_to_upper"),
    ("lower", "decoder_to_lower"),
    ("title", "decoder_to_title"),
    ("fold", "decoder_case_fold"),
]
# boolean predicates packed into the flags word, bit order matters
FLAG_FUNCS = [
    "decoder_is_assigned",
    "decoder_is_alphabetic",
    "decoder_is_numeric",
    "decoder_is_whitespace",
    "decoder_is_control",
    "decoder_is_uppercase",
    "decoder_is_lowercase",
    "decoder_is_titlecase",
    "decoder_is_identifier_start",
    "decoder_is_identifier_continue",
    "decoder_is_letter",
    "decoder_is_digit",
    "decoder_is_number",
    "decoder_is_punctuation",
    "decoder_is_symbol",
    "decoder_is_mark",
]


def sweep_chunk(d: wasm_vm.RefDecoder, base: int, scratch: tuple) -> dict:
    n = min(CHUNK, TOP - base)
    out = {name: np.zeros(n, dtype=np.int32) for name, _ in SIMPLE}
    out["flags"] = np.zeros(n, dtype=np.uint32)
    out["suspicious"] = np.zeros(n, dtype=np.uint8)
    out["decomp"] = np.zeros((n, 4), dtype=np.int32)
    out["decomp_len"] = np.zeros(n, dtype=np.int8)
    pbuf, pone = scratch
    mem = d.inst.memory
    call = d.c
    for i in range(n):
        cp = base + i
        for name, fn in SIMPLE:
            out[name][i] = call(fn, cp)
        f = 0
        for bit, fn in enumerate(FLAG_FUNCS):
            if call(fn, cp):
                f |= 1 << bit
        out["flags"][i] = f
        # canonical decomposition: decompose(cp, out*, cap) -> count
        cnt = call("decoder_decompose", cp, pbuf, 8)
        out["decomp_len"][i] = min(cnt, 4)
        for k in range(min(cnt, 4)):
            out["decomp"][i, k] = struct.unpack_from("<I", mem, pbuf + 4 * k)[0]
        # is_suspicious on the single-cp string
        mem[pone:pone + 4] = struct.pack("<I", cp)
        out["suspicious"][i] = call("decoder_is_suspicious", pone, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/docs/artifacts/oracle_sweep")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--stop", type=int, default=TOP)
    args = ap.parse_args()
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    d = wasm_vm.RefDecoder()
    pbuf = d.malloc(64)
    pone = d.malloc(8)
    t0 = time.time()
    for base in range(args.start, args.stop, CHUNK):
        path = outdir / f"chunk_{base:06x}.npz"
        if path.exists():
            continue
        t1 = time.time()
        data = sweep_chunk(d, base, (pbuf, pone))
        tmp = str(path) + ".tmp.npz"
        np.savez_compressed(tmp, **data)
        os.replace(tmp, path)
        print(f"chunk {base:#08x} done in {time.time() - t1:.0f}s "
              f"(total {time.time() - t0:.0f}s)", flush=True)
    print("sweep complete")


if __name__ == "__main__":
    main()
