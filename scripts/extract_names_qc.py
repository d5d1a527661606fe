"""Extract reference script names, block table, and quick-check data.

* script names: decoder_get_script_name(id) for every enum id
* blocks: decoder_get_block_name(cp) probed at 16-cp stride (block
  boundaries are 16-aligned); emitted as [start, name] runs
* quick check: decoder_quick_check([cp], form) for all cps x 4 forms,
  RLE-compressed (this is the slow part, ~30 min — skipped unless
  --qc is passed)

Appends to gpu_bpe_tpu/unicode/data/ref_properties.json.

    python scripts/extract_names_qc.py [--qc]
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import wasm_vm  # noqa: E402

DATA = REPO / "gpu_bpe_tpu/unicode/data/ref_properties.json"
TOP = 0x110000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qc", action="store_true")
    args = ap.parse_args()

    d = wasm_vm.RefDecoder()
    data = json.loads(DATA.read_text())

    names = []
    for sid in range(256):
        ptr = d.c("decoder_get_script_name", sid)
        names.append(d.inst.read_cstr(ptr).decode() if ptr else "")
    # out-of-range ids return a constant fallback; trim the uniform tail
    while len(names) > 2 and names[-1] == names[-2]:
        names.pop()
    names.pop()  # the first fallback occurrence itself
    data["script_names"] = names

    blocks: list[list] = []
    last_ptr = -1
    for cp in range(0, TOP, 16):
        ptr = d.c("decoder_get_block_name", cp)
        if ptr != last_ptr:
            s = d.inst.read_cstr(ptr).decode() if ptr else ""
            blocks.append([cp, s])
            last_ptr = ptr
    data["blocks"] = blocks

    if args.qc:
        buf = d.malloc(16)
        qc = {}
        for form in range(4):
            vals = []
            for cp in range(TOP):
                d.inst.memory[buf:buf + 4] = struct.pack("<I", cp)
                vals.append(d.c("decoder_quick_check", buf, 1, form))
            runs = []
            prev = None
            for cp, v in enumerate(vals):
                if v != prev:
                    runs.append([cp, v])
                    prev = v
            qc[str(form)] = runs
            print(f"form {form}: {len(runs)} runs", flush=True)
        data["quick_check"] = qc

    DATA.write_text(json.dumps(data, indent=0))
    print(f"script names: {len(names)}, blocks: {len(blocks)} -> {DATA}")


if __name__ == "__main__":
    main()
