"""Recover the post-15.0 decomposition mappings from the reference binary.

The generated tables pinned an explicit unknowns list (kMissingDecompCp /
kMissingCompatDecompCp): codepoints whose 17.0 quick-check is No but whose
decomposition mapping the offline 15.0 database lacks.  The reference
binary HAS those mappings — this script extracts them via the oracle:

* canonical: single-level from the sweep's decoder_decompose data
* compatibility: full NFKD of the single-cp string via decoder_normalize
* composition: whether the reference's NFC recomposes each new canonical
  pair (drives the composition-pair table)

Appends "extra_decomp" to gpu_bpe_tpu/unicode/data/ref_properties.json.

    python scripts/extract_missing_decomps.py
"""

from __future__ import annotations

import json
import re
import struct
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import wasm_vm  # noqa: E402

DATA = REPO / "gpu_bpe_tpu/unicode/data/ref_properties.json"
HEADER = REPO / "gpu_bpe_tpu/unicode/cpp/unicode_tables.h"


def header_list(name: str) -> list[int]:
    txt = HEADER.read_text()
    m = re.search(rf"{name}\[\] = \{{([^}}]*)\}}", txt)
    return [int(x, 0) for x in m.group(1).replace("\n", " ").split(",") if x.strip()]


def main() -> None:
    d = wasm_vm.RefDecoder()
    mem = d.inst.memory
    src = d.malloc(64)
    dst = d.malloc(1024)
    plen = d.malloc(8)

    def norm(cps: list[int], form: int) -> list[int]:
        data = "".join(map(chr, cps)).encode("utf-8")
        mem[src:src + len(data)] = data
        rc = d.c("decoder_normalize_utf8", src, len(data), form, dst, 1024, plen)
        assert rc == 0, rc
        n = struct.unpack_from("<I", mem, plen)[0]
        return [ord(c) for c in bytes(mem[dst:dst + n]).decode("utf-8")]

    dbuf = d.malloc(64)

    def decompose1(cp: int) -> list[int]:
        n = d.c("decoder_decompose", cp, dbuf, 8)
        return [struct.unpack_from("<I", mem, dbuf + 4 * i)[0] for i in range(max(n, 0))]

    missing_nfd = header_list("kMissingDecompCp")
    missing_nfkd = header_list("kMissingCompatDecompCp")
    print(f"recovering {len(missing_nfd)} canonical + {len(missing_nfkd)} compat mappings")

    canonical = {}
    for cp in missing_nfd:
        seq = decompose1(cp)
        assert seq, hex(cp)
        # does the reference's NFC recompose the pair?
        composes = len(seq) == 2 and norm(seq, 0) == [cp]
        canonical[str(cp)] = {"seq": seq, "composes": composes}

    compat = {}
    for cp in missing_nfkd:
        if cp in missing_nfd:
            continue  # canonical mapping covers NFKD via recursion
        seq = norm([cp], 3)  # full NFKD
        assert seq != [cp], hex(cp)
        compat[str(cp)] = seq

    data = json.loads(DATA.read_text())
    data["extra_decomp"] = {
        "source": "post-15.0 decomposition mappings recovered from the reference "
                  "binary (decoder_decompose + decoder_normalize_utf8 oracle); "
                  "see scripts/extract_missing_decomps.py",
        "canonical": canonical,
        "compat": compat,
    }
    DATA.write_text(json.dumps(data, indent=0))
    print(f"canonical: {len(canonical)} (composing: "
          f"{sum(v['composes'] for v in canonical.values())}), "
          f"compat: {len(compat)} -> {DATA}")


if __name__ == "__main__":
    main()
