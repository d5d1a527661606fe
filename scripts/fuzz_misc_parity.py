"""Remaining-API parity fuzz vs the reference decoder.wasm: full case
mappings, batch codepoint classification (the pre-tokenizer's hot
export), normalization quick-check, pairwise composition, and
script/block display names.

Writes docs/artifacts/misc_parity.json.

    python scripts/fuzz_misc_parity.py
"""

from __future__ import annotations

import json
import random
import struct
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import wasm_vm  # noqa: E402


def main() -> None:
    from gpu_bpe_tpu.unicode.cpp_backend import CppUnicodeBackend

    ours = CppUnicodeBackend()
    d = wasm_vm.RefDecoder()
    mem = d.inst.memory
    buf = d.malloc(1 << 14)
    out = d.malloc(1 << 14)
    plen = d.malloc(8)
    rng = random.Random(0)
    report: dict[str, dict] = {}

    def record(api, key, got, ref):
        ent = report.setdefault(api, {"checked": 0, "mismatches": 0, "samples": []})
        ent["checked"] += 1
        if got != ref:
            ent["mismatches"] += 1
            if len(ent["samples"]) < 10:
                ent["samples"].append({"input": key, "ours": got, "reference": ref})

    def ref_full(fn, cp):
        n = d.c(fn, cp, out, 18)
        return [struct.unpack_from("<I", mem, out + 4 * i)[0] for i in range(max(n, 0))]

    # full case mappings over interesting cps + random sample
    cps = ([0xDF, 0x130, 0x131, 0xFB00, 0xFB01, 0x149, 0x587, 0x1E9E, 0x390,
            0x3B0, 0x1F50, 0x1FB7, 0xFB13, 0x13A0, 0xAB70, 0x10D50]
           + [rng.randrange(0x20, 0x30000) for _ in range(3000)])
    cps = [cp for cp in cps if not 0xD800 <= cp <= 0xDFFF]
    for cp in cps:
        for fn, meth in [("decoder_to_upper_full", "to_upper_full"),
                         ("decoder_to_lower_full", "to_lower_full"),
                         ("decoder_to_title_full", "to_title_full"),
                         ("decoder_case_fold_full", "case_fold_full")]:
            record(meth, hex(cp), getattr(ours, meth)(cp), ref_full(fn, cp))

    # batch classification: decoder_classify_codepoints(utf8, len, out, cap, count*)
    for _ in range(300):
        s = "".join(chr(rng.choice(cps)) for _ in range(rng.randrange(1, 40)))
        data = s.encode("utf-8")
        mem[buf:buf + len(data)] = data
        rc = d.c("decoder_classify_codepoints", buf, len(data), out, 4096, plen)
        n = struct.unpack_from("<I", mem, plen)[0]
        ref = [mem[out + i] for i in range(n)] if rc == 0 else f"<rc {rc}>"
        got_arr, got_n = ours.classify_bytes(data)
        got = list(map(int, got_arr[:got_n]))
        record("classify_codepoints", data.hex()[:60], got, ref)

    # quick check (cps, n, form) and pairwise compose
    for _ in range(500):
        k = rng.randrange(1, 12)
        seq = [rng.choice(cps) for _ in range(k)]
        for i, c in enumerate(seq):
            mem[buf + 4 * i:buf + 4 * i + 4] = struct.pack("<I", c)
        for form in range(4):
            ref = d.c("decoder_quick_check", buf, k, form)
            carr = (__import__("ctypes").c_uint32 * k)(*seq)
            got = ours._lib.decoder_quick_check(carr, k, form)
            record("quick_check", (str([hex(c) for c in seq]), form), got, ref)
    for _ in range(2000):
        a, b = rng.choice(cps), rng.choice(cps)
        ref = d.c("decoder_compose", a, b)
        ref = ref - (1 << 64) if ref >= (1 << 63) else ref
        record("compose", (hex(a), hex(b)), ours.compose(a, b), ref)

    # display names
    for sid in range(0, 175):
        ptr = d.c("decoder_get_script_name", sid)
        ref = d.inst.read_cstr(ptr).decode() if ptr else ""
        record("get_script_name", sid, ours.get_script_name(sid), ref)
    for cp in cps[:500]:
        ptr = d.c("decoder_get_block_name", cp)
        ref = d.inst.read_cstr(ptr).decode() if ptr else ""
        record("get_block_name", hex(cp), ours.get_block_name(cp), ref)

    for api, ent in report.items():
        print(f"{api:22s} {ent['mismatches']}/{ent['checked']} mismatches")
    path = REPO / "docs/artifacts/misc_parity.json"
    path.write_text(json.dumps(report, indent=1, ensure_ascii=False)[:400000])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
