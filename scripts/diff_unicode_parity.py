"""Diff our native Unicode library against the reference decoder.wasm sweep.

Consumes docs/artifacts/oracle_sweep/*.npz (produced by
scripts/sweep_oracle.py — the reference binary's actual per-codepoint
answers over the full repertoire) and compares every property against
gpu_bpe_tpu's native C++ library, writing a machine-readable summary to
docs/artifacts/unicode_parity.json: per-property mismatch counts and up to
32 sample mismatches (cp, ours, reference).

This is the evidence artifact behind docs/CONFORMANCE.md's Unicode 17.0
parity claims.

    python scripts/diff_unicode_parity.py
"""

from __future__ import annotations

import ctypes as C
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SWEEP = REPO / "docs/artifacts/oracle_sweep"
OUT = REPO / "docs/artifacts/unicode_parity.json"
TOP = 0x110000

FLAG_FUNCS = [  # bit order matches scripts/sweep_oracle.py
    "decoder_is_assigned", "decoder_is_alphabetic", "decoder_is_numeric",
    "decoder_is_whitespace", "decoder_is_control", "decoder_is_uppercase",
    "decoder_is_lowercase", "decoder_is_titlecase",
    "decoder_is_identifier_start", "decoder_is_identifier_continue",
    "decoder_is_letter", "decoder_is_digit", "decoder_is_number",
    "decoder_is_punctuation", "decoder_is_symbol", "decoder_is_mark",
]
SIMPLE = {
    "category": "decoder_get_category",
    "script": "decoder_get_script",
    "ccc": "decoder_get_combining_class",
    "upper": "decoder_to_upper",
    "lower": "decoder_to_lower",
    "title": "decoder_to_title",
    "fold": "decoder_case_fold",
}


def load_sweep() -> dict[str, np.ndarray]:
    chunks = sorted(SWEEP.glob("chunk_*.npz"))
    assert chunks, "run scripts/sweep_oracle.py first"
    fields: dict[str, list[np.ndarray]] = {}
    for path in chunks:
        with np.load(path) as z:
            for k in z.files:
                fields.setdefault(k, []).append(z[k])
    out = {k: np.concatenate(v) for k, v in fields.items()}
    n = len(out["category"])
    assert n == TOP, f"sweep incomplete: {n:#x} of {TOP:#x} codepoints"
    return out


def ours_simple(lib, fn_name: str) -> np.ndarray:
    fn = getattr(lib, fn_name)
    fn.argtypes = [C.c_uint32]
    fn.restype = C.c_int
    out = np.empty(TOP, dtype=np.int32)
    for cp in range(TOP):
        out[cp] = fn(cp)
    return out


def mismatch_entry(cp: int, ours, ref) -> list:
    return [hex(cp), int(ours), int(ref)]


def main() -> None:
    from gpu_bpe_tpu.unicode.cpp_backend import _load

    lib = _load()
    sweep = load_sweep()
    report: dict[str, dict] = {}

    for name, fn_name in SIMPLE.items():
        ours = ours_simple(lib, fn_name)
        ref = sweep[name]
        bad = np.nonzero(ours != ref)[0]
        report[name] = {
            "mismatches": int(len(bad)),
            "samples": [mismatch_entry(cp, ours[cp], ref[cp]) for cp in bad[:32]],
        }
        print(f"{name:10s} mismatches: {len(bad)}", flush=True)

    ref_flags = sweep["flags"]
    for bit, fn_name in enumerate(FLAG_FUNCS):
        ours = ours_simple(lib, fn_name)
        ref = (ref_flags >> bit) & 1
        bad = np.nonzero((ours != 0).astype(np.uint32) != ref)[0]
        key = fn_name.replace("decoder_", "")
        report[key] = {
            "mismatches": int(len(bad)),
            "samples": [mismatch_entry(cp, ours[cp], ref[cp]) for cp in bad[:32]],
        }
        print(f"{key:24s} mismatches: {len(bad)}", flush=True)

    # canonical decomposition (single level, non-Hangul in the reference)
    dec_fn = lib.decoder_decompose
    dec_fn.argtypes = [C.c_uint32, C.POINTER(C.c_uint32), C.c_int]
    dec_fn.restype = C.c_int
    buf = (C.c_uint32 * 8)()
    ref_len = sweep["decomp_len"]
    ref_seq = sweep["decomp"]
    bad_list = []
    for cp in range(TOP):
        n = dec_fn(cp, buf, 8)
        n_cmp = min(max(n, 0), 4)
        if n_cmp != ref_len[cp] or any(buf[i] != ref_seq[cp, i] for i in range(n_cmp)):
            bad_list.append(cp)
    report["decompose"] = {
        "mismatches": len(bad_list),
        "samples": [
            [hex(cp), [hex(buf[i]) for i in range(max(dec_fn(cp, buf, 8), 0))],
             [hex(int(x)) for x in ref_seq[cp, : ref_len[cp]]]]
            for cp in bad_list[:32]
        ],
    }
    print(f"decompose  mismatches: {len(bad_list)}", flush=True)

    n_susp = int(sweep["suspicious"].sum())
    report["suspicious_singletons"] = {"reference_count": n_susp}
    print(f"reference singleton-suspicious cps: {n_susp}")

    OUT.write_text(json.dumps(report, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
