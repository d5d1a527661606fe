"""String-level normalization parity fuzz: our native library vs the
reference decoder.wasm oracle.

Per-codepoint decomposition sweeps (scripts/sweep_oracle.py) cannot see
composition, canonical reordering, or Hangul handling — this drives whole
strings through `decoder_normalize_utf8` in both implementations for all
four forms and compares the raw UTF-8 output bytes.

Inputs: adversarial generator mixing precomposed Latin, combining-mark
stacks (randomized ccc order), Hangul syllables + jamo, compatibility
characters (ligatures, fullwidth, enclosed, math alphanumerics), and a
uniform scatter over the repertoire.

Writes docs/artifacts/normalize_parity.json.

    python scripts/fuzz_normalize_parity.py [--n 2000] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import random
import struct
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import wasm_vm  # noqa: E402

FORMS = ["NFC", "NFD", "NFKC", "NFKD"]

POOLS = [
    # precomposed + base Latin
    list(range(0x41, 0x7B)) + list(range(0xC0, 0x100)) + [0x152, 0x153, 0x1E9E],
    # combining marks (varied ccc)
    [0x300, 0x301, 0x302, 0x303, 0x308, 0x30C, 0x323, 0x327, 0x328, 0x31B,
     0x5B4, 0x5B7, 0x64B, 0x64E, 0x650, 0x93C, 0x9BE, 0x102E0, 0x1D165, 0x1D16E],
    # Hangul syllables and jamo
    [random.Random(7).randrange(0xAC00, 0xD7A4) for _ in range(64)]
    + list(range(0x1100, 0x1113)) + list(range(0x1161, 0x1176)) + list(range(0x11A8, 0x11C3)),
    # compatibility characters
    [0xFB00, 0xFB01, 0xFB02, 0xFB03, 0xFB4F, 0x32FF, 0x3300, 0x33C2, 0x2100,
     0x2102, 0x2116, 0x2126, 0x212B, 0xFDFA, 0xFF21, 0xFF41, 0xFFE0, 0x1D400,
     0x1D6E2, 0x2460, 0x24B6, 0x3000, 0xA770],
    # CJK + canonical singletons
    [0x2F800, 0x2F801, 0xF900, 0xF9FF, 0x2000, 0x2011, 0x2126],
    # post-15.0 recovered mappings (Todhri, Tulu-Tigalari, Gurung Khema,
    # Kirat Rai, modifier capitals) incl. the NFC-inert set
    [0x105C9, 0x105E4, 0x11383, 0x11385, 0x1138E, 0x11391, 0x113C5,
     0x113C7, 0x113C8, 0x16121, 0x16126, 0x16D68, 0x16D69, 0xA7F1,
     0x105D2, 0x307, 0x11382, 0x113C9, 0x1611E, 0x16129],
]


def random_string(rng: random.Random) -> str:
    n = rng.randrange(1, 24)
    cps = []
    for _ in range(n):
        pool = rng.choice(POOLS) if rng.random() < 0.9 else None
        if pool is None:
            cp = rng.randrange(0x20, 0x30000)
            if 0xD800 <= cp <= 0xDFFF:
                cp = 0x61
        else:
            cp = rng.choice(pool)
        cps.append(cp)
    return "".join(map(chr, cps))


class Oracle:
    def __init__(self) -> None:
        self.d = wasm_vm.RefDecoder()
        self.src = self.d.malloc(1 << 12)
        self.dst = self.d.malloc(1 << 14)
        self.plen = self.d.malloc(8)

    def normalize(self, data: bytes, form: int) -> bytes:
        assert len(data) < (1 << 12)
        mem = self.d.inst.memory
        mem[self.src:self.src + len(data)] = data
        rc = self.d.c("decoder_normalize_utf8", self.src, len(data), form,
                      self.dst, 1 << 14, self.plen)
        if rc != 0:
            return b"<rc %d>" % rc
        n = struct.unpack_from("<I", mem, self.plen)[0]
        return bytes(mem[self.dst:self.dst + n])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from gpu_bpe_tpu.unicode.cpp_backend import CppUnicodeBackend

    ours = CppUnicodeBackend()
    oracle = Oracle()
    rng = random.Random(args.seed)

    def involves_hangul(s: str) -> bool:
        return any(
            0xAC00 <= ord(c) <= 0xD7A3 or 0x1100 <= ord(c) <= 0x11FF
            or 0xA960 <= ord(c) <= 0xA97F or 0xD7B0 <= ord(c) <= 0xD7FF
            for c in s
        )

    mismatches = []
    hangul_only = 0
    oracle_errors = 0
    total = 0
    for i in range(args.n):
        s = random_string(rng)
        data = s.encode("utf-8")
        for fi, form in enumerate(FORMS):
            total += 1
            ref = oracle.normalize(data, fi)
            got = ours.normalize_bytes(data, form)
            if ref.startswith(b"<rc "):
                # the REFERENCE errored on valid input (observed: rc=-2
                # buffer-too-small on U+FDFA's 18x NFK* expansion — the
                # same bug class fixed on our side in round 2); we handle
                # it and match unicodedata, so this is not our mismatch
                oracle_errors += 1
                continue
            if got != ref:
                # the reference's known non-conformance: Hangul is
                # normalization-inert there (no algorithmic compose or
                # decompose); we implement the standard (== unicodedata)
                if involves_hangul(s):
                    hangul_only += 1
                    continue
                mismatches.append({
                    "input": data.hex(),
                    "form": form,
                    "ours": got.hex(),
                    "reference": ref.hex(),
                })
        if (i + 1) % 200 == 0:
            print(f"{i + 1}/{args.n} strings, {len(mismatches)} non-Hangul "
                  f"mismatches ({hangul_only} known-Hangul)", flush=True)

    out = {
        "strings": args.n,
        "comparisons": total,
        "mismatches_non_hangul": len(mismatches),
        "mismatches_hangul_known_reference_nonconformance": hangul_only,
        "reference_errors_on_valid_input": oracle_errors,
        "samples": mismatches[:40],
        "seed": args.seed,
    }
    path = REPO / "docs/artifacts/normalize_parity.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"{len(mismatches)}/{total} mismatches -> {path}")


if __name__ == "__main__":
    main()
