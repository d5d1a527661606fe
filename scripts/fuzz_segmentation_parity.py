"""Segmentation + string-case parity fuzz vs the reference decoder.wasm.

Drives grapheme/word/sentence counts, boundary predicates, next-boundary
iterators, string case conversion, and caseless compare through both our
native library and the reference binary (scripts/wasm_vm.py) on random
multi-script strings (emoji ZWJ chains, regional indicators, Indic
conjuncts, contractions, quoted sentences, combining stacks).

Writes docs/artifacts/segmentation_parity.json with per-API mismatch
counts and samples.

    python scripts/fuzz_segmentation_parity.py [--n 600] [--seed 0]
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

POOLS = [
    list("hello world, it's a test. Mr. Smith said \"Yes!\" Then left... ok?"),
    list("абвгд ΑΒΓ λόγος 漢字仮名ひらがなカタカナ한국어"),
    [chr(c) for c in (0x1F600, 0x1F3FB, 0x200D, 0x2764, 0xFE0F, 0x1F468, 0x1F469,
                      0x1F467, 0x1F1FA, 0x1F1F8, 0x1F1E9, 0x1F1EA)],
    [chr(c) for c in (0x915, 0x94D, 0x937, 0x93F, 0x300, 0x301, 0x308, 0x930,
                      0x94D, 0x92F)],
    [chr(c) for c in (0x0D, 0x0A, 0x85, 0x2028, 0x2029, 0x09, 0x22, 0x27,
                      0x2018, 0x2019, 0x3002, 0xFF61)],
    list("a1b2 12,345.67 3:14 a_b-c a.b.c e.g. i.e. U.S.A."),
]


def random_string(rng: random.Random) -> str:
    n = rng.randrange(1, 28)
    out = []
    for _ in range(n):
        pool = rng.choice(POOLS)
        out.append(rng.choice(pool))
    return "".join(out)


class Oracle:
    def __init__(self) -> None:
        self.d = wasm_vm.RefDecoder()
        self.buf = self.d.malloc(1 << 12)
        self.out = self.d.malloc(1 << 13)
        self.plen = self.d.malloc(8)

    def _put(self, s: str) -> tuple[int, int]:
        cps = [ord(c) for c in s]
        mem = self.d.inst.memory
        for i, c in enumerate(cps):
            mem[self.buf + 4 * i:self.buf + 4 * i + 4] = struct.pack("<I", c)
        return self.buf, len(cps)

    def count(self, fn: str, s: str) -> int:
        p, n = self._put(s)
        return self.d.c(fn, p, n)

    def boundary(self, fn: str, s: str, pos: int) -> int:
        p, n = self._put(s)
        return self.d.c(fn, p, n, pos)

    def nxt(self, fn: str, s: str, pos: int) -> int:
        p, n = self._put(s)
        return self.d.c(fn, p, n, pos)

    def string_case(self, fn: str, s: str) -> str:
        p, n = self._put(s)
        rc = self.d.c(fn, p, n, self.out, 2048, self.plen)
        if rc != 0:
            return f"<rc {rc}>"
        mem = self.d.inst.memory
        m = struct.unpack_from("<I", mem, self.plen)[0]
        return "".join(chr(struct.unpack_from("<I", mem, self.out + 4 * i)[0])
                       for i in range(m))

    def case_compare(self, a: str, b: str) -> int:
        ca = [ord(c) for c in a]
        cb = [ord(c) for c in b]
        mem = self.d.inst.memory
        pa, pb = self.buf, self.buf + 4096
        for i, c in enumerate(ca):
            mem[pa + 4 * i:pa + 4 * i + 4] = struct.pack("<I", c)
        for i, c in enumerate(cb):
            mem[pb + 4 * i:pb + 4 * i + 4] = struct.pack("<I", c)
        r = self.d.c("decoder_case_compare", pa, len(ca), pb, len(cb))
        return (r > 0) - (r < 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from gpu_bpe_tpu.unicode.cpp_backend import CppUnicodeBackend

    ours = CppUnicodeBackend()
    o = Oracle()
    rng = random.Random(args.seed)

    report: dict[str, dict] = {}

    def record(api: str, s, got, ref) -> None:
        ent = report.setdefault(api, {"checked": 0, "mismatches": 0, "samples": []})
        ent["checked"] += 1
        if got != ref:
            ent["mismatches"] += 1
            if len(ent["samples"]) < 12:
                ent["samples"].append({
                    "input": s if isinstance(s, str) else list(s),
                    "ours": got, "reference": ref,
                })

    for _ in range(args.n):
        s = random_string(rng)
        record("count_graphemes", s, ours.count_graphemes(s),
               o.count("decoder_count_graphemes", s))
        record("count_words", s, ours.count_words(s),
               o.count("decoder_count_words", s))
        record("count_sentences", s, ours.count_sentences(s),
               o.count("decoder_count_sentences", s))
        pos = rng.randrange(0, len(s) + 1)
        record("is_grapheme_boundary", (s, pos),
               int(ours.is_grapheme_boundary(s, pos)),
               o.boundary("decoder_is_grapheme_boundary", s, pos))
        record("is_word_boundary", (s, pos),
               int(ours.is_word_boundary(s, pos)),
               o.boundary("decoder_is_word_boundary", s, pos))
        record("is_sentence_boundary", (s, pos),
               int(ours.is_sentence_boundary(s, pos)),
               o.boundary("decoder_is_sentence_boundary", s, pos))
        pos2 = rng.randrange(0, len(s))
        record("next_grapheme", (s, pos2), ours.next_grapheme(s, pos2),
               o.nxt("decoder_next_grapheme", s, pos2))
        record("next_word", (s, pos2), ours.next_word(s, pos2),
               o.nxt("decoder_next_word", s, pos2))
        record("next_sentence", (s, pos2), ours.next_sentence(s, pos2),
               o.nxt("decoder_next_sentence", s, pos2))
        record("string_to_upper", s, ours.string_to_upper(s),
               o.string_case("decoder_string_to_upper", s))
        record("string_to_lower", s, ours.string_to_lower(s),
               o.string_case("decoder_string_to_lower", s))
        t = random_string(rng)
        record("case_compare", (s, t), ours.case_compare(s, t),
               o.case_compare(s, t))

    for api, ent in report.items():
        print(f"{api:22s} {ent['mismatches']}/{ent['checked']} mismatches")
    path = REPO / "docs/artifacts/segmentation_parity.json"
    path.write_text(json.dumps(report, indent=1, ensure_ascii=False))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
