"""Generate the is_suspicious singleton data from the oracle sweep.

The reference's `decoder_is_suspicious` (oracle-pinned via probes in
round 2) is:

  suspicious(s) = EXISTS cp: singleton_suspicious(cp)
                  OR >= 2 distinct script ids over the string, excluding
                     COMMON(1)/INHERITED(2) (UNKNOWN(0) counts)

where singleton_suspicious(cp) = (cp has a confusables-table entry AND
cp > 0x7F) OR cp in an explicit extra set (C0 controls minus \t\n\r,
bidi/ZW format controls, private use, noncharacters, and a few
punctuation singletons).  This script derives the EXACT extra set from
the exhaustive sweep (docs/artifacts/oracle_sweep), asserts the
confusables clause has no false positives, and writes the extra ranges
to gpu_bpe_tpu/unicode/data/ref_suspicious_extra.json.

    python scripts/gen_suspicious_data.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
SWEEP = REPO / "docs/artifacts/oracle_sweep"
OUT = REPO / "gpu_bpe_tpu/unicode/data/ref_suspicious_extra.json"
TOP = 0x110000


def main() -> None:
    chunks = sorted(SWEEP.glob("chunk_*.npz"))
    susp = np.concatenate([np.load(c)["suspicious"] for c in chunks])
    assert len(susp) == TOP, f"sweep incomplete: {len(susp):#x}"

    table = json.loads(
        (REPO / "gpu_bpe_tpu/unicode/data/ref_confusables.json").read_text()
    )["entries"]
    mapped = np.zeros(TOP, dtype=bool)
    for cp in table:
        mapped[int(cp)] = True
    rule = mapped & (np.arange(TOP) > 0x7F)

    false_pos = np.nonzero(rule & ~susp.astype(bool))[0]
    assert len(false_pos) == 0, [hex(c) for c in false_pos[:10]]

    extra = np.nonzero(susp.astype(bool) & ~rule)[0]
    ranges: list[list[int]] = []
    for cp in extra:
        cp = int(cp)
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1][1] = cp
        else:
            ranges.append([cp, cp])

    data = {
        "source": "exhaustive decoder_is_suspicious([cp]) sweep of the reference "
                  "decoder.wasm (scripts/sweep_oracle.py) minus the confusables-table "
                  "clause; see scripts/gen_suspicious_data.py",
        "ranges": ranges,
    }
    OUT.write_text(json.dumps(data, indent=0))
    print(f"{len(extra)} extra cps in {len(ranges)} ranges -> {OUT}")


if __name__ == "__main__":
    main()
