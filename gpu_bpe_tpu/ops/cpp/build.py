"""Build the native ingest shared library (g++, no external deps).

Compiles ingest.cpp -> libingest.so next to this file. Idempotent:
rebuilds only when the source is newer than the artifact. Used lazily by
ops/native.py; can also be run directly:

    python -m gpu_bpe_tpu.ops.cpp.build
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SOURCE = HERE / "ingest.cpp"
LIB = HERE / "libingest.so"


def build(force: bool = False) -> Path:
    if not force and LIB.exists() and LIB.stat().st_mtime > SOURCE.stat().st_mtime:
        return LIB
    # no -march=native: the artifact is checked in (same as libdecoder.so)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(LIB), str(SOURCE),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except Exception:
        # fresh checkouts have arbitrary mtime order; on a host without a
        # toolchain the checked-in artifact is still valid — use it rather
        # than silently dropping to the numpy path
        if LIB.exists():
            return LIB
        raise
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path, file=sys.stderr)
