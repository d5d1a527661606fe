"""Build the native decoder shared library (g++, no external deps).

Regenerates tables when missing and compiles decoder.cpp → libdecoder.so
next to this file. Idempotent: rebuilds only when sources are newer than
the artifact. Used lazily by cpp_backend.py; can also be run directly:

    python -m gpu_bpe_tpu.unicode.cpp.build
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
TABLES = HERE / "unicode_tables.h"
SOURCE = HERE / "decoder.cpp"
LIB = HERE / "libdecoder.so"


def build(force: bool = False) -> Path:
    if not TABLES.exists():
        from . import gen_tables

        gen_tables.main(str(TABLES))
    if (
        not force
        and LIB.exists()
        and LIB.stat().st_mtime > SOURCE.stat().st_mtime
        and LIB.stat().st_mtime > TABLES.stat().st_mtime
    ):
        return LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", str(LIB), str(SOURCE),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except Exception:
        # fresh checkouts have arbitrary mtime order; on a host without a
        # toolchain the checked-in artifact is still valid — use it rather
        # than dropping to the Python fallback backend
        if LIB.exists():
            return LIB
        raise
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path, file=sys.stderr)
