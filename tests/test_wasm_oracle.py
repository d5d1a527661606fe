"""Smoke tests for the wasm interpreter tooling (scripts/wasm_vm.py).

The conformance pipeline (confusables extraction, property sweeps, parity
fuzzes) all stand on this interpreter executing the reference's
decoder.wasm faithfully — pin a few ground-truth behaviors so tooling
regressions can't silently invalidate future extractions.

Skipped when the reference tree is not mounted.
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference/src/wasm/decoder.wasm")
SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@pytest.fixture(scope="module")
def oracle():
    sys.path.insert(0, str(SCRIPTS))
    import wasm_vm

    return wasm_vm.RefDecoder()


def test_version_and_basic_properties(oracle):
    assert oracle.unicode_version() == "17.0.0"
    assert oracle.c("decoder_is_letter", ord("A")) == 1
    assert oracle.c("decoder_get_category", ord("A")) == 1  # UPPERCASE_LETTER
    assert oracle.c("decoder_get_script", 0x431) == 5  # CYRILLIC


def test_confusable_semantics(oracle):
    assert oracle.c("decoder_is_confusable", 0x430, ord("a")) == 1
    assert oracle.c("decoder_is_confusable", ord("a"), ord("a")) == 0


def test_simd_normalize_path(oracle):
    # exercises the interpreter's SIMD subset (Emscripten's UTF-8 fast path)
    src = oracle.malloc(64)
    dst = oracle.malloc(256)
    plen = oracle.malloc(8)
    data = "café".encode()
    oracle.inst.memory[src:src + len(data)] = data
    rc = oracle.c("decoder_normalize_utf8", src, len(data), 1, dst, 256, plen)  # NFD
    assert rc == 0
    n = struct.unpack_from("<I", oracle.inst.memory, plen)[0]
    out = bytes(oracle.inst.memory[dst:dst + n]).decode()
    assert out == "café"
