"""Exhaustive parity of the confusables implementation vs the reference's
extracted table.

gpu_bpe_tpu/unicode/data/ref_confusables.json is the reference decoder.wasm's
exact confusables hash table, extracted and oracle-verified entry-by-entry
(scripts/extract_confusables.py; semantics pinned in
scripts/wasm_vm.py-driven probes — see docs/CONFORMANCE.md).  These tests
pin both the native C++ library and the pure-Python fallback to that data
over the FULL 6,558-entry table, not samples.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from gpu_bpe_tpu.unicode.cpp_backend import CppUnicodeBackend
from gpu_bpe_tpu.unicode.fallback import PyUnicodeBackend

DATA = Path(__file__).resolve().parent.parent / "gpu_bpe_tpu/unicode/data/ref_confusables.json"


@pytest.fixture(scope="module")
def table():
    entries = json.loads(DATA.read_text())["entries"]
    return {int(k): (v, plen) for k, (v, plen) in entries.items()}


@pytest.fixture(scope="module")
def cpp():
    return CppUnicodeBackend()


@pytest.fixture(scope="module")
def fb():
    return PyUnicodeBackend()


def test_table_shape(table):
    assert len(table) == 6565
    # the table is closed: no prototype is itself mapped
    for cp, (proto, _plen) in table.items():
        assert proto not in table, hex(cp)


@pytest.mark.parametrize("impl_name", ["cpp", "fb"])
def test_every_entry_confusable_with_prototype(impl_name, table, request):
    impl = request.getfixturevalue(impl_name)
    bad = [cp for cp, (proto, _l) in table.items()
           if cp != proto and not impl.is_confusable(cp, proto)]
    assert bad == [], [hex(c) for c in bad[:10]]


@pytest.mark.parametrize("impl_name", ["cpp", "fb"])
def test_mapping_membership_full(impl_name, table, request):
    impl = request.getfixturevalue(impl_name)
    # every table cp has a mapping; a stride sweep of the repertoire has none
    assert all(impl.has_confusable_mapping(cp) for cp in table)
    missing = [cp for cp in range(0, 0x110000, 257)
               if impl.has_confusable_mapping(cp) != (cp in table)]
    assert missing == [], [hex(c) for c in missing[:10]]


@pytest.mark.parametrize("impl_name", ["cpp", "fb"])
def test_proto_lengths_full(impl_name, table, request):
    impl = request.getfixturevalue(impl_name)
    bad = [cp for cp, (_p, plen) in table.items()
           if impl.confusable_proto_len(cp) != plen]
    assert bad == []
    assert impl.confusable_proto_len(ord("a")) == 1


@pytest.mark.parametrize("impl_name", ["cpp", "fb"])
def test_identity_never_confusable(impl_name, table, request):
    impl = request.getfixturevalue(impl_name)
    some = list(table)[:64] + [ord("a"), 0x20, 0x10FFFF]
    assert not any(impl.is_confusable(cp, cp) for cp in some)


def test_cpp_fallback_agree_on_strings(cpp, fb):
    pairs = [
        ("pаypal", "paypal"), ("раура", "paypa"), ("ﬁ", "fi"),
        ("œ", "o"), ("1l", "l1"), ("abc", "abc"), ("", ""),
    ]
    for a, b in pairs:
        assert cpp.check_confusables(a, b) == fb.check_confusables(a, b), (a, b)


def test_fallback_security_apis_match_cpp(cpp, fb):
    """The degradation chain serves the same reference-extracted data."""
    sample = [0x61, 0x378, 0x430, 0x3A9, 0x7FF, 0xB7, 0x4E2D, 0x10D40, 0xE000]
    for cp in sample:
        assert fb.get_script(cp) == cpp.get_script(cp), hex(cp)
        assert fb.is_identifier_start(cp) == cpp.is_identifier_start(cp), hex(cp)
        assert fb.is_identifier_continue(cp) == cpp.is_identifier_continue(cp), hex(cp)
        assert fb.get_block_name(cp) == cpp.get_block_name(cp), hex(cp)
    assert fb.get_script_name(3) == "Latin"
    for s in ["pаypal", "paypal", "日本語です", "1aΩ", "aΩ", "​", "привет"]:
        assert fb.is_suspicious(s) == cpp.is_suspicious(s), s
