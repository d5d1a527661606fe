"""Public enums matching the reference decoder API (decoder.mjs:24-121)."""

from __future__ import annotations

from enum import IntEnum


class Status(IntEnum):
    SUCCESS = 0
    ERROR_INVALID_INPUT = -1
    ERROR_BUFFER_TOO_SMALL = -2
    ERROR_INVALID_UTF8 = -3
    ERROR_INVALID_UTF16 = -4
    ERROR_INVALID_CODEPOINT = -5
    ERROR_OUT_OF_MEMORY = -6
    ERROR_NOT_IMPLEMENTED = -7
    ERROR_IO = -8
    ERROR_INVALID_ARGUMENT = -9
    ERROR_OVERFLOW = -10


class NormalizationForm(IntEnum):
    NFC = 0
    NFD = 1
    NFKC = 2
    NFKD = 3


# General categories, ordered as generated (gen_tables.py CATEGORIES).
CATEGORIES = [
    "Cn", "Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc", "Me", "Nd", "Nl", "No",
    "Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po", "Sm", "Sc", "Sk", "So",
    "Zs", "Zl", "Zp", "Cc", "Cf", "Cs", "Co",
]

# Script ids match the reference enum ordering (decoder.mjs:57-94).
from .cpp.gen_tables import REFERENCE_SCRIPTS  # noqa: E402

Script = IntEnum("Script", {name: i for i, name in enumerate(REFERENCE_SCRIPTS)})
