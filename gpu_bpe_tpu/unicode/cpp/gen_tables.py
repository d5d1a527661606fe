"""Generate C++ Unicode property tables (Unicode 17.0 via the regex module).

Produces ``unicode_tables.h`` consumed by decoder.cpp. Tables:

* category: per-codepoint general category (5-bit), run-length encoded into
  (start, category) ranges, binary-searched at runtime behind a two-level
  page index for O(1) lookups.
* char class: the pre-tokenizer's 7-class mapping (CharClass) as a direct
  page-indexed table.
* canonical decomposition: cp -> (first, second) pairs (fully expanded to
  NFD at generation time so runtime decomposition is one lookup).
* canonical composition: (first, second) -> composite, with composition
  exclusions handled by verifying each pair against unicodedata.normalize
  at generation time.
* combining class (CCC) for canonical ordering.
* simple case maps (upper/lower/title/fold) as sparse delta tables.

Data sources (reference parity: decoder.wasm ships Unicode 17.0):

* The installed ``regex`` module (2026.x) carries the FULL Unicode 17.0
  property database: general categories, CCC, scripts, blocks, identifier
  properties, UAX #29 break classes, and full case folding (fold_case /
  get_all_cases natives). These drive every classification table.
* CPython's unicodedata (15.0) supplies what regex does not expose:
  decomposition mappings (NFC/NFD/NFKC/NFKD data) and the
  upper/lower/title case mappings. Post-15.0 cased letters get their
  simple case pairs recovered from regex ``get_all_cases`` (exact for
  one-to-one bicameral pairs, i.e. every post-15.0 case mapping).
  Post-15.0 codepoints with decompositions — if any exist — are DETECTED
  via regex's NFD/NFKD quick-check sets and reported at generation time
  (see kMissingDecompCount in the header), since the mapping data itself
  is unavailable offline.
"""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

MAX_CP = 0x110000

CATEGORIES = [
    "Cn", "Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc", "Me", "Nd", "Nl", "No",
    "Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po", "Sm", "Sc", "Sk", "So",
    "Zs", "Zl", "Zp", "Cc", "Cf", "Cs", "Co",
]
CAT_INDEX = {c: i for i, c in enumerate(CATEGORIES)}

WHITESPACE = set(
    list(range(0x09, 0x0E)) + [0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
NEWLINES = {0x0A, 0x0D, 0x85, 0x2028, 0x2029}

# CharClass (must match gpu_bpe_tpu.unicode.fallback.CharClass)
LETTER, DIGIT, WS, PUNCT, SYM, NL, OTHER = range(7)


def char_class(cp: int, cat: str) -> int:
    if cp in NEWLINES:
        return NL
    h = cat[0]
    if h in ("L", "M"):
        return LETTER
    if h == "N":
        return DIGIT
    if cp in WHITESPACE:
        return WS
    if h == "P":
        return PUNCT
    if h == "S":
        return SYM
    return OTHER


def _extra_decomp() -> tuple[dict[int, list[int]], set[int], dict[int, list[int]]]:
    """Post-15.0 decomposition mappings recovered from the reference
    binary (scripts/extract_missing_decomps.py): canonical single-level
    map, the subset whose pairs recompose under the reference's NFC, and
    full compat sequences.  Empty when the data file is absent."""
    import json

    path = Path(__file__).resolve().parent.parent / "data" / "ref_properties.json"
    if not path.exists():
        return {}, set(), {}
    data = json.loads(path.read_text()).get("extra_decomp")
    if not data:
        return {}, set(), {}
    canonical = {int(k): v["seq"] for k, v in data["canonical"].items()}
    composing = {int(k) for k, v in data["canonical"].items() if v["composes"]}
    compat = {int(k): v for k, v in data["compat"].items()}
    return canonical, composing, compat


EXTRA_CANONICAL, EXTRA_COMPOSING, EXTRA_COMPAT = _extra_decomp()


def full_canonical_decomposition(cp: int) -> list[int]:
    """Fully expanded canonical (NFD) decomposition, excluding Hangul."""
    if 0xAC00 <= cp <= 0xD7A3:
        return []  # Hangul handled algorithmically at runtime
    if cp in EXTRA_CANONICAL:
        out: list[int] = []
        for sub in EXTRA_CANONICAL[cp]:
            expanded = full_canonical_decomposition(sub)
            out.extend(expanded if expanded else [sub])
        return out
    d = unicodedata.decomposition(chr(cp))
    if not d or d.startswith("<"):
        return []
    out = []
    for part in d.split():
        sub = int(part, 16)
        expanded = full_canonical_decomposition(sub)
        out.extend(expanded if expanded else [sub])
    return out


def full_compat_decomposition(cp: int) -> list[int]:
    """Fully expanded compatibility (NFKD) decomposition, excluding Hangul.

    Expanded at generation time via unicodedata.normalize so the runtime
    NFKD/NFKC path is a single table lookup per codepoint (the expansion
    already includes nested canonical+compat decompositions)."""
    if 0xAC00 <= cp <= 0xD7A3 or 0xD800 <= cp <= 0xDFFF:
        return []  # Hangul algorithmic at runtime; surrogates unmapped
    if cp in EXTRA_COMPAT:
        return list(EXTRA_COMPAT[cp])
    if cp in EXTRA_CANONICAL:
        return full_canonical_decomposition(cp)
    s = unicodedata.normalize("NFKD", chr(cp))
    if s == chr(cp):
        return []
    return [ord(c) for c in s]


# Reference script enum (decoder.mjs:57-94) — ids must match for API parity.
REFERENCE_SCRIPTS = (
    "UNKNOWN COMMON INHERITED LATIN GREEK CYRILLIC ARMENIAN HEBREW ARABIC SYRIAC "
    "THAANA DEVANAGARI BENGALI GURMUKHI GUJARATI ORIYA TAMIL TELUGU KANNADA "
    "MALAYALAM SINHALA THAI LAO TIBETAN MYANMAR GEORGIAN HANGUL ETHIOPIC CHEROKEE "
    "CANADIAN_ABORIGINAL OGHAM RUNIC KHMER MONGOLIAN HIRAGANA KATAKANA BOPOMOFO "
    "HAN YI OLD_ITALIC GOTHIC DESERET TAGALOG HANUNOO BUHID TAGBANWA LIMBU TAI_LE "
    "LINEAR_B UGARITIC SHAVIAN OSMANYA CYPRIOT BRAILLE BUGINESE COPTIC NEW_TAI_LUE "
    "GLAGOLITIC TIFINAGH SYLOTI_NAGRI OLD_PERSIAN KHAROSHTHI BALINESE CUNEIFORM "
    "PHOENICIAN PHAGS_PA NKO SUNDANESE LEPCHA OL_CHIKI VAI SAURASHTRA KAYAH_LI "
    "REJANG LYCIAN CARIAN LYDIAN CHAM TAI_THAM TAI_VIET AVESTAN "
    "EGYPTIAN_HIEROGLYPHS SAMARITAN LISU BAMUM JAVANESE MEETEI_MAYEK "
    "IMPERIAL_ARAMAIC OLD_SOUTH_ARABIAN INSCRIPTIONAL_PARTHIAN "
    "INSCRIPTIONAL_PAHLAVI OLD_TURKIC KAITHI BATAK BRAHMI MANDAIC CHAKMA "
    "MEROITIC_CURSIVE MEROITIC_HIEROGLYPHS MIAO SHARADA SORA_SOMPENG TAKRI "
    "CAUCASIAN_ALBANIAN BASSA_VAH DUPLOYAN ELBASAN GRANTHA KHOJKI KHUDAWADI "
    "LINEAR_A MAHAJANI MANICHAEAN MENDE_KIKAKUI MODI MRO NABATAEAN "
    "OLD_NORTH_ARABIAN OLD_PERMIC PAHAWH_HMONG PALMYRENE PAU_CIN_HAU "
    "PSALTER_PAHLAVI SIDDHAM TIRHUTA WARANG_CITI AHOM ANATOLIAN_HIEROGLYPHS "
    "HATRAN MULTANI OLD_HUNGARIAN SIGNWRITING ADLAM BHAIKSUKI MARCHEN NEWA "
    "OSAGE TANGUT MASARAM_GONDI NUSHU SOYOMBO ZANABAZAR_SQUARE DOGRA "
    "GUNJALA_GONDI HANIFI_ROHINGYA MAKASAR MEDEFAIDRIN OLD_SOGDIAN SOGDIAN "
    "ELYMAIC NANDINAGARI NYIAKENG_PUACHUE_HMONG WANCHO CHORASMIAN DIVES_AKURU "
    "KHITAN_SMALL_SCRIPT YEZIDI CYPRO_MINOAN OLD_UYGHUR TANGSA TOTO VITHKUQI "
    "KATAKANA_OR_HIRAGANA KAWI NAG_MUNDARI OL_ONAL TITUS TOLONG_SIKI SUNUWAR "
    "TODHRI ARA_NAUZ GARAY GURUNG_KHEMA KIRAT_RAI ONEY TULU_TIGALARI SIDETIC "
    "BERIA_ERFE TAI_YO"
).split()


def _property_ranges(pattern: str, all_text: str) -> list[tuple[int, int]]:
    """[start, end) codepoint ranges matching a regex property class."""
    import regex

    pat = regex.compile(pattern + "+", regex.V1)
    return [(m.start(), m.end()) for m in pat.finditer(all_text)]


def generate_categories_17(all_text: str) -> list[int]:
    """Per-codepoint general category at Unicode 17.0 (regex module data).

    Every non-Cn category is queried as \\p{gc=Xx} ranges; unmatched
    codepoints stay Cn. This replaces unicodedata.category (15.0) — the
    category table drives the pre-tokenizer's char classes, i.e. word
    boundaries, i.e. the merge list: the primary conformance surface."""
    cats = [CAT_INDEX["Cn"]] * MAX_CP
    for name, idx in CAT_INDEX.items():
        if name == "Cn":
            continue
        for s, e in _property_ranges(rf"\p{{gc={name}}}", all_text):
            for cp in range(s, e):
                cats[cp] = idx
    return cats


def generate_ccc_17(all_text: str) -> list[int]:
    """Per-codepoint canonical combining class at 17.0 (regex data).

    regex names CCC values both symbolically and numerically; the numeric
    aliases enumerate every assigned value."""
    import regex._regex_core as rc

    ccc = [0] * MAX_CP
    numeric = sorted(
        {int(name) for name in rc.PROPERTIES["CANONICALCOMBININGCLASS"][1] if name.isdigit()}
    )
    for val in numeric:
        if val == 0:
            continue
        for s, e in _property_ranges(rf"\p{{ccc={val}}}", all_text):
            for cp in range(s, e):
                ccc[cp] = val
    return ccc


def fold_17(cp: int, assigned_15: bool) -> str:
    """Full case fold: unicodedata (authoritative through 15.0) for
    codepoints assigned there, the regex module's 17.0 fold_case for the
    rest (regex omits the U+0130 F-mapping, so 15.0 data wins where it
    exists)."""
    if assigned_15:
        return chr(cp).casefold()
    import regex._regex as rx
    import regex._regex_core as rc

    return rx.fold_case(rc.UNICODE_ENCODING | rc.FULL_CASE_FOLDING, chr(cp))


def recover_case_pairs(cats17: list[int], assigned_15: list[bool]):
    """Simple case maps for post-15.0 cased letters via get_all_cases.

    Post-15.0 bicameral additions (Garay, ...) are one-to-one pairs: a
    cased codepoint whose case orbit has exactly two members, one Lu/Lt
    and one Ll by the 17.0 categories. Returns (upper_extra, lower_extra,
    title_extra) as {cp: mapped}."""
    import regex._regex as rx
    import regex._regex_core as rc

    lu, lt, ll = CAT_INDEX["Lu"], CAT_INDEX["Lt"], CAT_INDEX["Ll"]
    upper_x: dict[int, int] = {}
    lower_x: dict[int, int] = {}
    title_x: dict[int, int] = {}
    for cp in range(MAX_CP):
        if assigned_15[cp] or cats17[cp] not in (lu, lt, ll):
            continue
        orbit = rx.get_all_cases(rc.UNICODE_ENCODING, cp)
        others = [c for c in orbit if c != cp]
        if len(others) != 1:
            continue  # not a simple pair — skip rather than guess
        other = others[0]
        if cats17[cp] == ll and cats17[other] in (lu, lt):
            upper_x[cp] = other
            title_x[cp] = other
        elif cats17[cp] in (lu, lt) and cats17[other] == ll:
            lower_x[cp] = other
    return upper_x, lower_x, title_x


def detect_missing_decomps(all_text: str, have_decomp: set[int], have_compat: set[int]):
    """Codepoints whose 17.0 NFD/NFKD quick-check is No but whose
    decomposition mapping is absent from the 15.0 data — an explicit
    unknowns list (the mapping itself is not recoverable offline)."""
    missing_nfd = []
    missing_nfkd = []
    for s, e in _property_ranges(r"\p{NFD_Quick_Check=No}", all_text):
        for cp in range(s, e):
            if cp not in have_decomp and not (0xAC00 <= cp <= 0xD7A3):
                missing_nfd.append(cp)
    for s, e in _property_ranges(r"\p{NFKD_Quick_Check=No}", all_text):
        for cp in range(s, e):
            if (cp not in have_compat and cp not in have_decomp
                    and not (0xAC00 <= cp <= 0xD7A3)):
                missing_nfkd.append(cp)
    return missing_nfd, missing_nfkd


def generate_script_tables():
    """Per-codepoint script ids (reference enum) as RLE ranges, plus
    identifier-property sets, derived from the `regex` module's Unicode data."""
    import regex

    all_text = "".join(chr(cp) for cp in range(MAX_CP))
    script_ids = [0] * MAX_CP  # UNKNOWN
    available = 0
    for sid, name in enumerate(REFERENCE_SCRIPTS):
        if sid == 0 or name == "KATAKANA_OR_HIRAGANA":
            continue
        try:
            ranges = _property_ranges(rf"\p{{Script={name}}}", all_text)
        except regex.error:
            continue  # script newer than the regex module's Unicode version
        available += 1
        for s, e in ranges:
            for cp in range(s, e):
                script_ids[cp] = sid

    ident = {}
    for key, pat in (
        ("xid_start", r"\p{XID_Start}"),
        ("xid_continue", r"\p{XID_Continue}"),
        ("pattern_syntax", r"\p{Pattern_Syntax}"),
        ("pattern_ws", r"\p{Pattern_White_Space}"),
    ):
        ident[key] = _property_ranges(pat, all_text)

    # block ids from the regex module's enumeration (canonical names only)
    import regex._regex_core as rc

    block_map = rc.PROPERTIES["BLOCK"][1]
    block_ids = [0] * MAX_CP
    seen_ids = {}
    for name, bid in block_map.items():
        if bid in seen_ids or bid == 0:
            continue
        seen_ids[bid] = name
        try:
            ranges = _property_ranges(rf"\p{{Block={name}}}", all_text)
        except regex.error:
            continue
        for s, e in ranges:
            for cp in range(s, e):
                block_ids[cp] = bid

    return script_ids, block_ids, ident, available, seen_ids


# UAX #29 segmentation property enums (ids are OURS — stable across data
# sources; gen queries the `regex` module's Unicode tables per named value)
GCB_VALUES = [
    "OTHER", "CONTROL", "LF", "CR", "EXTEND", "PREPEND", "SPACINGMARK",
    "L", "V", "T", "ZWJ", "LV", "LVT", "REGIONAL_INDICATOR",
]
WB_VALUES = [
    "OTHER", "CR", "LF", "NEWLINE", "EXTEND", "ZWJ", "REGIONAL_INDICATOR",
    "FORMAT", "KATAKANA", "HEBREW_LETTER", "ALETTER", "SINGLE_QUOTE",
    "DOUBLE_QUOTE", "MIDNUMLET", "MIDLETTER", "MIDNUM", "NUMERIC",
    "EXTENDNUMLET", "WSEGSPACE",
]
SB_VALUES = [
    "OTHER", "CR", "LF", "EXTEND", "SEP", "FORMAT", "SP", "LOWER", "UPPER",
    "OLETTER", "NUMERIC", "ATERM", "STERM", "CLOSE", "SCONTINUE",
]


def generate_segmentation_tables():
    """Per-codepoint UAX #29 break classes + Extended_Pictographic and
    Indic_Conjunct_Break sets, from the `regex` module's Unicode data."""
    import regex

    all_text = "".join(chr(cp) for cp in range(MAX_CP))

    def classes(prop: str, values: list[str]) -> list[int]:
        out = [0] * MAX_CP
        for vid, name in enumerate(values):
            if vid == 0:
                continue
            try:
                ranges = _property_ranges(rf"\p{{{prop}={name}}}", all_text)
            except regex.error:
                continue
            for s, e in ranges:
                for cp in range(s, e):
                    out[cp] = vid
        return out

    gcb = classes("Grapheme_Cluster_Break", GCB_VALUES)
    wb = classes("Word_Break", WB_VALUES)
    sb = classes("Sentence_Break", SB_VALUES)
    extpict = _property_ranges(r"\p{Extended_Pictographic}", all_text)
    incb = [0] * MAX_CP  # 0 none, 1 consonant, 2 extend, 3 linker
    for vid, name in ((1, "Consonant"), (2, "Extend"), (3, "Linker")):
        try:
            for s, e in _property_ranges(rf"\p{{Indic_Conjunct_Break={name}}}", all_text):
                for cp in range(s, e):
                    incb[cp] = vid
        except regex.error:
            pass
    return gcb, wb, sb, extpict, incb


def rle(values) -> list[tuple[int, int]]:
    out = []
    prev = values[0]
    start = 0
    for cp in range(1, len(values)):
        if values[cp] != prev:
            out.append((start, prev))
            start, prev = cp, values[cp]
    out.append((start, prev))
    return out


def _ref_properties() -> dict | None:
    """The reference decoder.wasm's exact per-cp script/category runs,
    extracted by scripts/gen_ref_property_data.py from the exhaustive
    oracle sweep.  None when the data file is absent."""
    import json

    path = Path(__file__).resolve().parent.parent / "data" / "ref_properties.json"
    if not path.exists():
        return None
    return json.loads(path.read_text())


def _expand_runs(runs: list, n: int) -> list[int]:
    out = [0] * n
    for i, (start, value) in enumerate(runs):
        end = runs[i + 1][0] if i + 1 < len(runs) else n
        for cp in range(start, min(end, n)):
            out[cp] = value
    return out


def main(out_path: str) -> None:
    assigned_15 = [unicodedata.category(chr(cp)) != "Cn" for cp in range(MAX_CP)]
    ref_props = _ref_properties()
    try:
        all_text = "".join(chr(cp) for cp in range(MAX_CP))
        cats = generate_categories_17(all_text)
        data_version = "17.0"
    except ImportError:
        all_text = None
        cats = [CAT_INDEX[unicodedata.category(chr(cp))] for cp in range(MAX_CP)]
        data_version = unicodedata.unidata_version
    if ref_props is not None:
        # adopt the reference's exact category assignments (sweep-extracted
        # Unicode 17.0 data) — classification parity by construction
        cats = _expand_runs(ref_props["category"], MAX_CP)
        data_version = "17.0 (reference-extracted)"
    classes = [char_class(cp, CATEGORIES[cats[cp]]) for cp in range(MAX_CP)]

    # RLE category ranges
    cat_ranges = []
    prev = cats[0]
    start = 0
    for cp in range(1, MAX_CP):
        if cats[cp] != prev:
            cat_ranges.append((start, prev))
            start, prev = cp, cats[cp]
    cat_ranges.append((start, prev))

    # class pages: 256-cp pages with dedup
    PAGE = 256
    pages = []
    page_map = {}
    page_index = []
    for base in range(0, MAX_CP, PAGE):
        key = bytes(classes[base : base + PAGE])
        if key not in page_map:
            page_map[key] = len(pages)
            pages.append(key)
        page_index.append(page_map[key])

    # decomposition (15.0 mappings — see module docstring) + CCC (17.0)
    if all_text is not None:
        ccc17 = generate_ccc_17(all_text)
    else:
        ccc17 = [unicodedata.combining(chr(cp)) for cp in range(MAX_CP)]
    decomp_entries = []  # (cp, offset, len)
    decomp_pool: list[int] = []
    ccc_entries = []
    for cp in range(MAX_CP):
        if 0xAC00 <= cp <= 0xD7A3:
            continue
        d = full_canonical_decomposition(cp)
        if d:
            decomp_entries.append((cp, len(decomp_pool), len(d)))
            decomp_pool.extend(d)
        if ccc17[cp]:
            ccc_entries.append((cp, ccc17[cp]))

    # compatibility (NFKD) decomposition, fully expanded
    compat_entries = []  # (cp, offset, len)
    compat_pool: list[int] = []
    for cp in range(MAX_CP):
        d = full_compat_decomposition(cp)
        if d:
            compat_entries.append((cp, len(compat_pool), len(d)))
            compat_pool.extend(d)

    # canonical composition pairs (exclusions handled by verification)
    comp_entries = []
    for cp in range(MAX_CP):
        if 0xAC00 <= cp <= 0xD7A3:
            continue
        d = unicodedata.decomposition(chr(cp))
        if not d or d.startswith("<"):
            continue
        parts = [int(x, 16) for x in d.split()]
        if len(parts) != 2:
            continue
        a, b = parts
        if unicodedata.normalize("NFC", chr(a) + chr(b)) == chr(cp):
            comp_entries.append(((a << 21) | b, cp))
    # post-15.0 pairs that recompose under the reference's NFC
    for cp in EXTRA_COMPOSING:
        a, b = EXTRA_CANONICAL[cp]
        comp_entries.append(((a << 21) | b, cp))
    comp_entries.sort()

    # simple case maps as (cp, mapped) sparse sorted tables
    def case_table(fn):
        out = []
        for cp in range(MAX_CP):
            try:
                m = fn(cp)
            except Exception:  # noqa: BLE001
                continue
            if len(m) == 1 and ord(m) != cp:
                out.append((cp, ord(m)))
        return out

    fold_fn = (lambda cp: fold_17(cp, assigned_15[cp])) if all_text is not None \
        else (lambda cp: chr(cp).casefold())
    upper = case_table(lambda cp: chr(cp).upper())
    lower = case_table(lambda cp: chr(cp).lower())
    title = case_table(lambda cp: chr(cp).title()[0] if chr(cp).title() else chr(cp))
    fold = case_table(fold_fn)

    # post-15.0 bicameral pairs recovered from the 17.0 case orbits
    if all_text is not None:
        upper_x, lower_x, title_x = recover_case_pairs(cats, assigned_15)
        upper = sorted(set(upper) | set(upper_x.items()))
        lower = sorted(set(lower) | set(lower_x.items()))
        title = sorted(set(title) | set(title_x.items()))

    if ref_props is not None and "case" in ref_props:
        # adopt the reference's exact simple case maps (sweep-extracted
        # Unicode 17.0 SpecialCasing-free mappings)
        upper = [tuple(e) for e in ref_props["case"]["upper"]]
        lower = [tuple(e) for e in ref_props["case"]["lower"]]
        title = [tuple(e) for e in ref_props["case"]["title"]]
        fold = [tuple(e) for e in ref_props["case"]["fold"]]

    # full case maps: only the multi-codepoint expansions (ß -> "ss", ﬁ ->
    # "fi" under fold, etc.); the C side falls back to the simple tables
    def full_case_table(fn, pool):
        out = []
        for cp in range(MAX_CP):
            try:
                m = fn(cp)
            except Exception:  # noqa: BLE001
                continue
            if len(m) > 1:
                out.append((cp, len(pool), len(m)))
                pool.extend(ord(c) for c in m)
        return out

    full_pool: list[int] = []
    full_upper = full_case_table(lambda cp: chr(cp).upper(), full_pool)
    full_lower = full_case_table(lambda cp: chr(cp).lower(), full_pool)
    full_title = full_case_table(lambda cp: chr(cp).title(), full_pool)
    full_fold = full_case_table(fold_fn, full_pool)

    # UTS #39 confusable prototypes — the reference's exact table, extracted
    # from decoder.wasm and oracle-verified (scripts/extract_confusables.py;
    # provenance in unicode/data/ref_confusables.json).
    import json as _json

    _conf_path = Path(__file__).resolve().parent.parent / "data" / "ref_confusables.json"
    _conf_data = _json.loads(_conf_path.read_text())["entries"]
    confusables: dict[int, int] = {int(k): v for k, (v, _plen) in _conf_data.items()}
    confusable_lens: dict[int, int] = {int(k): _plen for k, (_v, _plen) in _conf_data.items()}
    confusables = dict(sorted(confusables.items()))

    try:
        script_ids, block_ids, ident, n_scripts, block_names = generate_script_tables()
    except ImportError:
        script_ids = block_ids = None
        ident = {}
        n_scripts = 0
        block_names = {}
    if ref_props is not None:
        # adopt the reference's exact script assignments (range-based over
        # unassigned cps too — feeds is_suspicious's mixed-script clause)
        script_ids = _expand_runs(ref_props["script"], MAX_CP)
    script_ranges = rle(script_ids) if script_ids else [(0, 0)]
    block_ranges = rle(block_ids) if block_ids else [(0, 0)]

    # identifier predicates: the REFERENCE's own (range-generalized) sets
    # drive decoder_is_identifier_*; the true UAX #31 XID sets survive as
    # decoder_is_xid_* extras
    ident["xid_start_uax"] = ident.get("xid_start", [])
    ident["xid_continue_uax"] = ident.get("xid_continue", [])
    if ref_props is not None and "identifier_start" in ref_props:
        ident["xid_start"] = [(a, b + 1) for a, b in ref_props["identifier_start"]]
        ident["xid_continue"] = [(a, b + 1) for a, b in ref_props["identifier_continue"]]

    # post-15.0 decompositions we cannot source offline: detect + report
    if all_text is not None:
        missing_nfd, missing_nfkd = detect_missing_decomps(
            all_text, {e[0] for e in decomp_entries}, {e[0] for e in compat_entries}
        )
    else:
        missing_nfd, missing_nfkd = [], []

    try:
        gcb, wb, sb, extpict, incb = generate_segmentation_tables()
        seg_ranges = {
            "Gcb": rle(gcb), "Wb": rle(wb), "Sb": rle(sb), "Incb": rle(incb),
        }
        extpict_ranges = extpict
    except ImportError:
        seg_ranges = {k: [(0, 0)] for k in ("Gcb", "Wb", "Sb", "Incb")}
        extpict_ranges = []

    def fmt_u32(vals, per_line=12):
        lines = []
        for i in range(0, len(vals), per_line):
            lines.append(",".join(str(v) for v in vals[i : i + per_line]))
        return ",\n".join(lines)

    with open(out_path, "w") as f:
        w = f.write
        w("// Auto-generated by gen_tables.py — do not edit.\n")
        w(f"// Properties/classification: Unicode {data_version} (regex module); "
          f"normalization mappings: CPython unicodedata {unicodedata.unidata_version}\n")
        w("#pragma once\n#include <cstdint>\n\n")
        w(f'inline constexpr const char* kUnicodeVersion = "{data_version}";\n\n')
        w(f"// Codepoints with 17.0 NFD/NFKD QC=No whose decomposition mapping is\n")
        w(f"// not in the offline 15.0 data (explicit unknowns; empty = full parity):\n")
        w(f"inline constexpr uint32_t kMissingDecompCount = {len(missing_nfd)};\n")
        w("inline constexpr uint32_t kMissingDecompCp[] = {\n")
        w(fmt_u32(missing_nfd or [0]))
        w("};\n")
        w(f"inline constexpr uint32_t kMissingCompatDecompCount = {len(missing_nfkd)};\n")
        w("inline constexpr uint32_t kMissingCompatDecompCp[] = {\n")
        w(fmt_u32(missing_nfkd or [0]))
        w("};\n\n")

        w(f"inline constexpr uint32_t kCatRangeCount = {len(cat_ranges)};\n")
        w("inline constexpr uint32_t kCatRangeStart[] = {\n")
        w(fmt_u32([s for s, _ in cat_ranges]))
        w("};\n")
        w("inline constexpr uint8_t kCatRangeValue[] = {\n")
        w(fmt_u32([v for _, v in cat_ranges]))
        w("};\n\n")

        w(f"inline constexpr uint32_t kClassPageCount = {len(pages)};\n")
        w("inline constexpr uint8_t kClassPages[][256] = {\n")
        for pg in pages:
            w("{" + ",".join(str(b) for b in pg) + "},\n")
        w("};\n")
        w("inline constexpr uint16_t kClassPageIndex[] = {\n")
        w(fmt_u32(page_index, per_line=20))
        w("};\n\n")

        w(f"inline constexpr uint32_t kDecompCount = {len(decomp_entries)};\n")
        w("inline constexpr uint32_t kDecompCp[] = {\n")
        w(fmt_u32([e[0] for e in decomp_entries]))
        w("};\n")
        w("inline constexpr uint32_t kDecompOffLen[] = {\n")  # offset<<8 | len
        w(fmt_u32([(e[1] << 8) | e[2] for e in decomp_entries]))
        w("};\n")
        w(f"inline constexpr uint32_t kDecompPoolSize = {len(decomp_pool)};\n")
        w("inline constexpr uint32_t kDecompPool[] = {\n")
        w(fmt_u32(decomp_pool))
        w("};\n\n")

        # post-15.0 cps inert under the reference's NFC/NFKC (its composing
        # pipeline lacks their mappings; oracle-verified)
        inert = sorted(cp for cp in EXTRA_CANONICAL if cp not in EXTRA_COMPOSING)
        w(f"inline constexpr uint32_t kNfcInertCount = {len(inert)};\n")
        w("inline constexpr uint32_t kNfcInertCp[] = {\n")
        w(fmt_u32(inert or [0]))
        w("};\n\n")

        # reference decoder_decompose view: SINGLE-LEVEL canonical entries
        # (sweep-extracted; ours is fully recursive internally for NFD)
        ref_decomp = ref_props.get("decomp", []) if ref_props is not None else []
        w(f"inline constexpr uint32_t kRefDecompCount = {len(ref_decomp)};\n")
        w("inline constexpr uint32_t kRefDecompCp[] = {\n")
        w(fmt_u32([e[0] for e in ref_decomp] or [0]))
        w("};\n")
        w("inline constexpr uint32_t kRefDecompC0[] = {\n")
        w(fmt_u32([e[1] for e in ref_decomp] or [0]))
        w("};\n")
        w("inline constexpr uint32_t kRefDecompC1[] = {\n")  # 0 = absent
        w(fmt_u32([(e[2] if len(e) > 2 else 0) for e in ref_decomp] or [0]))
        w("};\n\n")

        w(f"inline constexpr uint32_t kCompatCount = {len(compat_entries)};\n")
        w("inline constexpr uint32_t kCompatCp[] = {\n")
        w(fmt_u32([e[0] for e in compat_entries]))
        w("};\n")
        w("inline constexpr uint32_t kCompatOffLen[] = {\n")  # offset<<8 | len
        w(fmt_u32([(e[1] << 8) | e[2] for e in compat_entries]))
        w("};\n")
        w(f"inline constexpr uint32_t kCompatPoolSize = {len(compat_pool)};\n")
        w("inline constexpr uint32_t kCompatPool[] = {\n")
        w(fmt_u32(compat_pool))
        w("};\n\n")

        w(f"inline constexpr uint32_t kCccCount = {len(ccc_entries)};\n")
        w("inline constexpr uint32_t kCccCp[] = {\n")
        w(fmt_u32([e[0] for e in ccc_entries]))
        w("};\n")
        w("inline constexpr uint8_t kCccValue[] = {\n")
        w(fmt_u32([e[1] for e in ccc_entries]))
        w("};\n\n")

        w(f"inline constexpr uint32_t kCompCount = {len(comp_entries)};\n")
        w("inline constexpr uint64_t kCompKey[] = {\n")
        w(fmt_u32([e[0] for e in comp_entries]))
        w("};\n")
        w("inline constexpr uint32_t kCompValue[] = {\n")
        w(fmt_u32([e[1] for e in comp_entries]))
        w("};\n\n")

        w(f"// scripts: {n_scripts} of {len(REFERENCE_SCRIPTS)} reference scripts resolved\n")
        w(f"inline constexpr uint32_t kScriptRangeCount = {len(script_ranges)};\n")
        w("inline constexpr uint32_t kScriptRangeStart[] = {\n")
        w(fmt_u32([s for s, _ in script_ranges]))
        w("};\n")
        w("inline constexpr uint16_t kScriptRangeValue[] = {\n")
        w(fmt_u32([v for _, v in script_ranges]))
        w("};\n\n")

        w(f"inline constexpr uint32_t kBlockRangeCount = {len(block_ranges)};\n")
        w("inline constexpr uint32_t kBlockRangeStart[] = {\n")
        w(fmt_u32([s for s, _ in block_ranges]))
        w("};\n")
        w("inline constexpr uint16_t kBlockRangeValue[] = {\n")
        w(fmt_u32([v for _, v in block_ranges]))
        w("};\n\n")

        for key, cname in (
            ("xid_start", "XidStart"),
            ("xid_continue", "XidContinue"),
            ("xid_start_uax", "XidStartUax"),
            ("xid_continue_uax", "XidContinueUax"),
            ("pattern_syntax", "PatternSyntax"),
            ("pattern_ws", "PatternWs"),
        ):
            ranges = ident.get(key, [])
            w(f"inline constexpr uint32_t k{cname}Count = {len(ranges)};\n")
            w(f"inline constexpr uint32_t k{cname}Start[] = {{\n")
            w(fmt_u32([s for s, _ in ranges] or [0]))
            w("};\n")
            w(f"inline constexpr uint32_t k{cname}End[] = {{\n")
            w(fmt_u32([e for _, e in ranges] or [0]))
            w("};\n\n")

        for name, tab in (("Upper", upper), ("Lower", lower), ("Title", title), ("Fold", fold)):
            w(f"inline constexpr uint32_t k{name}Count = {len(tab)};\n")
            w(f"inline constexpr uint32_t k{name}Cp[] = {{\n")
            w(fmt_u32([e[0] for e in tab]))
            w("};\n")
            w(f"inline constexpr uint32_t k{name}Map[] = {{\n")
            w(fmt_u32([e[1] for e in tab]))
            w("};\n\n")

        # full (multi-codepoint) case maps, shared pool
        for name, tab in (
            ("FullUpper", full_upper),
            ("FullLower", full_lower),
            ("FullTitle", full_title),
            ("FullFold", full_fold),
        ):
            w(f"inline constexpr uint32_t k{name}Count = {len(tab)};\n")
            w(f"inline constexpr uint32_t k{name}Cp[] = {{\n")
            w(fmt_u32([e[0] for e in tab] or [0]))
            w("};\n")
            w(f"inline constexpr uint32_t k{name}OffLen[] = {{\n")  # offset<<8 | len
            w(fmt_u32([(e[1] << 8) | e[2] for e in tab] or [0]))
            w("};\n\n")
        w(f"inline constexpr uint32_t kFullCasePoolSize = {len(full_pool)};\n")
        w("inline constexpr uint32_t kFullCasePool[] = {\n")
        w(fmt_u32(full_pool or [0]))
        w("};\n\n")

        # UAX #29 segmentation classes (RLE) + property sets
        for name, ranges in seg_ranges.items():
            w(f"inline constexpr uint32_t k{name}RangeCount = {len(ranges)};\n")
            w(f"inline constexpr uint32_t k{name}RangeStart[] = {{\n")
            w(fmt_u32([s for s, _ in ranges]))
            w("};\n")
            w(f"inline constexpr uint8_t k{name}RangeValue[] = {{\n")
            w(fmt_u32([v for _, v in ranges]))
            w("};\n\n")
        w(f"inline constexpr uint32_t kExtPictCount = {len(extpict_ranges)};\n")
        w("inline constexpr uint32_t kExtPictStart[] = {\n")
        w(fmt_u32([s for s, _ in extpict_ranges] or [0]))
        w("};\n")
        w("inline constexpr uint32_t kExtPictEnd[] = {\n")
        w(fmt_u32([e for _, e in extpict_ranges] or [0]))
        w("};\n\n")

        # UTS #39 confusable prototype map (reference's exact extracted table)
        w(f"inline constexpr uint32_t kConfusableCount = {len(confusables)};\n")
        w("inline constexpr uint32_t kConfusableCp[] = {\n")
        w(fmt_u32(list(confusables.keys()) or [0]))
        w("};\n")
        w("inline constexpr uint32_t kConfusableSkel[] = {\n")
        w(fmt_u32(list(confusables.values()) or [0]))
        w("};\n")
        w("inline constexpr uint8_t kConfusableProtoLen[] = {\n")
        w(fmt_u32([confusable_lens[cp] for cp in confusables] or [0]))
        w("};\n\n")

        # is_suspicious extra singleton ranges (reference-extracted; ends
        # exclusive to match in_range_set)
        _susp_path = Path(__file__).resolve().parent.parent / "data" / "ref_suspicious_extra.json"
        susp_ranges = (
            _json.loads(_susp_path.read_text())["ranges"] if _susp_path.exists() else []
        )
        w(f"inline constexpr uint32_t kSuspExtraCount = {len(susp_ranges)};\n")
        w("inline constexpr uint32_t kSuspExtraStart[] = {\n")
        w(fmt_u32([a for a, _b in susp_ranges] or [0]))
        w("};\n")
        w("inline constexpr uint32_t kSuspExtraEnd[] = {\n")
        w(fmt_u32([b + 1 for _a, b in susp_ranges] or [0]))
        w("};\n\n")

        # normalization quick-check per-cp tri-state (MAYBE=0 YES=1 NO=2),
        # sweep-extracted run tables, one per form (NFC NFD NFKC NFKD)
        qc = ref_props.get("quick_check", {}) if ref_props is not None else {}
        for form in range(4):
            runs = qc.get(str(form), [[0, 1]])
            w(f"inline constexpr uint32_t kQcCount{form} = {len(runs)};\n")
            w(f"inline constexpr uint32_t kQcStart{form}[] = {{\n")
            w(fmt_u32([s for s, _ in runs]))
            w("};\n")
            w(f"inline constexpr uint8_t kQcVal{form}[] = {{\n")
            w(fmt_u32([v for _, v in runs]))
            w("};\n")
        w("\n")

        # script / block display names — the reference's exact strings
        # (sweep-extracted TitleCase) when available
        if ref_props is not None and "script_names" in ref_props:
            script_names = ref_props["script_names"]
        else:
            script_names = [s for s in REFERENCE_SCRIPTS]
        w(f"inline constexpr uint32_t kScriptNameCount = {len(script_names)};\n")
        w("inline constexpr const char* kScriptNames[] = {\n")
        for s in script_names:
            w(f'  "{s}",\n')
        w("};\n\n")
        max_bid = max(block_names.keys(), default=0)
        names_by_id = [""] * (max_bid + 1)
        for bid, nm in block_names.items():
            names_by_id[bid] = nm
        w(f"inline constexpr uint32_t kBlockNameCount = {len(names_by_id)};\n")
        w("inline constexpr const char* kBlockNames[] = {\n")
        for nm in names_by_id:
            w(f'  "{nm}",\n')
        w("};\n\n")

        # reference block table: [start cp, name] runs (get_block_name
        # takes a CODEPOINT in the reference ABI)
        ref_blocks = ref_props.get("blocks", []) if ref_props is not None else []
        uniq_names: list[str] = []
        name_idx: dict[str, int] = {}
        idxs = []
        for _start, nm in ref_blocks:
            if nm not in name_idx:
                name_idx[nm] = len(uniq_names)
                uniq_names.append(nm)
            idxs.append(name_idx[nm])
        w(f"inline constexpr uint32_t kRefBlockCount = {len(ref_blocks)};\n")
        w("inline constexpr uint32_t kRefBlockStart[] = {\n")
        w(fmt_u32([s for s, _ in ref_blocks] or [0]))
        w("};\n")
        w("inline constexpr uint16_t kRefBlockNameIdx[] = {\n")
        w(fmt_u32(idxs or [0]))
        w("};\n")
        w("inline constexpr const char* kRefBlockNames[] = {\n")
        for nm in uniq_names or [""]:
            w(f'  "{nm}",\n')
        w("};\n\n")

    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else str(Path(__file__).parent / "unicode_tables.h")
    main(out)
