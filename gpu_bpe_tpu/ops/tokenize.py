"""TPU bulk tokenization: greedy longest-match with chunk semantics.

TPU-native re-design of the reference's three inference kernels
(tokenize.wgsl: trie_tokenizer_chunked / trie_prefix_sum /
trie_tokenizer_compact). The GPU walks a pointer-based trie one byte at a
time per thread; pointer chasing is hostile to the TPU's (8,128) vector unit
(measured XLA gathers: ~10 ns/element), so the work is restructured into
dense passes:

1. **Match table** (replaces the trie walk): for every input position p,
   compute the longest token that matches at p AND ends within p's chunk —
   all positions in parallel. Tokens are grouped by byte length; each length
   is an exact vectorized join of packed substring key words against that
   length's vocab keys, processed in position chunks so the [chunk, V]
   equality tile stays on-chip.
2. **Chunk walk** (replaces per-thread greedy scan): all chunks advance in
   lockstep, one emitted token per step per chunk — exactly the reference's
   greedy semantics, including the token-split-at-chunk-boundary artifact
   and the raw-byte fallback (tokenize.wgsl:167-172).
3. **Compaction** (replaces prefix-sum + compact kernels): per-chunk counts,
   host-side concatenation (tokens are read back to the host regardless).

Conformance anchor: core/encoder_ref.py GreedyTrieEncoder (tested equal).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import INVALID_TOKEN, adaptive_chunk_size

_PAD_TOKEN = np.uint32(INVALID_TOKEN)  # never a real id (ids are 16-bit)
_SCAN_UNROLL = 16  # chunk offsets consumed per scan step (amortizes loop overhead)
_PAGE_TOKENS = 1 << 21  # u16 tokens per device->host fetch page (4 MB)

# Above this many multi-byte tokens the O(vocab)-per-position dense join is
# replaced by the sorted interval-stabbing join (O((N+V) log) regardless of
# vocab size) for token lengths 2..32; longer tokens stay on the dense join.
_DENSE_VOCAB_CUTOFF = 2048
_STAB_MAX_LEN = 8  # stab level 1 covers lengths 2..8 (8-byte sort keys)
_GROUP_DEPTH = _STAB_MAX_LEN + 1  # overlay slot carrying the prefix-group id
# Levels k >= 2 each cover 6 more bytes of token length: the
# (group id, 6-byte window) key packs into 16+48 = 64 bits = TWO sort
# words + the packed flag word — the same 3-operand sort as level 1. A
# wider window needs a 4th sort operand, whose compile time explodes on
# TPU (measured ~20 min per shape vs ~1 min for 3 operands). Chaining
# levels instead: distinct prefixes at each level boundary become exact-
# equality "group" rows whose 16-bit gid seeds the next level's key —
# level k covers lengths (8 + 6(k-2), 8 + 6(k-1)].
_STAB_MAX_SUFFIX = 6
_LVL_GROUP_DEPTH = _STAB_MAX_SUFFIX + 1  # level-k overlay slot for gids
_STAB_MAX_LEVELS = 5  # coverage cap: 8 + 6*4 = 32 bytes
# A stab level costs two O(N log N) sorts regardless of how few tokens it
# serves; below this many remaining tokens the O(N*V) dense join is
# cheaper, so the chain truncates and the tail lengths go dense (e.g. a
# real 8K vocab has ~10 tokens past 14 bytes — not worth a level).
_LEVEL_MIN_TOKENS = 512
_NO_GROUP = np.uint32(0xFFFF)  # group ids are 16-bit (asserted)
_RANK_MIN_N = 1 << 20  # rank-space level chain only pays off on big passes


def _tokenize_use_pallas() -> bool:
    """Tokenizer Pallas gate (trace-time, NOT cached): TPU backend and no
    kill switch. GPU_BPE_TPU_NO_TOKENIZE_PALLAS=1 disables BOTH tokenizer
    Pallas uses (PAD-strip compaction + rank-space level chain) — bench.py
    sets it when the on-device selftest flags these kernels."""
    import os

    if os.environ.get("GPU_BPE_TPU_NO_TOKENIZE_PALLAS"):
        return False
    from .train_step import _use_pallas

    return _use_pallas()


def _rank_use_pallas() -> bool:
    """Rank-space level chain gate (trace-time): the Pallas compaction /
    expansion kernels require a TPU backend; GPU_BPE_TPU_STAB_RANK=0 is
    the escape hatch back to the full-width chain."""
    import os

    if os.environ.get("GPU_BPE_TPU_STAB_RANK") == "0":
        return False
    return _tokenize_use_pallas()


def _stab_coverage(n_levels: int) -> int:
    """Longest token length served by an n-level stab join."""
    return _STAB_MAX_LEN + _STAB_MAX_SUFFIX * max(0, n_levels - 1)


def _pack_keys(token: bytes) -> np.ndarray:
    """Big-endian packed u32 key words for a token's bytes (host side)."""
    ln = len(token)
    n_words = (ln + 3) // 4
    padded = np.zeros(n_words * 4, dtype=np.uint32)
    padded[:ln] = np.frombuffer(token, dtype=np.uint8)
    w = padded.reshape(n_words, 4)
    return ((w[:, 0] << 24) | (w[:, 1] << 16) | (w[:, 2] << 8) | w[:, 3]).astype(np.uint32)


@dataclass
class MatchTables:
    """Per-length vocab key tables for the vectorized longest-match join."""

    lengths: list[int]
    keys: dict[int, np.ndarray]  # length -> [V_l, n_words] u32
    ids: dict[int, np.ndarray]  # length -> [V_l] i32
    max_token_len: int
    byte_ids: np.ndarray  # [256] id of the single-byte token or -1
    byte_ids_identity: bool  # True when byte_ids[b] == b for all b
    stab: dict | None  # interval rows for lengths 2..14 (large vocabs)
    dense_lengths: list[int]  # lengths served by the dense join

    @classmethod
    def from_vocab(cls, vocab: list[bytes]) -> "MatchTables":
        by_len: dict[int, dict[bytes, int]] = {}
        max_len = 1
        byte_ids = np.full(256, -1, dtype=np.int32)
        n_multi = 0
        for token_id, entry in enumerate(vocab):
            entry = bytes(entry)
            if not entry:
                continue
            max_len = max(max_len, len(entry))
            if len(entry) == 1:
                byte_ids[entry[0]] = token_id  # later duplicates overwrite (trie.js:56)
            else:
                by_len.setdefault(len(entry), {})[entry] = token_id
                n_multi += 1
        lengths = sorted(by_len)
        keys = {ln: np.stack([_pack_keys(t) for t in ents]) for ln, ents in by_len.items()}
        ids = {ln: np.array(list(ents.values()), dtype=np.int32) for ln, ents in by_len.items()}
        use_stab = n_multi > _DENSE_VOCAB_CUTOFF
        stab = _stab_vocab_rows(vocab) if use_stab else None
        if stab is not None and stab["count"] == 0:
            stab = None
        dense_lengths = [ln for ln in lengths if ln > stab["max_len"]] if stab else lengths
        return cls(
            lengths=lengths,
            keys=keys,
            ids=ids,
            max_token_len=max_len,
            byte_ids=byte_ids,
            byte_ids_identity=bool((byte_ids == np.arange(256)).all()),
            stab=stab,
            dense_lengths=dense_lengths,
        )


def _stab_vocab_rows(vocab: list[bytes]) -> dict:
    """Host-side interval rows for the chained multi-level stab join.

    Level 1 (lengths 2..8): open key = bytes padded 0x00, close key = bytes
    padded 0xFF (8 bytes as 2 big-endian u32 words). A token v is a prefix
    of a position's 8-byte window w iff open(v) <= w <= close(v) — prefix
    intervals nest, so the sorted stream of opens/positions/closes is a
    balanced-parens structure.

    Levels k >= 2 (lengths 8+6(k-2)+1 .. 8+6(k-1)): each long token splits
    into a prefix of length ``base = 8 + 6(k-2)`` and a 1..6-byte suffix.
    Distinct prefixes become *group* rows in level k-1 (pseudo-depth
    ``_GROUP_DEPTH`` in level 1, ``_LVL_GROUP_DEPTH`` after) with
    open == close == the level's window (exact-equality interval), carrying
    a compact 16-bit group id. The level-k join then matches
    (gid<<16 | 6-byte window at pos+base) against that level's interval
    rows — the same balanced-parens structure per group, with depth =
    suffix length, packed into two u32 key words so EVERY sort stays
    3-operand (multi-operand sort compile time explodes with operand count
    on TPU: a 4th operand measured ~20x). The chain covers token lengths
    up to ``_stab_coverage(_STAB_MAX_LEVELS)`` = 32 bytes; longer tokens
    (absent from real trained vocabs) fall back to the dense join.

    Row counts are padded to powers of two with inert rows (max key,
    depth-0 close) so every model reuses the same compiled-shape ladder."""
    max_cov = _stab_coverage(_STAB_MAX_LEVELS)
    opens, closes, lns, ids = [], [], [], []
    long_toks: list[tuple[int, bytes]] = []  # stab-served tokens, len > 8
    for token_id, entry in enumerate(vocab):
        entry = bytes(entry)
        if 2 <= len(entry) <= _STAB_MAX_LEN:
            o = np.frombuffer(entry + b"\x00" * (8 - len(entry)), dtype=np.uint8)
            c = np.frombuffer(entry + b"\xff" * (8 - len(entry)), dtype=np.uint8)
            opens.append(o)
            closes.append(c)
            lns.append(len(entry))
            ids.append(token_id)
        elif _STAB_MAX_LEN < len(entry) <= max_cov:
            long_toks.append((token_id, entry))

    # truncate the chain where a level no longer earns its two sorts:
    # chain level k+1 only while > _LEVEL_MIN_TOKENS tokens remain beyond
    # the current coverage (the dense join serves the dropped tail)
    n_levels = 1
    while _stab_coverage(n_levels) < max_cov:
        beyond = sum(1 for _t, e in long_toks if len(e) > _stab_coverage(n_levels))
        if beyond == 0 or beyond < _LEVEL_MIN_TOKENS:
            break
        n_levels += 1
    # group ids are u16: a level whose seeding prefixes would overflow the
    # cap truncates the chain there (the dropped tail is served by the
    # dense join — correct, just slower; only pathological vocabs with
    # tens of thousands of distinct long-token prefixes hit this). A
    # single downward pass is conservative: shrinking n_levels only
    # shrinks the token set, hence every group count.
    for k in range(1, n_levels):
        cov = _stab_coverage(k)
        hi = _stab_coverage(n_levels)
        n_groups = len({e[:cov] for _t, e in long_toks if cov < len(e) <= hi})
        if n_groups >= 0xFFFF:
            n_levels = k
            break
    stab_max = _stab_coverage(n_levels)
    long_toks = [(t, e) for t, e in long_toks if len(e) <= stab_max]

    # group chain: distinct 8-byte prefixes seed level 2
    groups: dict[bytes, int] = {}
    for _tid, entry in long_toks:
        groups.setdefault(entry[:_STAB_MAX_LEN], len(groups))
    assert len(groups) < 0xFFFF, "group-cap truncation above must prevent this"
    if not opens and not groups:
        return {"count": 0}

    def pack8(b):  # [V, 8] bytes -> 2 big-endian u32 words
        w = b.reshape(-1, 2, 4)
        return (w[:, :, 0] << 24) | (w[:, :, 1] << 16) | (w[:, :, 2] << 8) | w[:, :, 3]

    # level-1 rows: short tokens + prefix-group rows (exact-equality
    # intervals at pseudo-depth _GROUP_DEPTH, payload = gid)
    for prefix, gid in groups.items():
        pb = np.frombuffer(prefix, dtype=np.uint8)
        opens.append(pb)
        closes.append(pb)
        lns.append(_GROUP_DEPTH)
        ids.append(gid)
    v = len(lns)
    vpad = 1 << max(8, (v - 1).bit_length())
    pad = vpad - v
    ob = np.concatenate([np.stack(opens), np.full((pad, 8), 255, np.uint8)]).astype(np.uint32)
    cb = np.concatenate([np.stack(closes), np.full((pad, 8), 255, np.uint8)]).astype(np.uint32)
    out = {
        "count": vpad,
        "open_words": pack8(ob),  # [V, 2] u32
        "close_words": pack8(cb),
        "ln": np.concatenate([np.array(lns, np.uint32), np.zeros(pad, np.uint32)]),
        "id": np.concatenate([np.array(ids, np.uint32), np.zeros(pad, np.uint32)]),
        "n_groups": len(groups),  # gates the packed 2-operand restore sort
        "levels": [],
        "max_len": _STAB_MAX_LEN,  # raised below as levels are added
    }

    # levels k >= 2: suffix-interval rows within the prefix group, plus
    # next-level group rows, packed as (gid<<16 | b0<<8 | b1, b2..b5)
    remaining = long_toks
    prev_groups = groups
    k = 2
    while remaining:
        base = _stab_coverage(k - 1)
        l_gids: list[int] = []
        l_bytes: list[tuple[bytes, bytes]] = []  # (open6, close6) suffix windows
        l_lns: list[int] = []
        l_ids: list[int] = []
        for token_id, entry in remaining:
            if len(entry) <= base + _STAB_MAX_SUFFIX:
                suffix = entry[base:]
                padn = _STAB_MAX_SUFFIX - len(suffix)
                l_gids.append(prev_groups[entry[:base]])
                l_bytes.append((suffix + b"\x00" * padn, suffix + b"\xff" * padn))
                l_lns.append(len(suffix))
                l_ids.append(token_id)
        next_toks = [(tid, e) for tid, e in remaining if len(e) > base + _STAB_MAX_SUFFIX]
        next_groups: dict[bytes, int] = {}
        for _tid, entry in next_toks:
            p = entry[: base + _STAB_MAX_SUFFIX]
            if p not in next_groups:
                next_groups[p] = len(next_groups)
                win = p[base:]
                l_gids.append(prev_groups[p[:base]])
                l_bytes.append((win, win))  # exact-equality group interval
                l_lns.append(_LVL_GROUP_DEPTH)
                l_ids.append(next_groups[p])
        assert len(next_groups) < 0xFFFF, "group-cap truncation above must prevent this"

        lv = len(l_ids)
        lpad_to = 1 << max(8, (lv - 1).bit_length())
        lpad = lpad_to - lv
        gid_arr = np.concatenate([np.array(l_gids, np.uint32), np.full(lpad, 0xFFFF, np.uint32)])
        lob = np.concatenate(
            [np.frombuffer(b"".join(o for o, _ in l_bytes), dtype=np.uint8).reshape(lv, 6),
             np.full((lpad, _STAB_MAX_SUFFIX), 255, np.uint8)]
        ).astype(np.uint32)
        lcb = np.concatenate(
            [np.frombuffer(b"".join(c for _, c in l_bytes), dtype=np.uint8).reshape(lv, 6),
             np.full((lpad, _STAB_MAX_SUFFIX), 255, np.uint8)]
        ).astype(np.uint32)

        def pack6(b):  # [V, 6] bytes + gids -> [V, 2] u32 key words
            w0 = (gid_arr << 16) | (b[:, 0] << 8) | b[:, 1]
            w1 = (b[:, 2] << 24) | (b[:, 3] << 16) | (b[:, 4] << 8) | b[:, 5]
            return np.stack([w0, w1], axis=1)

        out["levels"].append(
            {
                "count": lpad_to,
                "open": pack6(lob),
                "close": pack6(lcb),
                "ln": np.concatenate([np.array(l_lns, np.uint32), np.zeros(lpad, np.uint32)]),
                "id": np.concatenate([np.array(l_ids, np.uint32), np.zeros(lpad, np.uint32)]),
                "n_groups": len(next_groups),
            }
        )
        remaining = next_toks
        prev_groups = next_groups
        k += 1
    out["max_len"] = _stab_coverage(1 + len(out["levels"]))
    return out


_SEG_MIN_ROWS = 1 << 16  # smallest join worth the replication overhead


def _seg_shape(rows: int, v2: int) -> tuple[int, int]:
    """Segmented sort-join shape: split ``rows`` position rows into
    ``nseg`` contiguous segments of ``S`` and replicate the ``v2`` static
    vocab rows into each, sorting [nseg, S + v2] along the minor axis.
    The TPU sort network's depth scales ~log^2(length) and it pads each
    sorted length to a power of two internally — so S is chosen to make
    S + v2 EXACTLY a power of two (callers pad the position stream to
    nseg*S with inert max-key rows; <1% waste vs the up-to-2x internal
    padding a naive split pays). Measured at 16M rows / 8K vocab:
    unsegmented 305 ms -> pow2-divisor segments 168 ms -> exact-fit
    segments cut the join sorts roughly in half again.
    Returns (1, rows) when segmentation doesn't apply (small inputs or
    GPU_BPE_TPU_STAB_SEG=0); GPU_BPE_TPU_STAB_SEG=<bits> pins
    S = 2^bits - v2 (tuning escape hatch)."""
    import os

    env = os.environ.get("GPU_BPE_TPU_STAB_SEG")
    if env == "0":
        return 1, rows
    if env:  # an explicit pin overrides the small-input floor
        s = (1 << int(env)) - v2
        nseg = -(-rows // s)
        return (nseg, s) if s > 0 and nseg >= 2 else (1, rows)
    if rows < _SEG_MIN_ROWS:
        return 1, rows
    best = None
    for k in range(16, 23):
        m = 1 << k
        s = m - v2
        if s <= m // 2 or s >= rows:  # >50% replication, or one segment
            continue
        nseg = -(-rows // s)
        cost = nseg * m * k * k  # total bitonic compare-volume model
        if best is None or cost < best[0]:
            best = (cost, nseg, s)
    if best is None or best[1] < 2:
        return 1, rows
    return best[1], best[2]


def _k3(flag, ln, pay):
    """Packed third key word: flag (major: opens < positions < closes) |
    depth | payload. Keeps the sort narrow — multi-operand sorts compile
    catastrophically slowly on TPU."""
    return (flag << jnp.uint32(30)) | (ln << jnp.uint32(25)) | pay


_GID_SENTINEL = 0x1FFF  # 13-bit no-group marker in the packed restore word


def _pack_restore(packed, gid, sub: int):
    """(deepest-fit packed, group id) -> ONE u32 restore payload, making
    the position-restore sort 2-operand instead of 3 (sort cost scales
    with operand count). Layout: len-code (3b: packed_len - sub, 0 = no
    match) | vocab id (16b) | gid (13b, 0x1FFF = no group). Only valid
    when the level's group count is < 0x1FFF — callers gate on the stab
    table's ``n_groups`` and keep the 3-operand sort otherwise."""
    code = jnp.where(packed > 0, (packed >> jnp.uint32(16)) - jnp.uint32(sub), jnp.uint32(0))
    idf = packed & jnp.uint32(0xFFFF)
    g = jnp.where(gid == _NO_GROUP, jnp.uint32(_GID_SENTINEL), gid)
    return (code << jnp.uint32(29)) | (idf << jnp.uint32(13)) | g


def _unpack_restore(combo, sub: int):
    code = combo >> jnp.uint32(29)
    idf = (combo >> jnp.uint32(13)) & jnp.uint32(0xFFFF)
    g = combo & jnp.uint32(_GID_SENTINEL)
    packed = jnp.where(code > 0, ((code + jnp.uint32(sub)) << jnp.uint32(16)) | idf, jnp.uint32(0))
    gid = jnp.where(g == _GID_SENTINEL, _NO_GROUP, g)
    return packed, gid


def _overlay_mode() -> str:
    """Overlay-scan execution mode (trace-time): "pallas" = the streaming
    ops.stab_kernels.overlay_fit kernel (TPU default — the XLA doubling
    scan was the single biggest stage of the tokenize pass, 57.7 ms of
    169 ms at 16 MB), "interpret" = interpreted Pallas (CPU test hook via
    GPU_BPE_TPU_STAB_SCAN=interpret), "xla" = the doubling scan
    (GPU_BPE_TPU_STAB_SCAN=0 escape hatch, and any shape the kernel does
    not serve)."""
    import os

    env = os.environ.get("GPU_BPE_TPU_STAB_SCAN")
    if env == "0":
        return "xla"
    if env == "interpret":
        return "interpret"
    return "pallas" if _tokenize_use_pallas() else "xla"


def _overlay_fit_dispatch(skp, m: int, depths: int, input_len, chunk_size: int,
                          base_len: int, max_depth: int, group_depth: int):
    """(packed, key2, gid) for a sorted stream — Pallas streaming scan on
    TPU, XLA doubling scan otherwise. ``skp`` is [nseg, m] or [m]; results
    match bitwise (tests/test_ops_tokenize.py::TestOverlayKernel).
    ``gid`` is None when ``group_depth`` < 0."""
    from .stab_kernels import SBLK

    mode = _overlay_mode()
    if mode != "xla" and m % SBLK == 0:
        from .stab_kernels import overlay_fit

        skp2 = skp if skp.ndim == 2 else skp[None, :]
        packed, key2, gid = overlay_fit(
            skp2, input_len, chunk_size=chunk_size, depths=depths,
            base_len=base_len, max_depth=max_depth, group_depth=group_depth,
            interpret=mode == "interpret",
        )
        if skp.ndim == 1:
            packed, key2, gid = packed[0], key2[0], gid[0]
        return packed, key2, (gid if group_depth >= 0 else None)

    sflag = skp >> jnp.uint32(30)
    vals, openb, spay = _paren_overlay(sflag, skp, m, depths)
    packed = _deepest_fit(vals, openb, spay, sflag, input_len, chunk_size,
                          base_len, max_depth)
    key2 = jnp.where(sflag == 1, spay, jnp.uint32(0xFFFFFFFF))
    if group_depth < 0:
        return packed, key2, None
    in_group = ((openb >> jnp.uint32(group_depth)) & 1) == 1
    gid = jnp.where(in_group & (sflag == 1),
                    vals[group_depth].astype(jnp.uint32), _NO_GROUP)
    return packed, key2, gid


def _paren_overlay(sflag, skp, m: int, depths: int):
    """Balanced-parens overlay scan over a sorted open/position/close
    stream: inclusive Hillis-Steele doubling scan that propagates, per
    depth, the payload of the innermost enclosing open. Returns
    (vals [depths, m] u16 payloads, openb [m] u32 per-depth open bits,
    spay [m] u32 raw payloads).

    ``vals`` is laid out [depths, m] — m minor — so every array tiles the
    (8, 128) vector registers densely; the [m, depths] orientation pads
    the ~10-wide minor dimension to 128 lanes (measured ~12x slower).

    ``sflag``/``skp`` may carry a leading segment dim ([nseg, m]; the scan
    runs along the minor axis per segment) — ``m`` is the minor length."""
    sln = (skp >> jnp.uint32(25)) & jnp.uint32(0x1F)
    spay = skp & jnp.uint32(0x1FFFFFF)
    depth = lax.broadcasted_iota(jnp.uint32, (depths,) + (1,) * sflag.ndim, 0)
    is_open = sflag == 0
    is_close = sflag == 2
    mod = jnp.where(is_open | is_close, jnp.uint32(1) << sln, 0)
    openb = jnp.where(is_open, jnp.uint32(1) << sln, 0)
    vals = jnp.where(
        (sln[None] == depth) & is_open[None], spay[None], 0
    ).astype(jnp.uint16)

    # identity op has mod == 0, so left-padding with zeros is a no-op prefix
    def shift_down(x, s):
        pad = jnp.zeros(x.shape[:-1] + (s,), x.dtype)
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)

    s = 1
    while s < m:
        pv, po, pm = shift_down(vals, s), shift_down(openb, s), shift_down(mod, s)
        bmod_d = ((mod[None] >> depth) & 1) == 1
        vals = jnp.where(bmod_d, vals, pv)
        openb = (po & ~mod) | (openb & mod)
        mod = pm | mod
        s <<= 1
    return vals, openb, spay


def _deepest_fit(vals, openb, spay, sflag, input_len, chunk_size: int,
                 base_len: int, max_depth: int):
    """Per-position extraction: the deepest open depth whose token (of
    length ``base_len + depth``) still fits within the position's chunk.
    Returns packed (len << 16 | id) per sorted row, 0 where no match.
    ``vals`` is [depths, m] (m minor — see _paren_overlay); a leading
    segment dim on ``openb``/``spay``/``sflag`` broadcasts through."""
    depth = lax.broadcasted_iota(jnp.uint32, (vals.shape[0],) + (1,) * sflag.ndim, 0)
    pos_i = spay.astype(jnp.int32)
    cend = jnp.minimum((pos_i // chunk_size + 1) * chunk_size, input_len)
    d_i = depth.astype(jnp.int32)
    fits = base_len + d_i <= (cend - pos_i)[None]
    openable = (
        (((openb[None] >> depth) & 1) == 1)
        & fits
        & (sflag == 1)[None]
        & (d_i <= max_depth)
    )
    best_d = jnp.max(jnp.where(openable, d_i, 0), axis=0)
    best_id = jnp.max(
        jnp.where(openable & (d_i == best_d[None]), vals.astype(jnp.int32), 0),
        axis=0,
    )
    return jnp.where(
        (sflag == 1) & (best_d > 0),
        ((base_len + best_d).astype(jnp.uint32) << 16) | best_id.astype(jnp.uint32),
        0,
    )


def _stab_match(
    data_u32: jax.Array,
    stab: dict,
    input_len: jax.Array,
    chunk_size: int,
    rank_mode: str | None = None,
):
    """Longest in-chunk match per position for token lengths 2..32 via the
    chained sorted interval-stabbing join — O(L*(N+V) log(N+V)) independent
    of vocab size (the dense join is O(N*V) and serves only longer tokens).
    Returns packed (len << 16 | id) per position, 0 where no match.

    Level 1: one 3-key sort orders vocab opens (flag 0), positions (flag
    1), and vocab closes (flag 2) by 8-byte key; a balanced-parens overlay
    scan then gives each position its deepest in-chunk prefix of length
    2..8 AND (at pseudo-depth 9) the group id of its exact 8-byte window
    when some longer token starts with it. Each level k >= 2 repeats the
    pattern 6 bytes further in: a 3-key sort of (gid<<16 | 6-byte window
    at pos+base, flag) against that level's suffix-interval rows resolves
    lengths base+1..base+6 with depth = suffix length, and (at pseudo-
    depth 7) yields the NEXT level's group id — every sort stays 3-operand
    (a 4th operand multiplies TPU sort compile time ~20x). A 1-key sort
    per level restores position order. No gathers anywhere.

    ``rank_mode`` picks the levels>=2 execution space: None = auto (rank
    space on TPU for large passes, full-width otherwise), "off" = force
    full-width, "on"/"interpret" = force rank space (compiled/interpreted
    Pallas) — the test hook for exercising the rank path off-TPU.
    """
    n = data_u32.shape[0]
    assert n < (1 << 25), "single pass capped at 2^25 positions (payload packing)"
    levels = stab.get("levels", [])
    n_shift = _STAB_MAX_LEN + _STAB_MAX_SUFFIX * len(levels)
    shifted = [jnp.roll(data_u32, -k) for k in range(n_shift)]

    def pack_words(base):
        return [
            (shifted[base + w * 4] << 24) | (shifted[base + w * 4 + 1] << 16)
            | (shifted[base + w * 4 + 2] << 8) | shifted[base + w * 4 + 3]
            for w in range(2)
        ]

    pw = pack_words(0)
    iota = lax.broadcasted_iota(jnp.uint32, (n,), 0)

    v = stab["count"]
    ow = jnp.asarray(stab["open_words"])
    cw = jnp.asarray(stab["close_words"])
    vln = jnp.asarray(stab["ln"])
    vid = jnp.asarray(stab["id"])

    # Segmented join (see _seg_shape): positions split into contiguous
    # segments, vocab rows replicated per segment, every sort/scan along
    # the minor axis — exact by construction (matching is per-position
    # against the static vocab; windows were packed from the full stream).
    nseg, seg = _seg_shape(n, 2 * v)
    if nseg > 1:
        # pad the position stream to nseg*seg with inert rows (max key,
        # max position payload — no chunk fit, sliced off before the
        # levels chain) so segments tile exactly
        padn = nseg * seg

        def cat(p, o, c, fill):
            if padn > n:
                p = jnp.concatenate([p, jnp.full((padn - n,), fill, p.dtype)])
            return jnp.concatenate(
                [p.reshape(nseg, seg),
                 jnp.broadcast_to(o, (nseg, v)),
                 jnp.broadcast_to(c, (nseg, v))], axis=-1)

        def take(x):
            return x[..., :seg].reshape(padn)[:n]

        m = seg + 2 * v
    else:
        def cat(p, o, c, fill):
            return jnp.concatenate([p, o, c])

        def take(x):
            return x[:n]

        m = n + 2 * v
    k0 = cat(pw[0], ow[:, 0], cw[:, 0], jnp.uint32(0xFFFFFFFF))
    k1 = cat(pw[1], ow[:, 1], cw[:, 1], jnp.uint32(0xFFFFFFFF))
    kp = cat(
        _k3(jnp.uint32(1), jnp.uint32(0), iota),
        _k3(jnp.uint32(0), vln, vid),
        _k3(jnp.uint32(2), vln, vid),
        _k3(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0x1FFFFFF)),
    )

    _, _, skp = lax.sort((k0, k1, kp), num_keys=3)

    depths = _GROUP_DEPTH + 1 if levels else _STAB_MAX_LEN + 1
    packed, key2, gid = _overlay_fit_dispatch(
        skp, m, depths, input_len, chunk_size, 0, _STAB_MAX_LEN,
        _GROUP_DEPTH if levels else -1,
    )

    # restore position order (vocab rows sort to the tail and are sliced
    # off; within a segment positions are a contiguous global range, so a
    # per-segment sort on global position restores order exactly)
    if not levels:
        _, packed_sorted = lax.sort((key2, packed), num_keys=1)
        return take(packed_sorted)

    # position's prefix-group id (exact 8-byte window match), or _NO_GROUP.
    # With few groups (every real vocab) the restore rides ONE packed
    # payload word — a 2-operand sort instead of 3.
    if stab.get("n_groups", _GID_SENTINEL) < _GID_SENTINEL:
        _, combo_sorted = lax.sort((key2, _pack_restore(packed, gid, 1)), num_keys=1)
        result, gid_pos = _unpack_restore(take(combo_sorted), 1)
    else:
        _, packed_sorted, gid_sorted = lax.sort((key2, packed, gid), num_keys=1)
        result = take(packed_sorted)
        gid_pos = take(gid_sorted)

    # ── levels k >= 2: (gid, 6-byte window at pos+base) vs that level's
    # suffix-interval rows, packed into TWO key words (gid<<16 | b0<<8 |
    # b1, b2..b5) so every sort stays 3-operand like level 1. On TPU the
    # level chain runs in RANK SPACE: only positions holding a group id
    # participate, so they're stream-compacted to a C = n/8 row space
    # (with window bytes riding as payloads), the per-level sorts run at
    # C instead of n, and one expansion scatters the results back —
    # O(L*(C log C + n)) instead of O(L * n log n). A lax.cond falls back
    # to the full-width chain on the (pathological) corpora where more
    # than n/8 positions carry a group id, so results are always exact. ──
    def _lvl_join(sw0, sw1, pos_pay, lvl, base: int, last: bool):
        """One chained-level join over an arbitrary row stream (position
        space or rank space). ``pos_pay`` is each row's true position (the
        chunk-fit test and the restore sort ride it). Returns
        (packed, gid_next) in row order; gid_next is None for the last
        level."""
        rows = sw0.shape[0]
        lv = lvl["count"]
        low = jnp.asarray(lvl["open"])
        lcw = jnp.asarray(lvl["close"])
        lln = jnp.asarray(lvl["ln"])
        lid = jnp.asarray(lvl["id"])
        # segmented like level 1 (restore stays exact: live rank rows are
        # in increasing-position order per contiguous segment, garbage
        # rows carry max payloads and their order is inert)
        nseg2, seg2 = _seg_shape(rows, 2 * lv)
        if nseg2 > 1:
            padr = nseg2 * seg2

            def cat2(p, o, c, fill):
                if padr > rows:
                    p = jnp.concatenate([p, jnp.full((padr - rows,), fill, p.dtype)])
                return jnp.concatenate(
                    [p.reshape(nseg2, seg2),
                     jnp.broadcast_to(o, (nseg2, lv)),
                     jnp.broadcast_to(c, (nseg2, lv))], axis=-1)

            def take2(x):
                return x[..., :seg2].reshape(padr)[:rows]

            m2 = seg2 + 2 * lv
        else:
            def cat2(p, o, c, fill):
                return jnp.concatenate([p, o, c])

            def take2(x):
                return x[:rows]

            m2 = rows + 2 * lv
        g0 = cat2(sw0, low[:, 0], lcw[:, 0], jnp.uint32(0xFFFFFFFF))
        g1 = cat2(sw1, low[:, 1], lcw[:, 1], jnp.uint32(0xFFFFFFFF))
        gp = cat2(
            _k3(jnp.uint32(1), jnp.uint32(0), pos_pay),
            _k3(jnp.uint32(0), lln, lid),
            _k3(jnp.uint32(2), lln, lid),
            _k3(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0x1FFFFFF)),
        )
        _, _, skp2 = lax.sort((g0, g1, gp), num_keys=3)
        depths2 = _LVL_GROUP_DEPTH + 1 if not last else _STAB_MAX_SUFFIX + 1
        packed2, key2b, gid2 = _overlay_fit_dispatch(
            skp2, m2, depths2, input_len, chunk_size, base, _STAB_MAX_SUFFIX,
            -1 if last else _LVL_GROUP_DEPTH,
        )
        if last:
            _, packed2_sorted = lax.sort((key2b, packed2), num_keys=1)
            return take2(packed2_sorted), None
        if lvl.get("n_groups", _GID_SENTINEL) < _GID_SENTINEL:
            _, combo_sorted = lax.sort(
                (key2b, _pack_restore(packed2, gid2, base)), num_keys=1
            )
            p2, g2 = _unpack_restore(take2(combo_sorted), base)
            return p2, g2
        _, packed2_sorted, gid2_sorted = lax.sort((key2b, packed2, gid2), num_keys=1)
        return take2(packed2_sorted), take2(gid2_sorted)

    def _levels_chain(gid0, sw_bytes, pos_pay):
        """All levels >= 2 over one row stream: max packed contribution.
        ``sw_bytes[li] = (b0b1, sw1)`` are each level's window bytes."""
        rows = gid0.shape[0]
        contrib = jnp.zeros(rows, jnp.uint32)
        gid_cur = gid0
        for li, lvl in enumerate(levels):
            b0b1, sw1 = sw_bytes[li]
            sw0 = (gid_cur << jnp.uint32(16)) | b0b1
            packed2, gid_nxt = _lvl_join(
                sw0, sw1, pos_pay, lvl, _stab_coverage(li + 1),
                li == len(levels) - 1,
            )
            # a level-k match is strictly longer than any earlier level's
            contrib = jnp.maximum(contrib, packed2)
            gid_cur = gid_nxt
        return contrib

    # per-level window bytes in position space (shift-packed, no gathers)
    sw_bytes_pos = []
    for li in range(len(levels)):
        base = _stab_coverage(li + 1)
        sw_bytes_pos.append((
            (shifted[base] << jnp.uint32(8)) | shifted[base + 1],
            (shifted[base + 2] << jnp.uint32(24)) | (shifted[base + 3] << jnp.uint32(16))
            | (shifted[base + 4] << jnp.uint32(8)) | shifted[base + 5],
        ))

    if rank_mode == "off" or (
        rank_mode is None and not (_rank_use_pallas() and n >= _RANK_MIN_N)
    ):
        return jnp.maximum(result, _levels_chain(gid_pos, sw_bytes_pos, iota))

    # ── rank-space chain (TPU): compact candidates once, chain at C ──
    from .pallas_kernels import compact_mask, expand_to_mask

    interpret = rank_mode == "interpret"
    mask = gid_pos != _NO_GROUP
    prim = jnp.where(mask, gid_pos, jnp.uint32(0xFFFFFFFF))
    extras = [iota]
    for b0b1, sw1 in sw_bytes_pos:
        extras += [b0b1, sw1]
    outs, cnt = compact_mask(prim, extras, interpret=interpret)

    def _rank_branch(cap: int):
        # rows past cnt are garbage: give them max keys and a position
        # payload past any real position (n < 2^25) so they sort to the
        # tail of every join and restore; their matches are inert anyway
        # (pos beyond input_len -> no chunk fit -> packed 0, not
        # enclosed -> gid NO_GROUP)
        gid_r = outs[0][:cap]
        iota_c = lax.broadcasted_iota(jnp.uint32, (cap,), 0)
        live = iota_c < cnt.astype(jnp.uint32)
        pos_r = jnp.where(live, outs[1][:cap], jnp.uint32(0x1FFFFFF))
        sw_bytes_rank = [
            (
                jnp.where(live, outs[2 + 2 * li][:cap], jnp.uint32(0xFFFFFFFF)),
                jnp.where(live, outs[3 + 2 * li][:cap], jnp.uint32(0xFFFFFFFF)),
            )
            for li in range(len(levels))
        ]

        def branch():
            contrib_r = _levels_chain(
                jnp.where(live, gid_r, _NO_GROUP), sw_bytes_rank, pos_r
            )
            return expand_to_mask(mask, contrib_r, interpret=interpret)

        return branch

    # Two-tier capacity: group candidates are rare on real text (~1-3% of
    # positions hold an exact long-token prefix), so the common case runs
    # the level joins at n/32; denser corpora fall to n/8, and only truly
    # pathological inputs pay the full-width chain. Each tier is exact —
    # the cond choice is never visible in outputs.
    cap_small = min(n, max(n >> 5, 1 << 15))
    cap_big = min(n, max(n >> 3, 1 << 15))
    full = lambda: _levels_chain(gid_pos, sw_bytes_pos, iota)
    if cap_small < cap_big:
        contribution = lax.cond(
            cnt <= cap_small,
            _rank_branch(cap_small),
            lambda: lax.cond(cnt <= cap_big, _rank_branch(cap_big), full),
        )
    else:
        contribution = lax.cond(cnt <= cap_big, _rank_branch(cap_big), full)
    return jnp.maximum(result, contribution)


def build_match_table(
    data: jax.Array,
    tables: MatchTables,
    input_len: jax.Array,
    chunk_size: int,
    rank_mode: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Longest in-chunk match per position: (match_id i32 [N], match_len i32 [N]).

    ``match_id`` is -1 where nothing (not even a single-byte token) matches —
    the walk then emits the raw byte (reference fallback).
    """
    n = data.shape[0]
    data_u32 = data.astype(jnp.uint32)
    iota = lax.broadcasted_iota(jnp.int32, (n,), 0)
    chunk_end = jnp.minimum((iota // chunk_size + 1) * chunk_size, input_len)

    # ── length-1 matches ──
    if tables.byte_ids_identity:
        match_id = jnp.where(iota < input_len, data_u32.astype(jnp.int32), -1)
    else:
        # rare (imported vocab missing byte tokens): 256-way select via join
        bids = jnp.asarray(tables.byte_ids)
        eq = data_u32[:, None] == jnp.arange(256, dtype=jnp.uint32)[None, :]
        match_id = jnp.where(iota < input_len, jnp.max(jnp.where(eq, bids[None, :], -1), axis=1), -1)
    match_len = jnp.where(match_id >= 0, 1, 0)

    # ── interval-stabbing join for lengths 2..16 (large vocabs) ──
    if tables.stab is not None:
        packed = _stab_match(data_u32, tables.stab, input_len, chunk_size, rank_mode)
        s_ln = (packed >> 16).astype(jnp.int32)
        s_id = (packed & jnp.uint32(0xFFFF)).astype(jnp.int32)
        hit = s_ln > 0
        match_id = jnp.where(hit, s_id, match_id)
        match_len = jnp.where(hit, s_ln, match_len)

    if not tables.dense_lengths:
        return match_id, match_len

    # ── packed substring key words (shift-based, no gather) ──
    max_words = (max(tables.dense_lengths) + 3) // 4
    shifted = [jnp.roll(data_u32, -k) for k in range(max_words * 4)]
    sub_words = jnp.stack(
        [
            (shifted[w * 4] << 24) | (shifted[w * 4 + 1] << 16) | (shifted[w * 4 + 2] << 8) | shifted[w * 4 + 3]
            for w in range(max_words)
        ],
        axis=1,
    )  # [N, max_words]

    # ── per-length exact joins, chunked over positions ──
    vkeys = {ln: jnp.asarray(tables.keys[ln]) for ln in tables.dense_lengths}
    vids = {ln: jnp.asarray(tables.ids[ln]) for ln in tables.dense_lengths}

    def join_chunk(args):
        sub_c, id_c, len_c, iota_c, cend_c = args
        for ln in tables.dense_lengths:  # ascending: longer matches overwrite
            n_words = (ln + 3) // 4
            rem = ln - (n_words - 1) * 4
            eq = sub_c[:, 0][:, None] == vkeys[ln][None, :, 0] if n_words >= 1 else None
            for w in range(1, n_words):
                sw = sub_c[:, w]
                if w == n_words - 1 and rem < 4:
                    sw = sw & jnp.uint32(0xFFFFFFFF << ((4 - rem) * 8) & 0xFFFFFFFF)
                eq &= sw[:, None] == vkeys[ln][None, :, w]
            if n_words == 1 and rem < 4:
                sw = sub_c[:, 0] & jnp.uint32(0xFFFFFFFF << ((4 - rem) * 8) & 0xFFFFFFFF)
                eq = sw[:, None] == vkeys[ln][None, :, 0]
            hit = eq.any(axis=1)
            hit_id = jnp.max(jnp.where(eq, vids[ln][None, :], -1), axis=1)
            hit &= iota_c + ln <= cend_c  # must end within the chunk AND input
            id_c = jnp.where(hit, hit_id, id_c)
            len_c = jnp.where(hit, ln, len_c)
        return id_c, len_c

    # One fused pass over all positions: XLA folds the [N, V_l] equality
    # tiles into the max-reductions without materializing them, and a single
    # op avoids lax.map's ~0.2 ms/iteration loop overhead (which dominated
    # at 1024 position chunks).
    return join_chunk((sub_words, match_id, match_len, iota, chunk_end))


def chunk_walk(
    match_id: jax.Array,
    match_len: jax.Array,
    data: jax.Array,
    input_len: jax.Array,
    chunk_size: int,
):
    """Greedy emission per chunk, all chunks in lockstep.

    The per-thread trie walk of the reference (tokenize.wgsl:123-166) is a
    chain of data-dependent jumps — poison for a vector unit if implemented
    with gathers (measured ~5 MB/s). Instead: because every jump is at most
    ``max_token_len`` bytes, the walk is a ``lax.scan`` over the chunk-local
    offset t with one u32 carry per chunk, bit k meaning "an emission is
    scheduled at offset t+k". Each step consumes bit 0, emits the
    position-aligned token (or PAD), and schedules the next emission by
    OR-ing ``1 << step`` — no gathers, no history, ~6 VPU ops per step on a
    [C]-wide lane vector.

    Returns (tokens [C, chunk_size] u32 position-aligned with PAD holes,
    counts [C] i32). Flattening the non-PAD entries of ``tokens`` row-major
    reproduces the reference's exact output order.
    """
    n = match_id.shape[0]
    num_chunks = n // chunk_size
    assert match_len is not None

    matched = match_id >= 0
    tok = jnp.where(matched, match_id, data.astype(jnp.int32)).astype(jnp.uint32)
    # jump distance, clamped to the u32 schedule window (the dispatcher
    # routes vocabs with max_token_len > 31 to chunk_walk_wide / _gather)
    step = jnp.clip(jnp.where(matched, match_len, 1), 1, 31).astype(jnp.uint32)
    allowed = lax.broadcasted_iota(jnp.int32, (n,), 0) < input_len

    # [N] -> [chunk_size/U, U, C]: lax.scan feeds U offset-columns per step,
    # the python loop below unrolls them (cuts loop-iteration overhead 8x)
    u = _SCAN_UNROLL if chunk_size % _SCAN_UNROLL == 0 else 1

    def cols(x):
        return x.reshape(num_chunks, chunk_size // u, u).transpose(1, 2, 0)

    def body(pending, xs):
        tok_u, step_u, allowed_u, is_start_u = xs
        outs = []
        for k in range(u):
            emit = (((pending & 1) == 1) | is_start_u[k]) & allowed_u[k]
            sched = jnp.where(emit, jnp.uint32(1) << step_u[k], jnp.uint32(0))
            pending = (pending | sched) >> 1
            outs.append(jnp.where(emit, tok_u[k], _PAD_TOKEN))
        return pending, jnp.stack(outs)

    is_start = jnp.zeros((chunk_size // u, u, num_chunks), bool).at[0, 0].set(True)
    _, out = lax.scan(
        body,
        jnp.zeros((num_chunks,), jnp.uint32),
        (cols(tok), cols(step), cols(allowed), is_start),
    )
    # out: [chunk/U, U, C] -> [C, chunk_size] position-aligned
    tokens = out.reshape(chunk_size, num_chunks).T
    counts = jnp.sum(tokens != _PAD_TOKEN, axis=1, dtype=jnp.int32)
    return tokens, counts


def chunk_walk_wide(
    match_id: jax.Array,
    match_len: jax.Array,
    data: jax.Array,
    input_len: jax.Array,
    chunk_size: int,
):
    """``chunk_walk`` with a TWO-word (64-bit) emission schedule, for
    vocabs whose longest token is 32..63 bytes. Identical lockstep greedy
    semantics; the carry is (lo, hi) u32 pairs per chunk shifted as one
    64-bit window, so jump distances up to 63 stay gather-free (the old
    fallback dropped the whole walk to one gather per emitted token)."""
    n = match_id.shape[0]
    num_chunks = n // chunk_size

    matched = match_id >= 0
    tok = jnp.where(matched, match_id, data.astype(jnp.int32)).astype(jnp.uint32)
    step = jnp.clip(jnp.where(matched, match_len, 1), 1, 63).astype(jnp.uint32)
    allowed = lax.broadcasted_iota(jnp.int32, (n,), 0) < input_len

    u = _SCAN_UNROLL if chunk_size % _SCAN_UNROLL == 0 else 1

    def cols(x):
        return x.reshape(num_chunks, chunk_size // u, u).transpose(1, 2, 0)

    def body(carry, xs):
        lo, hi = carry
        tok_u, step_u, allowed_u, is_start_u = xs
        outs = []
        for k in range(u):
            emit = (((lo & 1) == 1) | is_start_u[k]) & allowed_u[k]
            s = step_u[k]
            lo = lo | jnp.where(emit & (s < 32), jnp.uint32(1) << s, jnp.uint32(0))
            hi = hi | jnp.where(
                emit & (s >= 32), jnp.uint32(1) << (s - 32), jnp.uint32(0)
            )
            lo = (lo >> 1) | ((hi & 1) << jnp.uint32(31))
            hi = hi >> 1
            outs.append(jnp.where(emit, tok_u[k], _PAD_TOKEN))
        return (lo, hi), jnp.stack(outs)

    is_start = jnp.zeros((chunk_size // u, u, num_chunks), bool).at[0, 0].set(True)
    zeros = jnp.zeros((num_chunks,), jnp.uint32)
    _, out = lax.scan(
        body,
        (zeros, zeros),
        (cols(tok), cols(step), cols(allowed), is_start),
    )
    tokens = out.reshape(chunk_size, num_chunks).T
    counts = jnp.sum(tokens != _PAD_TOKEN, axis=1, dtype=jnp.int32)
    return tokens, counts


def chunk_walk_gather(
    match_id: jax.Array,
    match_len: jax.Array,
    data: jax.Array,
    input_len: jax.Array,
    chunk_size: int,
):
    """Fallback greedy walk for vocabs with tokens longer than 31 bytes
    (outside the u32 schedule window of ``chunk_walk``). One gather-driven
    jump per step; correct for any token length but much slower."""
    n = match_id.shape[0]
    num_chunks = n // chunk_size
    c_iota = lax.broadcasted_iota(jnp.int32, (num_chunks,), 0)
    chunk_start = c_iota * chunk_size
    chunk_end = jnp.minimum(chunk_start + chunk_size, input_len)

    def cond(st):
        pos, _, _ = st
        return jnp.any(pos < chunk_end)

    def body(st):
        pos, step, toks = st
        active = pos < chunk_end
        safe = jnp.minimum(pos, n - 1)
        mid = match_id[safe]
        mlen = match_len[safe]
        matched = mid >= 0
        tok = jnp.where(matched, mid, data[safe].astype(jnp.int32)).astype(jnp.uint32)
        adv = jnp.maximum(jnp.where(matched, mlen, 1), 1)
        col = jnp.where(active, tok, _PAD_TOKEN)
        toks = lax.dynamic_update_slice(toks, col[:, None], (0, step))
        return (jnp.where(active, pos + adv, pos), step + 1, toks)

    init = (
        chunk_start,
        jnp.asarray(0, jnp.int32),
        jnp.full((num_chunks, chunk_size), _PAD_TOKEN, jnp.uint32),
    )
    _, _, tokens = lax.while_loop(cond, body, init)
    counts = jnp.sum(tokens != _PAD_TOKEN, axis=1, dtype=jnp.int32)
    return tokens, counts


class TPUTokenizer:
    """Bulk greedy tokenizer: match table + chunk walk on device.

    API parity with TrieTokenizer (tokenizer.js): adaptive chunk size
    ``max(512, min(2048, maxTokenLen*8))``, identical chunk-boundary
    behavior, raw-byte fallback, multi-pass slicing aligned to chunk size.
    """

    def __init__(
        self,
        vocab: list[bytes],
        chunk_size: int | None = None,
        max_pass_bytes: int = 1 << 25,
        rank_mode: str | None = None,
    ):
        self.vocab = [bytes(v) for v in vocab]
        self.tables = MatchTables.from_vocab(self.vocab)
        self.rank_mode = rank_mode  # levels>=2 execution space (see _stab_match)
        self.chunk_size = chunk_size or adaptive_chunk_size(self.tables.max_token_len)
        if self.tables.stab is not None:
            # the stab join packs position indices into 25 payload bits;
            # keep passes a power of two BELOW that bound
            max_pass_bytes = min(max_pass_bytes, 1 << 24)
        slice_bytes = max(max_pass_bytes, self.chunk_size)
        self.max_pass_bytes = (slice_bytes // self.chunk_size) * self.chunk_size
        self._encode_pass = jax.jit(self._encode_pass_impl)

    @classmethod
    def from_model(cls, model, **kw) -> "TPUTokenizer":
        return cls(model.vocab, **kw)

    def _encode_pass_impl(self, data_padded: jax.Array, input_len: jax.Array):
        mid, mlen = build_match_table(
            data_padded, self.tables, input_len, self.chunk_size, self.rank_mode
        )
        if self.tables.max_token_len <= 31:
            walk = chunk_walk
        elif self.tables.max_token_len <= 63:
            walk = chunk_walk_wide
        else:  # pathological vocabs only; one gather-driven jump per step
            walk = chunk_walk_gather
        tokens, _counts = walk(mid, mlen, data_padded, input_len, self.chunk_size)
        # Device-side compaction (the reference's trie_prefix_sum +
        # trie_tokenizer_compact, tokenize.wgsl:177-243): strip PAD holes
        # so the host reads back only real tokens — as u16 (ids are
        # 16-bit by design), halving the transfer. On TPU the strip is the
        # streaming Pallas displacement network (one O(N) pass); the XLA
        # stable sort remains as the CPU / escape-hatch path.
        flat = tokens.reshape(-1)
        valid = flat != _PAD_TOKEN
        total = jnp.sum(valid, dtype=jnp.int32)
        n = flat.shape[0]
        if _tokenize_use_pallas():
            from .pallas_kernels import compact_valid

            compacted, _ = compact_valid(flat)
            compact = compacted.astype(jnp.uint16)
        else:
            iot = lax.broadcasted_iota(jnp.uint32, (n,), 0)
            key = jnp.where(valid, iot, jnp.uint32(0xFFFFFFFF))
            _, compact = lax.sort((key, flat.astype(jnp.uint16)), num_keys=1)
        pad = (-n) % _PAGE_TOKENS
        if pad:
            compact = jnp.concatenate([compact, jnp.zeros((pad,), jnp.uint16)])
        return compact.reshape(-1, _PAGE_TOKENS), total

    def encode_bytes(self, data: bytes) -> np.ndarray:
        data = bytes(data)
        if not data:
            return np.zeros(0, dtype=np.uint32)
        # Passes are independent (chunk-aligned slices — the reference's
        # multi-pass slicing, tokenizer.js:181-203), so they round-robin
        # across every visible device: pure data parallelism, no
        # collectives, output identical to sequential passes. Single-chip
        # keeps the old behavior (window = 2: pass k+1 computes while pass
        # k's pages stream back over the slow host link). Dispatching ALL
        # passes up front would hold ~3x the corpus on device (input +
        # u16 pages per pass) and OOM multi-GB encodes; the window bounds
        # in-flight HBM to ~window passes.
        devices = self._devices()
        window = max(2, len(devices) + 1)
        parts: list[np.ndarray] = []
        in_flight: list[tuple[jax.Array, jax.Array]] = []
        for i, off in enumerate(range(0, len(data), self.max_pass_bytes)):
            dev = devices[i % len(devices)]
            in_flight.append(
                self._encode_single_pass(data[off : off + self.max_pass_bytes], dev)
            )
            if len(in_flight) >= window:
                parts.append(self._fetch_tokens(*in_flight.pop(0)))
        parts.extend(self._fetch_tokens(*p) for p in in_flight)
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    @staticmethod
    def _devices():
        """Devices for round-robin pass dispatch. Multi-device by default
        only on TPU (each device compiles its own copy of the pass — on
        the CPU test mesh that would 8x the suite's compile time);
        GPU_BPE_TPU_TOKENIZE_ALL_DEVICES=1/0 overrides either way."""
        import os

        try:
            devs = jax.devices()
        except Exception:  # pragma: no cover — backend init failure
            return [None]
        flag = os.environ.get("GPU_BPE_TPU_TOKENIZE_ALL_DEVICES")
        if flag == "1":
            return devs
        if flag == "0" or devs[0].platform not in ("tpu", "axon"):
            return devs[:1]
        return devs

    def _encode_single_pass(self, data: bytes, device=None):
        n = len(data)
        # power-of-two capacity buckets: a handful of compiled shapes serve
        # any input size (padding is masked out via input_len)
        cap = 1 << 16
        while cap < n:
            cap <<= 1
        cap = -(-cap // self.chunk_size) * self.chunk_size  # chunk-aligned
        buf = np.zeros(cap, dtype=np.uint8)
        buf[:n] = np.frombuffer(data, dtype=np.uint8)
        args = (jnp.asarray(buf), jnp.asarray(n, jnp.int32))
        if device is not None:
            args = jax.device_put(args, device)
        return self._encode_pass(*args)

    @staticmethod
    def _fetch_tokens(pages: jax.Array, total: jax.Array) -> np.ndarray:
        tot = int(total)
        n_pages = -(-tot // _PAGE_TOKENS) if tot else 0
        host = [np.asarray(pages[i]) for i in range(n_pages)]
        out = np.concatenate(host)[:tot] if host else np.zeros(0, np.uint16)
        return out.astype(np.uint32)

    def decode(self, tokens) -> bytes:
        from ..core.encoder_ref import decode_tokens

        return decode_tokens(tokens, self.vocab)
