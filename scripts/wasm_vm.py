"""Minimal WebAssembly MVP interpreter — runs the reference decoder.wasm
as a conformance ORACLE.

The reference ships its Unicode 17.0 engine only as a compiled wasm binary
(/root/reference/src/wasm/decoder.wasm; JS name map in decoder.js, API in
decoder.mjs).  No wasm runtime exists in this offline image, so this module
implements just enough of the WebAssembly spec to execute that one binary:

* full module parsing (type/import/function/table/memory/global/export/
  elem/code/data sections)
* a stack-machine interpreter: structured control flow pre-resolved to
  jump targets, i32/i64/f32/f64 numeric ops, all load/store widths,
  call / call_indirect, the 0xFC misc ops the binary uses
  (trunc_sat, memory.copy / memory.fill)
* the single emscripten import ``a.a`` = ``emscripten_resize_heap``
* an optional load-address trace hook (used by extract_confusables.py to
  locate data tables inside the binary)

The interpreter is deliberately validation-free (the input module is
trusted and fixed) and favors clarity over speed; full-repertoire sweeps
(~1M codepoints) run in minutes, which is fine for offline conformance
extraction.  SIMD (0xFD) instructions are decoded so instruction streams
stay aligned but only executed for the handful of ops the scalar API
paths reach; hitting an unimplemented one raises immediately.

This is a TOOL for validating parity (docs/CONFORMANCE.md); nothing in
the product package imports it.
"""

from __future__ import annotations

import math
import re
import struct
from dataclasses import dataclass, field

PAGE = 65536

# ── binary reader ────────────────────────────────────────────────────────


class Reader:
    __slots__ = ("d", "p")

    def __init__(self, d: bytes, p: int = 0):
        self.d = d
        self.p = p

    def byte(self) -> int:
        b = self.d[self.p]
        self.p += 1
        return b

    def uleb(self) -> int:
        r = 0
        s = 0
        while True:
            b = self.d[self.p]
            self.p += 1
            r |= (b & 0x7F) << s
            if not b & 0x80:
                return r
            s += 7

    def sleb(self) -> int:
        r = 0
        s = 0
        while True:
            b = self.d[self.p]
            self.p += 1
            r |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                if b & 0x40:
                    r -= 1 << s
                return r

    def bytes(self, n: int) -> bytes:
        out = self.d[self.p : self.p + n]
        self.p += n
        return out

    def f32(self) -> float:
        (v,) = struct.unpack_from("<f", self.d, self.p)
        self.p += 4
        return v

    def f64(self) -> float:
        (v,) = struct.unpack_from("<d", self.d, self.p)
        self.p += 8
        return v


# ── module parsing ───────────────────────────────────────────────────────


@dataclass
class FuncBody:
    type_idx: int
    locals: list[int] = field(default_factory=list)  # value types, expanded
    code: list = field(default_factory=list)  # decoded instruction list


@dataclass
class WasmModule:
    types: list  # [(params, results)]
    imports: list  # [(mod, name, kind, desc)]
    func_types: list  # type idx per defined function
    table_min: int
    mem_min: int
    globals_init: list  # [(type, mut, init_value)]
    exports: dict  # name -> (kind, idx)
    elem: list  # [(offset, [func idx])]
    bodies: list  # [FuncBody]
    data: list  # [(offset, bytes)]
    n_imported_funcs: int


_BLOCKTYPES = {0x40, 0x7F, 0x7E, 0x7D, 0x7C, 0x7B, 0x70, 0x6F}

# ops whose immediate is a single uleb index
_ULEB_IMM = {0x0C, 0x0D, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24, 0xD2}


def _decode_expr(r: Reader) -> list:
    """Decode an instruction sequence (terminated by 0x0B at depth 0) into
    a flat list of (op, imm) tuples, with block structure resolved:

    * block/loop/if entries carry (end_index, else_index, arity) where
      arity is the block's result count (0 or 1 — C-compiled modules
      don't use multivalue)
    * the list's final element is the terminating ``end``
    """
    code: list = []
    stack: list[int] = []  # indices of open block/loop/if instrs

    while True:
        op = r.byte()
        if op in (0x02, 0x03, 0x04):  # block / loop / if
            bt = r.d[r.p]
            if bt in _BLOCKTYPES:
                r.p += 1
                arity = 0 if bt == 0x40 else 1
            else:
                r.sleb()  # type-index blocktype (s33)
                arity = 1  # conservative; unused by this binary
            code.append([op, None, None, arity])  # end/else patched later
            stack.append(len(code) - 1)
        elif op == 0x05:  # else
            i = stack[-1]
            code[i][2] = len(code)  # index the 0x05 marker will occupy
            code.append((0x05, None))
        elif op == 0x0B:  # end
            code.append((0x0B, None))
            if not stack:
                return code
            i = stack.pop()
            code[i][1] = len(code) - 1  # end marker index
            code[i] = tuple(code[i])
        elif op == 0x0E:  # br_table
            n = r.uleb()
            targets = [r.uleb() for _ in range(n)]
            default = r.uleb()
            code.append((op, (targets, default)))
        elif op == 0x11:  # call_indirect
            ti = r.uleb()
            r.uleb()  # table idx
            code.append((op, ti))
        elif op == 0x41:
            code.append((op, r.sleb() & 0xFFFFFFFF))
        elif op == 0x42:
            code.append((op, r.sleb() & 0xFFFFFFFFFFFFFFFF))
        elif op == 0x43:
            code.append((op, r.f32()))
        elif op == 0x44:
            code.append((op, r.f64()))
        elif 0x28 <= op <= 0x3E:  # loads/stores: align, offset
            r.uleb()
            off = r.uleb()
            code.append((op, off))
        elif op in (0x3F, 0x40):  # memory.size / grow
            r.byte()
            code.append((op, None))
        elif op in _ULEB_IMM:
            code.append((op, r.uleb()))
        elif op == 0x1C:  # select with types
            n = r.uleb()
            r.bytes(n)
            code.append((0x1B, None))
        elif op == 0xFC:
            sub = r.uleb()
            if sub == 10:  # memory.copy
                r.byte()
                r.byte()
            elif sub == 11:  # memory.fill
                r.byte()
            elif sub == 8:  # memory.init
                r.uleb()
                r.byte()
            elif sub in (9, 12, 13, 14, 15, 16, 17):
                r.uleb()
                if sub == 14:
                    r.uleb()
            code.append((0xFC, sub))
        elif op == 0xFD:  # SIMD: decode immediates, execute lazily
            sub = r.uleb()
            imm = None
            if sub <= 11 or sub in (92, 93):  # v128 loads/stores
                r.uleb()
                imm = r.uleb()
            elif 84 <= sub <= 91:  # load/store lane
                r.uleb()
                imm = (r.uleb(), r.byte())
            elif sub == 12:  # v128.const
                imm = int.from_bytes(r.bytes(16), "little")
            elif sub == 13:  # i8x16.shuffle
                imm = list(r.bytes(16))
            elif 21 <= sub <= 34:  # extract/replace lane
                imm = r.byte()
            code.append((0xFD, (sub, imm)))
        else:
            code.append((op, None))


def parse_module(data: bytes) -> WasmModule:
    assert data[:4] == b"\0asm", "not a wasm module"
    r = Reader(data, 8)
    secs: dict[int, Reader] = {}
    while r.p < len(data):
        sid = r.byte()
        size = r.uleb()
        secs[sid] = Reader(data[r.p : r.p + size])
        r.p += size

    types = []
    if 1 in secs:
        s = secs[1]
        for _ in range(s.uleb()):
            assert s.byte() == 0x60
            params = list(s.bytes(s.uleb()))
            results = list(s.bytes(s.uleb()))
            types.append((params, results))

    imports = []
    n_imported_funcs = 0
    if 2 in secs:
        s = secs[2]
        for _ in range(s.uleb()):
            mod = s.bytes(s.uleb()).decode()
            name = s.bytes(s.uleb()).decode()
            kind = s.byte()
            if kind == 0:
                desc = s.uleb()
                n_imported_funcs += 1
            else:  # pragma: no cover - decoder.wasm only imports one func
                raise NotImplementedError(f"import kind {kind}")
            imports.append((mod, name, kind, desc))

    func_types = []
    if 3 in secs:
        s = secs[3]
        func_types = [s.uleb() for _ in range(s.uleb())]

    table_min = 0
    if 4 in secs:
        s = secs[4]
        for _ in range(s.uleb()):
            s.byte()  # reftype
            flags = s.byte()
            table_min = s.uleb()
            if flags:
                s.uleb()

    mem_min = 0
    if 5 in secs:
        s = secs[5]
        for _ in range(s.uleb()):
            flags = s.byte()
            mem_min = s.uleb()
            if flags:
                s.uleb()

    globals_init = []
    if 6 in secs:
        s = secs[6]
        for _ in range(s.uleb()):
            gtype = s.byte()
            mut = s.byte()
            op = s.byte()
            if op == 0x41:
                val = s.sleb() & 0xFFFFFFFF
            elif op == 0x42:
                val = s.sleb() & 0xFFFFFFFFFFFFFFFF
            elif op == 0x43:
                val = s.f32()
            elif op == 0x44:
                val = s.f64()
            else:  # pragma: no cover
                raise NotImplementedError(f"global init op {op:#x}")
            assert s.byte() == 0x0B
            globals_init.append((gtype, mut, val))

    exports = {}
    if 7 in secs:
        s = secs[7]
        for _ in range(s.uleb()):
            name = s.bytes(s.uleb()).decode()
            kind = s.byte()
            idx = s.uleb()
            exports[name] = (kind, idx)

    elem = []
    if 9 in secs:
        s = secs[9]
        for _ in range(s.uleb()):
            flags = s.uleb()
            assert flags == 0, f"elem flags {flags}"
            assert s.byte() == 0x41
            offset = s.sleb()
            assert s.byte() == 0x0B
            elem.append((offset, [s.uleb() for _ in range(s.uleb())]))

    bodies = []
    if 10 in secs:
        s = secs[10]
        n = s.uleb()
        assert n == len(func_types)
        for i in range(n):
            size = s.uleb()
            end = s.p + size
            locals_: list[int] = []
            for _ in range(s.uleb()):
                cnt = s.uleb()
                vt = s.byte()
                locals_.extend([vt] * cnt)
            body = FuncBody(func_types[i], locals_, _decode_expr(s))
            assert s.p == end, f"func {i}: decode desync {s.p} != {end}"
            bodies.append(body)

    datasegs = []
    if 11 in secs:
        s = secs[11]
        for _ in range(s.uleb()):
            flags = s.uleb()
            assert flags == 0, f"data flags {flags}"
            assert s.byte() == 0x41
            offset = s.sleb()
            assert s.byte() == 0x0B
            datasegs.append((offset, s.bytes(s.uleb())))

    return WasmModule(
        types, imports, func_types, table_min, mem_min, globals_init,
        exports, elem, bodies, datasegs, n_imported_funcs,
    )


# ── numeric helpers ──────────────────────────────────────────────────────

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _s32(v: int) -> int:
    return v - 0x100000000 if v & 0x80000000 else v


def _s64(v: int) -> int:
    return v - 0x10000000000000000 if v & 0x8000000000000000 else v


def _clz32(v: int) -> int:
    return 32 - v.bit_length() if v else 32


def _ctz32(v: int) -> int:
    return (v & -v).bit_length() - 1 if v else 32


def _clz64(v: int) -> int:
    return 64 - v.bit_length() if v else 64


def _ctz64(v: int) -> int:
    return (v & -v).bit_length() - 1 if v else 64


def _rotl32(v: int, n: int) -> int:
    n &= 31
    return ((v << n) | (v >> (32 - n))) & _M32 if n else v


def _rotr32(v: int, n: int) -> int:
    n &= 31
    return ((v >> n) | (v << (32 - n))) & _M32 if n else v


def _trunc(v: float) -> int:
    return math.trunc(v)


# ── SIMD lane helpers (v128 values are 128-bit Python ints) ──────────────

def _vlanes(v: int, w: int) -> list[int]:
    n = 128 // w
    m = (1 << w) - 1
    return [(v >> (w * i)) & m for i in range(n)]


def _vpack(lanes: list[int], w: int) -> int:
    m = (1 << w) - 1
    v = 0
    for i, x in enumerate(lanes):
        v |= (x & m) << (w * i)
    return v


def _sx(x: int, w: int) -> int:
    return x - (1 << w) if x >> (w - 1) else x


def _sat(x: int, lo: int, hi: int) -> int:
    return lo if x < lo else (hi if x > hi else x)


class Trap(Exception):
    pass


# ── instance / interpreter ───────────────────────────────────────────────


class Instance:
    """An instantiated module: linear memory, table, globals, and an
    execution engine.  ``call(name, *args)`` invokes an export."""

    def __init__(self, mod: WasmModule, trace_loads=None):
        self.mod = mod
        self.memory = bytearray(mod.mem_min * PAGE)
        self.globals = [v for (_t, _m, v) in mod.globals_init]
        self.table: list[int | None] = [None] * mod.table_min
        for offset, idxs in mod.elem:
            for i, fi in enumerate(idxs):
                self.table[offset + i] = fi
        for offset, blob in mod.data:
            self.memory[offset : offset + len(blob)] = blob
        self.trace_loads = trace_loads  # callable(addr, width) or None
        self.trace_exec = None  # callable(pc, op, stack) — debug single-step
        self._depth = 0

    # emscripten import a.a = emscripten_resize_heap(requested_size)
    def _resize_heap(self, requested: int) -> int:
        cur = len(self.memory)
        if requested <= cur:
            return 1
        new_pages = -(-requested // PAGE)
        self.memory.extend(bytes(new_pages * PAGE - cur))
        return 1

    def call(self, name: str, *args: int):
        kind, idx = self.mod.exports[name]
        assert kind == 0, f"{name} is not a function export"
        if idx >= self.mod.n_imported_funcs:
            body = self.mod.bodies[idx - self.mod.n_imported_funcs]
            params, _ = self.mod.types[body.type_idx]
            assert len(args) == len(params), (
                f"{name}: takes {len(params)} args, got {len(args)}"
            )
        return self._invoke(idx, list(args))

    def _invoke(self, func_idx: int, args: list):
        if func_idx < self.mod.n_imported_funcs:
            return self._resize_heap(args[0])
        body = self.mod.bodies[func_idx - self.mod.n_imported_funcs]
        params, results = self.mod.types[body.type_idx]
        locals_ = args + [0] * len(body.locals)
        ret = self._exec(body.code, locals_)
        if not results:
            return None
        return ret

    def _simd(self, sub_imm, stack: list, mem: bytearray) -> None:  # noqa: PLR0912, PLR0915
        """Execute one SIMD (0xFD-prefixed) instruction.

        Covers the integer/bitwise/lane/load-store subset Emscripten emits
        for the decoder's UTF-8 fast paths; float SIMD raises (the decoder
        has no float data paths)."""
        sub, imm = sub_imm
        M128 = (1 << 128) - 1
        if sub == 0:  # v128.load
            a = stack.pop() + imm
            stack.append(int.from_bytes(mem[a:a + 16], "little"))
        elif 1 <= sub <= 6:  # load8x8 / load16x4 / load32x2 (s/u)
            a = stack.pop() + imm
            w = (8, 8, 16, 16, 32, 32)[sub - 1]
            signed = sub % 2 == 1
            n = 64 // w
            lanes = [int.from_bytes(mem[a + i * (w // 8): a + (i + 1) * (w // 8)], "little")
                     for i in range(n)]
            if signed:
                lanes = [_sx(x, w) for x in lanes]
            stack.append(_vpack(lanes, 2 * w))
        elif 7 <= sub <= 10:  # load splats
            a = stack.pop() + imm
            w = (8, 16, 32, 64)[sub - 7]
            x = int.from_bytes(mem[a:a + w // 8], "little")
            stack.append(_vpack([x] * (128 // w), w))
        elif sub == 11:  # v128.store
            v = stack.pop()
            a = stack.pop() + imm
            mem[a:a + 16] = (v & M128).to_bytes(16, "little")
        elif sub == 12:  # v128.const
            stack.append(imm)
        elif sub == 13:  # i8x16.shuffle
            b = _vlanes(stack.pop(), 8)
            a = _vlanes(stack.pop(), 8)
            ab = a + b
            stack.append(_vpack([ab[i] for i in imm], 8))
        elif sub == 14:  # i8x16.swizzle
            s = _vlanes(stack.pop(), 8)
            a = _vlanes(stack.pop(), 8)
            stack.append(_vpack([a[i] if i < 16 else 0 for i in s], 8))
        elif 15 <= sub <= 18:  # int splats
            w = (8, 16, 32, 64)[sub - 15]
            x = stack.pop()
            stack.append(_vpack([x] * (128 // w), w))
        elif sub in (21, 22, 24, 25, 27, 29):  # extract_lane int
            w, signed = {21: (8, True), 22: (8, False), 24: (16, True),
                         25: (16, False), 27: (32, True), 29: (64, True)}[sub]
            x = _vlanes(stack.pop(), w)[imm]
            if signed and w < 64:
                x = _sx(x, w)
            stack.append(x & (_M64 if w == 64 else _M32))
        elif sub in (23, 26, 28, 30):  # replace_lane int
            w = {23: 8, 26: 16, 28: 32, 30: 64}[sub]
            x = stack.pop()
            lanes = _vlanes(stack.pop(), w)
            lanes[imm] = x
            stack.append(_vpack(lanes, w))
        elif 35 <= sub <= 64:  # integer comparisons
            w = 8 if sub <= 44 else (16 if sub <= 54 else 32)
            kind = (sub - 35) % 10
            m = (1 << w) - 1
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            out = []
            for x, y in zip(a, b):
                if kind in (2, 4, 6, 8):  # signed lt/gt/le/ge
                    x2, y2 = _sx(x, w), _sx(y, w)
                else:
                    x2, y2 = x, y
                t = (x == y, x != y, x2 < y2, x < y, x2 > y2, x > y,
                     x2 <= y2, x <= y, x2 >= y2, x >= y)[kind]
                out.append(m if t else 0)
            stack.append(_vpack(out, w))
        elif sub == 77:  # v128.not
            stack.append(stack.pop() ^ M128)
        elif sub == 78:
            b = stack.pop(); stack.append(stack.pop() & b)
        elif sub == 79:  # andnot
            b = stack.pop(); stack.append(stack.pop() & (b ^ M128))
        elif sub == 80:
            b = stack.pop(); stack.append(stack.pop() | b)
        elif sub == 81:
            b = stack.pop(); stack.append(stack.pop() ^ b)
        elif sub == 82:  # bitselect
            c = stack.pop(); b = stack.pop(); a = stack.pop()
            stack.append((a & c) | (b & (c ^ M128)))
        elif sub == 83:  # v128.any_true
            stack.append(1 if stack.pop() != 0 else 0)
        elif 84 <= sub <= 87:  # load lane
            off, lane = imm
            w = (8, 16, 32, 64)[sub - 84]
            v = stack.pop()
            a = stack.pop() + off
            lanes = _vlanes(v, w)
            lanes[lane] = int.from_bytes(mem[a:a + w // 8], "little")
            stack.append(_vpack(lanes, w))
        elif 88 <= sub <= 91:  # store lane
            off, lane = imm
            w = (8, 16, 32, 64)[sub - 88]
            v = stack.pop()
            a = stack.pop() + off
            mem[a:a + w // 8] = _vlanes(v, w)[lane].to_bytes(w // 8, "little")
        elif sub in (92, 93):  # load32_zero / load64_zero
            a = stack.pop() + imm
            w = 32 if sub == 92 else 64
            stack.append(int.from_bytes(mem[a:a + w // 8], "little"))
        elif sub in (96, 128, 160, 192):  # abs
            w = {96: 8, 128: 16, 160: 32, 192: 64}[sub]
            stack.append(_vpack([abs(_sx(x, w)) for x in _vlanes(stack.pop(), w)], w))
        elif sub in (97, 129, 161, 193):  # neg
            w = {97: 8, 129: 16, 161: 32, 193: 64}[sub]
            stack.append(_vpack([-x for x in _vlanes(stack.pop(), w)], w))
        elif sub == 98:  # i8x16.popcnt
            stack.append(_vpack([bin(x).count("1") for x in _vlanes(stack.pop(), 8)], 8))
        elif sub in (99, 131, 163, 195):  # all_true
            w = {99: 8, 131: 16, 163: 32, 195: 64}[sub]
            stack.append(1 if all(x != 0 for x in _vlanes(stack.pop(), w)) else 0)
        elif sub in (100, 132, 164, 196):  # bitmask
            w = {100: 8, 132: 16, 164: 32, 196: 64}[sub]
            lanes = _vlanes(stack.pop(), w)
            stack.append(sum(1 << i for i, x in enumerate(lanes) if x >> (w - 1)))
        elif sub in (101, 102, 133, 134):  # narrow
            w, signed = {101: (16, True), 102: (16, False),
                         133: (32, True), 134: (32, False)}[sub]
            half = w // 2
            lo, hi = ((-(1 << (half - 1)), (1 << (half - 1)) - 1) if signed
                      else (0, (1 << half) - 1))
            b = [_sx(x, w) for x in _vlanes(stack.pop(), w)]
            a = [_sx(x, w) for x in _vlanes(stack.pop(), w)]
            stack.append(_vpack([_sat(x, lo, hi) for x in a + b], half))
        elif sub in (135, 136, 137, 138, 167, 168, 169, 170, 199, 200, 201, 202):
            # extend low/high s/u
            w = 8 if sub <= 138 else (16 if sub <= 170 else 32)
            k = (sub - 135) % 32 if sub <= 138 else ((sub - 167) if sub <= 170 else (sub - 199))
            low = k in (0, 2)
            signed = k in (0, 1)
            lanes = _vlanes(stack.pop(), w)
            half = len(lanes) // 2
            sel = lanes[:half] if low else lanes[half:]
            if signed:
                sel = [_sx(x, w) for x in sel]
            stack.append(_vpack(sel, 2 * w))
        elif sub in (107, 139, 171, 203):  # shl
            w = {107: 8, 139: 16, 171: 32, 203: 64}[sub]
            s = stack.pop() % w
            stack.append(_vpack([x << s for x in _vlanes(stack.pop(), w)], w))
        elif sub in (108, 140, 172, 204):  # shr_s
            w = {108: 8, 140: 16, 172: 32, 204: 64}[sub]
            s = stack.pop() % w
            stack.append(_vpack([_sx(x, w) >> s for x in _vlanes(stack.pop(), w)], w))
        elif sub in (109, 141, 173, 205):  # shr_u
            w = {109: 8, 141: 16, 173: 32, 205: 64}[sub]
            s = stack.pop() % w
            stack.append(_vpack([x >> s for x in _vlanes(stack.pop(), w)], w))
        elif sub in (110, 142, 174, 206):  # add
            w = {110: 8, 142: 16, 174: 32, 206: 64}[sub]
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            stack.append(_vpack([x + y for x, y in zip(a, b)], w))
        elif sub in (113, 145, 177, 209):  # sub
            w = {113: 8, 145: 16, 177: 32, 209: 64}[sub]
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            stack.append(_vpack([x - y for x, y in zip(a, b)], w))
        elif sub in (149, 181, 213):  # mul
            w = {149: 16, 181: 32, 213: 64}[sub]
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            stack.append(_vpack([x * y for x, y in zip(a, b)], w))
        elif sub in (111, 112, 114, 115, 143, 144, 146, 147):  # add/sub sat
            w = 8 if sub <= 115 else 16
            addop = sub in (111, 112, 143, 144)
            signed = sub in (111, 114, 143, 146)
            lo, hi = ((-(1 << (w - 1)), (1 << (w - 1)) - 1) if signed
                      else (0, (1 << w) - 1))
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            out = []
            for x, y in zip(a, b):
                if signed:
                    x, y = _sx(x, w), _sx(y, w)
                out.append(_sat(x + y if addop else x - y, lo, hi))
            stack.append(_vpack(out, w))
        elif sub in (118, 119, 120, 121, 150, 151, 152, 153, 182, 183, 184, 185):
            # min_s/min_u/max_s/max_u
            w = 8 if sub <= 121 else (16 if sub <= 153 else 32)
            kind = sub - {8: 118, 16: 150, 32: 182}[w]  # min_s/min_u/max_s/max_u
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            out = []
            for x, y in zip(a, b):
                if kind in (0, 2):
                    xs, ys = _sx(x, w), _sx(y, w)
                    out.append((min if kind == 0 else max)(xs, ys))
                else:
                    out.append((min if kind == 1 else max)(x, y))
            stack.append(_vpack(out, w))
        elif sub in (123, 155):  # avgr_u
            w = 8 if sub == 123 else 16
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            stack.append(_vpack([(x + y + 1) >> 1 for x, y in zip(a, b)], w))
        elif sub in (124, 125, 126, 127):  # extadd_pairwise
            w = 8 if sub in (124, 125) else 16
            signed = sub in (124, 126)
            lanes = _vlanes(stack.pop(), w)
            if signed:
                lanes = [_sx(x, w) for x in lanes]
            stack.append(_vpack([lanes[2 * i] + lanes[2 * i + 1]
                                 for i in range(len(lanes) // 2)], 2 * w))
        elif sub == 186:  # i32x4.dot_i16x8_s
            b = [_sx(x, 16) for x in _vlanes(stack.pop(), 16)]
            a = [_sx(x, 16) for x in _vlanes(stack.pop(), 16)]
            stack.append(_vpack([a[2 * i] * b[2 * i] + a[2 * i + 1] * b[2 * i + 1]
                                 for i in range(4)], 32))
        elif 214 <= sub <= 219:  # i64x2 comparisons (signed)
            kind = sub - 214  # eq ne lt_s gt_s le_s ge_s
            m = (1 << 64) - 1
            b = _vlanes(stack.pop(), 64)
            a = _vlanes(stack.pop(), 64)
            out = []
            for x, y in zip(a, b):
                xs, ys = _sx(x, 64), _sx(y, 64)
                t = (x == y, x != y, xs < ys, xs > ys, xs <= ys, xs >= ys)[kind]
                out.append(m if t else 0)
            stack.append(_vpack(out, 64))
        elif sub in (156, 157, 158, 159, 188, 189, 190, 191, 220, 221, 222, 223):
            # extmul low/high s/u (i16x8 from i8x16 / i32x4 from i16x8 /
            # i64x2 from i32x4)
            w = 8 if sub <= 159 else (16 if sub <= 191 else 32)
            base = 156 if sub <= 159 else (188 if sub <= 191 else 220)
            k = sub - base  # 0 low_s 1 high_s 2 low_u 3 high_u
            low = k in (0, 2)
            signed = k in (0, 1)
            b = _vlanes(stack.pop(), w)
            a = _vlanes(stack.pop(), w)
            half = len(a) // 2
            sa = a[:half] if low else a[half:]
            sb = b[:half] if low else b[half:]
            if signed:
                sa = [_sx(x, w) for x in sa]
                sb = [_sx(x, w) for x in sb]
            stack.append(_vpack([x * y for x, y in zip(sa, sb)], 2 * w))
        else:  # pragma: no cover
            raise NotImplementedError(f"SIMD op {sub} executed")

    def _exec(self, code: list, locals_: list):  # noqa: PLR0912, PLR0915
        """Execute one decoded function body.  Returns the top of stack
        (the single result) or None."""
        self._depth += 1
        if self._depth > 2000:
            self._depth -= 1
            raise Trap("call stack exhausted")
        stack: list = []
        # control stack entries: (opcode, end_idx, else_idx, stack_height)
        ctrl: list = []
        mem = self.memory
        mod = self.mod
        trace = self.trace_loads
        pc = 0
        n = len(code)
        while pc < n:
            instr = code[pc]
            op = instr[0]
            pc += 1
            if self.trace_exec is not None:
                self.trace_exec(pc - 1, op, stack)
            if op == 0x20:  # local.get
                stack.append(locals_[instr[1]])
            elif op == 0x21:  # local.set
                locals_[instr[1]] = stack.pop()
            elif op == 0x22:  # local.tee
                locals_[instr[1]] = stack[-1]
            elif op == 0x41 or op == 0x42 or op == 0x43 or op == 0x44:  # const
                stack.append(instr[1])
            elif 0x28 <= op <= 0x35:  # loads
                addr = stack.pop() + instr[1]
                if trace is not None:
                    trace(addr, op)
                if op == 0x28:  # i32.load
                    stack.append(int.from_bytes(mem[addr : addr + 4], "little"))
                elif op == 0x29:  # i64.load
                    stack.append(int.from_bytes(mem[addr : addr + 8], "little"))
                elif op == 0x2A:
                    stack.append(struct.unpack_from("<f", mem, addr)[0])
                elif op == 0x2B:
                    stack.append(struct.unpack_from("<d", mem, addr)[0])
                elif op == 0x2C:  # i32.load8_s
                    v = mem[addr]
                    stack.append((v - 256 if v & 0x80 else v) & _M32)
                elif op == 0x2D:  # i32.load8_u
                    stack.append(mem[addr])
                elif op == 0x2E:  # i32.load16_s
                    v = int.from_bytes(mem[addr : addr + 2], "little")
                    stack.append((v - 65536 if v & 0x8000 else v) & _M32)
                elif op == 0x2F:  # i32.load16_u
                    stack.append(int.from_bytes(mem[addr : addr + 2], "little"))
                elif op == 0x30:  # i64.load8_s
                    v = mem[addr]
                    stack.append((v - 256 if v & 0x80 else v) & _M64)
                elif op == 0x31:
                    stack.append(mem[addr])
                elif op == 0x32:
                    v = int.from_bytes(mem[addr : addr + 2], "little")
                    stack.append((v - 65536 if v & 0x8000 else v) & _M64)
                elif op == 0x33:
                    stack.append(int.from_bytes(mem[addr : addr + 2], "little"))
                elif op == 0x34:  # i64.load32_s
                    v = int.from_bytes(mem[addr : addr + 4], "little")
                    stack.append((v - 0x100000000 if v & 0x80000000 else v) & _M64)
                else:  # 0x35 i64.load32_u
                    stack.append(int.from_bytes(mem[addr : addr + 4], "little"))
            elif 0x36 <= op <= 0x3E:  # stores
                val = stack.pop()
                addr = stack.pop() + instr[1]
                if op == 0x36:
                    mem[addr : addr + 4] = (val & _M32).to_bytes(4, "little")
                elif op == 0x37:
                    mem[addr : addr + 8] = (val & _M64).to_bytes(8, "little")
                elif op == 0x38:
                    struct.pack_into("<f", mem, addr, val)
                elif op == 0x39:
                    struct.pack_into("<d", mem, addr, val)
                elif op == 0x3A:
                    mem[addr] = val & 0xFF
                elif op == 0x3B:
                    mem[addr : addr + 2] = (val & 0xFFFF).to_bytes(2, "little")
                elif op == 0x3C:
                    mem[addr] = val & 0xFF
                elif op == 0x3D:
                    mem[addr : addr + 2] = (val & 0xFFFF).to_bytes(2, "little")
                else:  # 0x3E i64.store32
                    mem[addr : addr + 4] = (val & _M32).to_bytes(4, "little")
            elif op == 0x02 or op == 0x03:  # block / loop
                ctrl.append((op, instr[1], len(stack), pc - 1, instr[3]))
            elif op == 0x04:  # if
                cond = stack.pop()
                if cond:
                    ctrl.append((op, instr[1], len(stack), pc - 1, instr[3]))
                elif instr[2] is not None:  # jump into the else branch
                    ctrl.append((op, instr[1], len(stack), pc - 1, instr[3]))
                    pc = instr[2] + 1
                else:  # no else: skip past end, frame never entered
                    pc = instr[1] + 1
            elif op == 0x05:  # else (fell through from then-branch)
                top = ctrl.pop()
                pc = top[1] + 1
            elif op == 0x0B:  # end
                if ctrl:
                    ctrl.pop()
            elif op == 0x0C or op == 0x0D:  # br / br_if
                if op == 0x0D and not stack.pop():
                    continue
                pc = self._branch(code, ctrl, instr[1], stack)
            elif op == 0x0E:  # br_table
                targets, default = instr[1]
                i = stack.pop()
                depth = targets[i] if i < len(targets) else default
                pc = self._branch(code, ctrl, depth, stack)
            elif op == 0x0F:  # return
                break
            elif op == 0x10:  # call
                pc_res = self._call_into(instr[1], stack)
            elif op == 0x11:  # call_indirect
                ti = stack.pop()
                fi = self.table[ti]
                if fi is None:
                    raise Trap("null table entry")
                self._call_into(fi, stack, expect_type=instr[1])
            elif op == 0x1A:  # drop
                stack.pop()
            elif op == 0x1B:  # select
                c = stack.pop()
                b = stack.pop()
                a = stack.pop()
                stack.append(a if c else b)
            elif op == 0x23:  # global.get
                stack.append(self.globals[instr[1]])
            elif op == 0x24:  # global.set
                self.globals[instr[1]] = stack.pop()
            elif op == 0x45:  # i32.eqz
                stack.append(1 if stack.pop() == 0 else 0)
            elif 0x46 <= op <= 0x4F:  # i32 comparisons
                b = stack.pop()
                a = stack.pop()
                if op == 0x46:
                    stack.append(1 if a == b else 0)
                elif op == 0x47:
                    stack.append(1 if a != b else 0)
                elif op == 0x48:
                    stack.append(1 if _s32(a) < _s32(b) else 0)
                elif op == 0x49:
                    stack.append(1 if a < b else 0)
                elif op == 0x4A:
                    stack.append(1 if _s32(a) > _s32(b) else 0)
                elif op == 0x4B:
                    stack.append(1 if a > b else 0)
                elif op == 0x4C:
                    stack.append(1 if _s32(a) <= _s32(b) else 0)
                elif op == 0x4D:
                    stack.append(1 if a <= b else 0)
                elif op == 0x4E:
                    stack.append(1 if _s32(a) >= _s32(b) else 0)
                else:
                    stack.append(1 if a >= b else 0)
            elif op == 0x50:  # i64.eqz
                stack.append(1 if stack.pop() == 0 else 0)
            elif 0x51 <= op <= 0x5A:  # i64 comparisons
                b = stack.pop()
                a = stack.pop()
                if op == 0x51:
                    stack.append(1 if a == b else 0)
                elif op == 0x52:
                    stack.append(1 if a != b else 0)
                elif op == 0x53:
                    stack.append(1 if _s64(a) < _s64(b) else 0)
                elif op == 0x54:
                    stack.append(1 if a < b else 0)
                elif op == 0x55:
                    stack.append(1 if _s64(a) > _s64(b) else 0)
                elif op == 0x56:
                    stack.append(1 if a > b else 0)
                elif op == 0x57:
                    stack.append(1 if _s64(a) <= _s64(b) else 0)
                elif op == 0x58:
                    stack.append(1 if a <= b else 0)
                elif op == 0x59:
                    stack.append(1 if _s64(a) >= _s64(b) else 0)
                else:
                    stack.append(1 if a >= b else 0)
            elif 0x5B <= op <= 0x66:  # f32/f64 comparisons
                b = stack.pop()
                a = stack.pop()
                k = (op - 0x5B) % 6
                if k == 0:
                    stack.append(1 if a == b else 0)
                elif k == 1:
                    stack.append(1 if a != b else 0)
                elif k == 2:
                    stack.append(1 if a < b else 0)
                elif k == 3:
                    stack.append(1 if a > b else 0)
                elif k == 4:
                    stack.append(1 if a <= b else 0)
                else:
                    stack.append(1 if a >= b else 0)
            elif 0x67 <= op <= 0x78:  # i32 arithmetic
                if op == 0x67:
                    stack.append(_clz32(stack.pop()))
                elif op == 0x68:
                    stack.append(_ctz32(stack.pop()))
                elif op == 0x69:
                    stack.append(bin(stack.pop()).count("1"))
                else:
                    b = stack.pop()
                    a = stack.pop()
                    if op == 0x6A:
                        stack.append((a + b) & _M32)
                    elif op == 0x6B:
                        stack.append((a - b) & _M32)
                    elif op == 0x6C:
                        stack.append((a * b) & _M32)
                    elif op == 0x6D:  # div_s
                        if b == 0:
                            raise Trap("div by zero")
                        q = _trunc(_s32(a) / _s32(b))
                        stack.append(q & _M32)
                    elif op == 0x6E:  # div_u
                        if b == 0:
                            raise Trap("div by zero")
                        stack.append((a // b) & _M32)
                    elif op == 0x6F:  # rem_s
                        if b == 0:
                            raise Trap("rem by zero")
                        sa, sb = _s32(a), _s32(b)
                        stack.append((sa - _trunc(sa / sb) * sb) & _M32)
                    elif op == 0x70:  # rem_u
                        if b == 0:
                            raise Trap("rem by zero")
                        stack.append((a % b) & _M32)
                    elif op == 0x71:
                        stack.append(a & b)
                    elif op == 0x72:
                        stack.append(a | b)
                    elif op == 0x73:
                        stack.append(a ^ b)
                    elif op == 0x74:
                        stack.append((a << (b & 31)) & _M32)
                    elif op == 0x75:  # shr_s
                        stack.append((_s32(a) >> (b & 31)) & _M32)
                    elif op == 0x76:  # shr_u
                        stack.append(a >> (b & 31))
                    elif op == 0x77:
                        stack.append(_rotl32(a, b))
                    else:
                        stack.append(_rotr32(a, b))
            elif 0x79 <= op <= 0x8A:  # i64 arithmetic
                if op == 0x79:
                    stack.append(_clz64(stack.pop()))
                elif op == 0x7A:
                    stack.append(_ctz64(stack.pop()))
                elif op == 0x7B:
                    stack.append(bin(stack.pop()).count("1"))
                else:
                    b = stack.pop()
                    a = stack.pop()
                    if op == 0x7C:
                        stack.append((a + b) & _M64)
                    elif op == 0x7D:
                        stack.append((a - b) & _M64)
                    elif op == 0x7E:
                        stack.append((a * b) & _M64)
                    elif op == 0x7F:
                        if b == 0:
                            raise Trap("div by zero")
                        stack.append(_trunc(_s64(a) / _s64(b)) & _M64)
                    elif op == 0x80:
                        if b == 0:
                            raise Trap("div by zero")
                        stack.append((a // b) & _M64)
                    elif op == 0x81:
                        if b == 0:
                            raise Trap("rem by zero")
                        sa, sb = _s64(a), _s64(b)
                        stack.append((sa - _trunc(sa / sb) * sb) & _M64)
                    elif op == 0x82:
                        if b == 0:
                            raise Trap("rem by zero")
                        stack.append((a % b) & _M64)
                    elif op == 0x83:
                        stack.append(a & b)
                    elif op == 0x84:
                        stack.append(a | b)
                    elif op == 0x85:
                        stack.append(a ^ b)
                    elif op == 0x86:
                        stack.append((a << (b & 63)) & _M64)
                    elif op == 0x87:
                        stack.append((_s64(a) >> (b & 63)) & _M64)
                    elif op == 0x88:
                        stack.append(a >> (b & 63))
                    elif op == 0x89:  # rotl
                        sh = b & 63
                        stack.append(((a << sh) | (a >> (64 - sh))) & _M64 if sh else a)
                    else:  # rotr
                        sh = b & 63
                        stack.append(((a >> sh) | (a << (64 - sh))) & _M64 if sh else a)
            elif 0x8B <= op <= 0x98:  # f32 unary/binary
                stack.append(self._fop(op - 0x8B, stack))
            elif 0x99 <= op <= 0xA6:  # f64 unary/binary
                stack.append(self._fop(op - 0x99, stack))
            elif op == 0xA7:  # i32.wrap_i64
                stack.append(stack.pop() & _M32)
            elif 0xA8 <= op <= 0xAB:  # i32.trunc_f*
                v = stack.pop()
                t = _trunc(v)
                stack.append(t & _M32)
            elif op == 0xAC:  # i64.extend_i32_s
                stack.append(_s32(stack.pop()) & _M64)
            elif op == 0xAD:  # i64.extend_i32_u
                stack.append(stack.pop())
            elif 0xAE <= op <= 0xB1:  # i64.trunc_f*
                stack.append(_trunc(stack.pop()) & _M64)
            elif 0xB2 <= op <= 0xB7:  # f32/f64.convert_i*
                v = stack.pop()
                if op in (0xB2, 0xB7):  # convert_i32_s / f64.convert_i32_s? see map
                    pass
                # map: B2 f32.convert_i32_s, B3 _u, B4 i64_s, B5 i64_u
                #      B7 f64.convert_i32_s, B8.. handled below
                if op == 0xB2:
                    stack.append(float(_s32(v)))
                elif op == 0xB3:
                    stack.append(float(v))
                elif op == 0xB4:
                    stack.append(float(_s64(v)))
                elif op == 0xB5:
                    stack.append(float(v))
                elif op == 0xB6:  # f32.demote_f64
                    stack.append(struct.unpack("<f", struct.pack("<f", v))[0])
                else:  # 0xB7 f64.convert_i32_s
                    stack.append(float(_s32(v)))
            elif op == 0xB8:
                stack.append(float(stack.pop()))
            elif op == 0xB9:
                stack.append(float(_s64(stack.pop())))
            elif op == 0xBA:
                stack.append(float(stack.pop()))
            elif op == 0xBB:  # f64.promote_f32
                stack.append(stack.pop())
            elif op == 0xBC:  # i32.reinterpret_f32
                stack.append(struct.unpack("<I", struct.pack("<f", stack.pop()))[0])
            elif op == 0xBD:  # i64.reinterpret_f64
                stack.append(struct.unpack("<Q", struct.pack("<d", stack.pop()))[0])
            elif op == 0xBE:  # f32.reinterpret_i32
                stack.append(struct.unpack("<f", struct.pack("<I", stack.pop() & _M32))[0])
            elif op == 0xBF:
                stack.append(struct.unpack("<d", struct.pack("<Q", stack.pop() & _M64))[0])
            elif op == 0xC0:  # i32.extend8_s
                v = stack.pop() & 0xFF
                stack.append((v - 256 if v & 0x80 else v) & _M32)
            elif op == 0xC1:  # i32.extend16_s
                v = stack.pop() & 0xFFFF
                stack.append((v - 65536 if v & 0x8000 else v) & _M32)
            elif op == 0xC2:  # i64.extend8_s
                v = stack.pop() & 0xFF
                stack.append((v - 256 if v & 0x80 else v) & _M64)
            elif op == 0xC3:
                v = stack.pop() & 0xFFFF
                stack.append((v - 65536 if v & 0x8000 else v) & _M64)
            elif op == 0xC4:
                v = stack.pop() & _M32
                stack.append((v - 0x100000000 if v & 0x80000000 else v) & _M64)
            elif op == 0x3F:  # memory.size
                stack.append(len(self.memory) // PAGE)
            elif op == 0x40:  # memory.grow
                delta = stack.pop()
                old = len(self.memory) // PAGE
                self.memory.extend(bytes(delta * PAGE))
                mem = self.memory
                stack.append(old)
            elif op == 0x00:
                raise Trap("unreachable")
            elif op == 0x01:  # nop
                pass
            elif op == 0xFC:
                sub = instr[1]
                if sub == 10:  # memory.copy
                    sz = stack.pop()
                    src = stack.pop()
                    dst = stack.pop()
                    mem[dst : dst + sz] = mem[src : src + sz]
                elif sub == 11:  # memory.fill
                    sz = stack.pop()
                    val = stack.pop()
                    dst = stack.pop()
                    mem[dst : dst + sz] = bytes([val & 0xFF]) * sz
                elif 0 <= sub <= 7:  # trunc_sat
                    v = stack.pop()
                    if math.isnan(v):
                        stack.append(0)
                    else:
                        t = _trunc(v)
                        if sub in (0, 2):  # i32 signed
                            t = max(-(2**31), min(2**31 - 1, t))
                            stack.append(t & _M32)
                        elif sub in (1, 3):  # i32 unsigned
                            t = max(0, min(2**32 - 1, t))
                            stack.append(t)
                        elif sub in (4, 6):
                            t = max(-(2**63), min(2**63 - 1, t))
                            stack.append(t & _M64)
                        else:
                            t = max(0, min(2**64 - 1, t))
                            stack.append(t)
                else:  # pragma: no cover
                    raise NotImplementedError(f"0xFC sub {sub}")
            elif op == 0xFD:  # SIMD (integer subset; see _simd)
                self._simd(instr[1], stack, mem)
            else:  # pragma: no cover
                raise NotImplementedError(f"opcode {op:#x}")
        self._depth -= 1
        return stack[-1] if stack else None

    def _fop(self, k: int, stack: list):
        """f32/f64 shared op table; k is the offset from the family base."""
        if k <= 6:  # unary
            v = stack.pop()
            if k == 0:
                return abs(v)
            if k == 1:
                return -v
            if k == 2:
                return float(math.ceil(v))
            if k == 3:
                return float(math.floor(v))
            if k == 4:
                return float(_trunc(v))
            if k == 5:  # nearest (round half to even)
                f = math.floor(v)
                d = v - f
                if d > 0.5:
                    return f + 1.0
                if d < 0.5:
                    return float(f)
                return float(f + (f % 2))
            return math.sqrt(v)
        b = stack.pop()
        a = stack.pop()
        if k == 7:
            return a + b
        if k == 8:
            return a - b
        if k == 9:
            return a * b
        if k == 10:
            return a / b if b != 0 else math.copysign(math.inf, a) * math.copysign(1, b)
        if k == 11:
            return min(a, b)
        if k == 12:
            return max(a, b)
        return math.copysign(a, b)  # k == 13

    def _branch(self, code: list, ctrl: list, depth: int, stack: list) -> int:
        """Take a branch ``depth`` levels up; returns the new pc."""
        target = ctrl[len(ctrl) - 1 - depth]
        for _ in range(depth + 1):
            ctrl.pop()
        opc, end_idx, height, start_idx, arity = target
        if opc == 0x03:  # loop: branch to loop head (re-push the frame)
            ctrl.append(target)
            # loop label params are empty (no multivalue in this binary)
            del stack[height:]
            return start_idx + 1
        # block/if: branch to end, keeping exactly `arity` result values
        if arity and len(stack) > height + arity:
            results = stack[len(stack) - arity :]
            del stack[height:]
            stack.extend(results)
        elif not arity:
            del stack[height:]
        return end_idx + 1

    def _call_into(self, func_idx: int, stack: list, expect_type: int | None = None):
        if func_idx < self.mod.n_imported_funcs:
            arg = stack.pop()
            stack.append(self._resize_heap(arg))
            return
        body = self.mod.bodies[func_idx - self.mod.n_imported_funcs]
        params, results = self.mod.types[body.type_idx]
        args = stack[len(stack) - len(params) :] if params else []
        if params:
            del stack[len(stack) - len(params) :]
        locals_ = args + [0] * len(body.locals)
        ret = self._exec(body.code, locals_)
        if results:
            stack.append(ret)

    # ── convenience: C-style memory access ───────────────────────────────

    def read_u32(self, addr: int) -> int:
        return int.from_bytes(self.memory[addr : addr + 4], "little")

    def read_cstr(self, addr: int) -> bytes:
        end = self.memory.index(0, addr)
        return bytes(self.memory[addr:end])

    def write_u32s(self, addr: int, values) -> None:
        for i, v in enumerate(values):
            self.memory[addr + 4 * i : addr + 4 * i + 4] = (v & _M32).to_bytes(4, "little")

    def read_u32s(self, addr: int, n: int) -> list[int]:
        return [self.read_u32(addr + 4 * i) for i in range(n)]


# ── reference decoder loading ────────────────────────────────────────────

REFERENCE_WASM = "/root/reference/src/wasm/decoder.wasm"
REFERENCE_GLUE = "/root/reference/src/wasm/decoder.js"


def load_name_map(glue_path: str = REFERENCE_GLUE) -> dict[str, str]:
    """Real C symbol -> minified wasm export name, parsed from the
    emscripten glue's assignWasmExports."""
    src = open(glue_path).read()
    pairs = re.findall(r'_(\w+)=Module\["_\w+"\]=wasmExports\["([^"]+)"\]', src)
    return dict(pairs)


class RefDecoder:
    """The reference decoder.wasm, instantiated and initialized, with
    C-name based calls and helpers for array in/out arguments."""

    def __init__(self, wasm_path: str = REFERENCE_WASM, glue_path: str = REFERENCE_GLUE,
                 trace_loads=None):
        mod = parse_module(open(wasm_path, "rb").read())
        self.inst = Instance(mod, trace_loads=trace_loads)
        self.names = load_name_map(glue_path)
        self.inst.call("c")  # __wasm_call_ctors (decoder.js calls it preRun)
        self.c("decoder_init")  # void: sets the initialized flags

    def c(self, name: str, *args: int):
        return self.inst.call(self.names[name], *args)

    def malloc(self, n: int) -> int:
        return self.c("malloc", n)

    def free(self, p: int) -> None:
        self.c("free", p)

    def unicode_version(self) -> str:
        ptr = self.c("decoder_get_unicode_version")
        return self.inst.read_cstr(ptr).decode()
