"""Sub-stage device timing of _stab_match (level-1 join) on the real TPU.

Times, at the production 16 MB pass shape (n = 2^24) with the bench's
8K-vocab stab tables:
  - seg_join_sort: the segmented 3-operand level-1 join sort alone
  - overlay_fit:   the paren-overlay doubling scan + deepest-fit on the
                   sorted stream
  - restore_sort:  the 3-operand (key2, packed, gid) restore sort
  - rank_chain:    compaction + levels>=2 joins + expansion
  - window_pack:   the 14 rolls + key-word packing
Each stage is timed with chained dispatches + one scalar readback
(block_until_ready is a no-op on this tunnel).

Usage: python scripts/profile_stab.py [--mb 16] [--vocab 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


def timed(fn, *args, reps=(2, 6)):
    out = fn(*args)
    sync(out)
    ts = []
    for k in reps:
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (reps[1] - reps[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=8192)
    args = ap.parse_args()

    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from gpu_bpe_tpu.core.model_io import BPEModel
    from gpu_bpe_tpu.ops import TPUTrainer, make_stream
    from gpu_bpe_tpu.ops import tokenize as tz
    from gpu_bpe_tpu.pretok import PreTokenizer

    cache = f"/tmp/profile_vocab_{args.vocab}.json"
    corpus = bench.synth_corpus(args.mb << 20)
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize_bytes(corpus)
    data = np.frombuffer(bytes(data), dtype=np.uint8)
    if os.path.exists(cache):
        vocab = BPEModel.load(cache).vocab
    else:
        stream = make_stream(data, starts, dedup=True)
        result = TPUTrainer().train_stream(stream, target_vocab_size=args.vocab)
        BPEModel(vocab=result.vocab, merges=result.merges).save(cache)
        vocab = result.vocab

    tok = tz.TPUTokenizer(vocab)
    stab = tok.tables.stab
    assert stab is not None
    pass_bytes = min(len(data), tok.max_pass_bytes)
    cap = 1 << 16
    while cap < pass_bytes:
        cap <<= 1
    cap = -(-cap // tok.chunk_size) * tok.chunk_size
    buf = np.zeros(cap, dtype=np.uint8)
    buf[:pass_bytes] = data[:pass_bytes]
    dbuf = jax.device_put(jnp.asarray(buf).astype(jnp.uint32))
    nlen = jnp.asarray(pass_bytes, jnp.int32)
    n = cap
    chunk_size = tok.chunk_size

    mb = pass_bytes / 1e6
    print(json.dumps({"n": n, "stab_count": int(stab["count"]),
                      "levels": len(stab["levels"]),
                      "seg": tz._seg_shape(n, 2 * stab["count"])}), flush=True)

    def report(name, secs):
        print(json.dumps({"stage": name, "ms": round(secs * 1e3, 2),
                          "mb_per_sec": round(mb / secs, 1)}), flush=True)

    v = stab["count"]
    ow = jnp.asarray(stab["open_words"])
    cw = jnp.asarray(stab["close_words"])
    vln = jnp.asarray(stab["ln"])
    vid = jnp.asarray(stab["id"])
    levels = stab["levels"]

    # ── window packing (rolls) alone ──
    @jax.jit
    def pack_only(du):
        n_shift = tz._STAB_MAX_LEN + tz._STAB_MAX_SUFFIX * len(levels)
        shifted = [jnp.roll(du, -k) for k in range(n_shift)]
        pw0 = (shifted[0] << 24) | (shifted[1] << 16) | (shifted[2] << 8) | shifted[3]
        pw1 = (shifted[4] << 24) | (shifted[5] << 16) | (shifted[6] << 8) | shifted[7]
        acc = pw0 ^ pw1
        for li in range(len(levels)):
            base = tz._stab_coverage(li + 1)
            acc = acc ^ (shifted[base] << jnp.uint32(8)) | shifted[base + 1]
        return acc[::65536]

    report("window_pack", timed(pack_only, dbuf))

    # ── segmented join sort alone (exact production shape) ──
    nseg, seg = tz._seg_shape(n, 2 * v)

    @jax.jit
    def seg_sort_only(du):
        shifted = [jnp.roll(du, -k) for k in range(8)]
        pw = [
            (shifted[w * 4] << 24) | (shifted[w * 4 + 1] << 16)
            | (shifted[w * 4 + 2] << 8) | shifted[w * 4 + 3]
            for w in range(2)
        ]
        iota = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        if nseg > 1:
            padn = nseg * seg

            def cat(p, o, c, fill):
                if padn > n:
                    p = jnp.concatenate([p, jnp.full((padn - n,), fill, p.dtype)])
                return jnp.concatenate(
                    [p.reshape(nseg, seg),
                     jnp.broadcast_to(o, (nseg, v)),
                     jnp.broadcast_to(c, (nseg, v))], axis=-1)
        else:
            def cat(p, o, c, fill):
                return jnp.concatenate([p, o, c])
        k0 = cat(pw[0], ow[:, 0], cw[:, 0], jnp.uint32(0xFFFFFFFF))
        k1 = cat(pw[1], ow[:, 1], cw[:, 1], jnp.uint32(0xFFFFFFFF))
        kp = cat(
            tz._k3(jnp.uint32(1), jnp.uint32(0), iota),
            tz._k3(jnp.uint32(0), vln, vid),
            tz._k3(jnp.uint32(2), vln, vid),
            tz._k3(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0x1FFFFFF)),
        )
        a, b, c = lax.sort((k0, k1, kp), num_keys=3)
        return c.reshape(-1)[::65536]

    report("seg_join_sort", timed(seg_sort_only, dbuf))

    # build the sorted stream once for downstream stages
    @jax.jit
    def sorted_kp(du):
        shifted = [jnp.roll(du, -k) for k in range(8)]
        pw = [
            (shifted[w * 4] << 24) | (shifted[w * 4 + 1] << 16)
            | (shifted[w * 4 + 2] << 8) | shifted[w * 4 + 3]
            for w in range(2)
        ]
        iota = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        if nseg > 1:
            padn = nseg * seg

            def cat(p, o, c, fill):
                if padn > n:
                    p = jnp.concatenate([p, jnp.full((padn - n,), fill, p.dtype)])
                return jnp.concatenate(
                    [p.reshape(nseg, seg),
                     jnp.broadcast_to(o, (nseg, v)),
                     jnp.broadcast_to(c, (nseg, v))], axis=-1)
        else:
            def cat(p, o, c, fill):
                return jnp.concatenate([p, o, c])
        k0 = cat(pw[0], ow[:, 0], cw[:, 0], jnp.uint32(0xFFFFFFFF))
        k1 = cat(pw[1], ow[:, 1], cw[:, 1], jnp.uint32(0xFFFFFFFF))
        kp = cat(
            tz._k3(jnp.uint32(1), jnp.uint32(0), iota),
            tz._k3(jnp.uint32(0), vln, vid),
            tz._k3(jnp.uint32(2), vln, vid),
            tz._k3(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0x1FFFFFF)),
        )
        _, _, skp = lax.sort((k0, k1, kp), num_keys=3)
        return skp

    skp = sorted_kp(dbuf)
    sync(skp)
    m = seg + 2 * v if nseg > 1 else n + 2 * v
    depths = tz._GROUP_DEPTH + 1 if levels else tz._STAB_MAX_LEN + 1

    # ── overlay scan + deepest fit ──
    @jax.jit
    def overlay_fit(skp_in, input_len):
        sflag = skp_in >> jnp.uint32(30)
        vals, openb, spay = tz._paren_overlay(sflag, skp_in, m, depths)
        packed = tz._deepest_fit(vals, openb, spay, sflag, input_len,
                                 chunk_size, 0, tz._STAB_MAX_LEN)
        return packed.reshape(-1)[::65536]

    report("overlay_fit", timed(overlay_fit, skp, nlen))

    # ── restore sort (3-operand) on realistic data ──
    @jax.jit
    def make_restore_inputs(skp_in, input_len):
        sflag = skp_in >> jnp.uint32(30)
        vals, openb, spay = tz._paren_overlay(sflag, skp_in, m, depths)
        packed = tz._deepest_fit(vals, openb, spay, sflag, input_len,
                                 chunk_size, 0, tz._STAB_MAX_LEN)
        key2 = jnp.where(sflag == 1, spay, jnp.uint32(0xFFFFFFFF))
        in_group = ((openb >> jnp.uint32(tz._GROUP_DEPTH)) & 1) == 1
        gid = jnp.where(in_group & (sflag == 1),
                        vals[tz._GROUP_DEPTH].astype(jnp.uint32), tz._NO_GROUP)
        return key2, packed, gid

    key2, packed, gid = make_restore_inputs(skp, nlen)
    sync(gid)

    @jax.jit
    def restore_only(k2, pk, gd):
        _, ps, gs = lax.sort((k2, pk, gd), num_keys=1)
        return ps.reshape(-1)[::65536] ^ gs.reshape(-1)[::65536]

    report("restore_sort", timed(restore_only, key2, packed, gid))

    # ── full level-1 (sort + overlay + fit + restore), then full stab ──
    @jax.jit
    def full_stab(du, input_len):
        return tz._stab_match(du, stab, input_len, chunk_size)[::65536]

    report("full_stab", timed(full_stab, dbuf, nlen))

    # rank chain cost ~= full_stab - (window_pack + seg_join_sort +
    # overlay_fit + restore_sort); print for the record


if __name__ == "__main__":
    main()
