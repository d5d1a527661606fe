"""Stage-level device timing of the bulk tokenizer (real TPU).

Breaks one encode pass into stages and times each with k-chained dispatches
plus one scalar readback (block_until_ready is a no-op on the axon tunnel;
device execution is in-order, so syncing on the k-th completion bounds all
earlier ones). Emits one JSON line per stage to stdout.

Usage: python scripts/profile_tokenize.py [--mb 16] [--vocab 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=(2, 6)):
    """Seconds per call: difference quotient of two chained-dispatch runs."""
    out = fn(*args)  # warm (compile)
    sync(out)
    ts = []
    for k in reps:
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (reps[1] - reps[0])


def sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=8192)
    args = ap.parse_args()

    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import bench
    from gpu_bpe_tpu.core.model_io import BPEModel
    from gpu_bpe_tpu.ops import TPUTrainer, make_stream
    from gpu_bpe_tpu.ops.tokenize import TPUTokenizer, build_match_table, chunk_walk
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

    tok = TPUTokenizer(vocab)
    pass_bytes = min(len(data), tok.max_pass_bytes)
    cap = 1 << 16
    while cap < pass_bytes:
        cap <<= 1
    cap = -(-cap // tok.chunk_size) * tok.chunk_size
    buf = np.zeros(cap, dtype=np.uint8)
    buf[:pass_bytes] = data[:pass_bytes]
    dbuf = jax.device_put(jnp.asarray(buf))
    nlen = jnp.asarray(pass_bytes, jnp.int32)

    mb = pass_bytes / 1e6
    results = {}

    def report(name, secs):
        results[name] = secs
        print(json.dumps({"stage": name, "ms": round(secs * 1e3, 2),
                          "mb_per_sec": round(mb / secs, 1)}), flush=True)

    # ── full pass ──
    report("full_pass", timed(tok._encode_pass, dbuf, nlen))

    # ── match table (stab levels + dense joins) ──
    @jax.jit
    def match_only(d, n):
        mid, mlen = build_match_table(d, tok.tables, n, tok.chunk_size)
        return jnp.sum(mid) + jnp.sum(mlen)

    report("match_table", timed(match_only, dbuf, nlen))

    # ── stab join only (no dense lengths) ──
    if tok.tables.stab is not None:
        from gpu_bpe_tpu.ops.tokenize import _stab_match

        @jax.jit
        def stab_only(d, n):
            return jnp.sum(_stab_match(d.astype(jnp.uint32), tok.tables.stab, n, tok.chunk_size))

        report("stab_match", timed(stab_only, dbuf, nlen))

        # level-1 join sort alone (3-operand, n + 2v rows)
        v = tok.tables.stab["count"]
        ow = jnp.asarray(tok.tables.stab["open_words"])
        cw = jnp.asarray(tok.tables.stab["close_words"])

        @jax.jit
        def sort_only(d):
            du = d.astype(jnp.uint32)
            n = du.shape[0]
            sh = [jnp.roll(du, -k) for k in range(8)]
            pw = [
                (sh[w * 4] << 24) | (sh[w * 4 + 1] << 16) | (sh[w * 4 + 2] << 8) | sh[w * 4 + 3]
                for w in range(2)
            ]
            iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
            k0 = jnp.concatenate([pw[0], ow[:, 0], cw[:, 0]])
            k1 = jnp.concatenate([pw[1], ow[:, 1], cw[:, 1]])
            kp = jnp.concatenate([iota, jnp.zeros((2 * v,), jnp.uint32)])
            a, b, c = jax.lax.sort((k0, k1, kp), num_keys=3)
            return a[0] + b[0] + c[0]

        report("join_sort_l1", timed(sort_only, dbuf))

    # ── walk only (on precomputed match table) ──
    mid, mlen = jax.jit(
        lambda d, n: build_match_table(d, tok.tables, n, tok.chunk_size)
    )(dbuf, nlen)
    sync(mid)

    @jax.jit
    def walk_only(mi, ml, d, n):
        t, c = chunk_walk(mi, ml, d, n, tok.chunk_size)
        return jnp.sum(c)

    report("chunk_walk", timed(walk_only, mid, mlen, dbuf, nlen))

    # ── compaction variants (on walk output) ──
    tokens, _ = jax.jit(
        lambda mi, ml, d, n: chunk_walk(mi, ml, d, n, tok.chunk_size)
    )(mid, mlen, dbuf, nlen)
    sync(tokens)
    flat = tokens.reshape(-1)

    @jax.jit
    def strip_sort(f):
        nn = f.shape[0]
        valid = f != jnp.uint32(0xFFFFFFFF)
        iot = jax.lax.broadcasted_iota(jnp.uint32, (nn,), 0)
        key = jnp.where(valid, iot, jnp.uint32(0xFFFFFFFF))
        _, c = jax.lax.sort((key, f.astype(jnp.uint16)), num_keys=1)
        return c[0].astype(jnp.int32) + jnp.sum(valid, dtype=jnp.int32)

    report("strip_sort", timed(strip_sort, flat))

    from gpu_bpe_tpu.ops.pallas_kernels import compact_valid

    @jax.jit
    def strip_pallas(f):
        out, total = compact_valid(f)
        return out[0].astype(jnp.int32) + total

    report("strip_pallas", timed(strip_pallas, flat))

    known = sum(v for k, v in results.items() if k in ("match_table", "chunk_walk", "strip_pallas"))
    print(json.dumps({"stage": "summary", "vocab": args.vocab,
                      "full_ms": round(results["full_pass"] * 1e3, 1),
                      "accounted_ms": round(known * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
