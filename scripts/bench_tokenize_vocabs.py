"""Tokenize device/wall rates across vocab sizes (BASELINE config-4 axis).

Trains real vocabs at several sizes on a synthetic Zipfian corpus (cached
per size), then measures bulk tokenization:

* device MB/s — chained dispatches of the jitted pass over a resident
  buffer, one scalar readback (the axon host link is ~25 MB/s and would
  otherwise dominate; PCIe hosts see the device rate)
* wall MB/s — encode_bytes end-to-end including u16 page readback
* bytes/token, the fast-path shape (stab levels, dense lengths), and the
  walk variant in use

    python scripts/bench_tokenize_vocabs.py --sizes 1024 8192 32768 65536 \
        --out docs/artifacts/tokenize_rates.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def train_vocab(stream_factory, size: int, cache_dir: str) -> list[bytes]:
    """Train (or load cached) vocab of ``size`` tokens."""
    path = os.path.join(cache_dir, f"vocab_{size}.json")
    from gpu_bpe_tpu.core.model_io import BPEModel

    if os.path.exists(path):
        return BPEModel.load(path).vocab
    from gpu_bpe_tpu.ops import TPUTrainer

    result = TPUTrainer().train_stream(stream_factory(), target_vocab_size=size)
    BPEModel(vocab=result.vocab, merges=result.merges).save(path)
    return result.vocab


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1024, 8192, 32768, 65536])
    ap.add_argument("--corpus-mb", type=int, default=64,
                    help="training corpus size (larger -> longer tokens at 64K)")
    ap.add_argument("--out", default="docs/artifacts/tokenize_rates.json")
    ap.add_argument("--cache", default="/tmp/tokenize_vocab_cache")
    args = ap.parse_args()
    os.makedirs(args.cache, exist_ok=True)

    import jax

    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from bench import synth_corpus
    from gpu_bpe_tpu.ops import make_stream
    from gpu_bpe_tpu.ops.tokenize import TPUTokenizer
    from gpu_bpe_tpu.pretok import PreTokenizer

    corpus = synth_corpus(args.corpus_mb << 20)
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize_bytes(corpus)
    stream = make_stream(data, starts, dedup=True)
    raw = data.tobytes() if hasattr(data, "tobytes") else bytes(data)

    def stream_factory():
        return type(stream)(
            stream.symbols.copy(), stream.weights.copy(), stream.n, stream.total_bytes
        )

    rows = []
    for size in args.sizes:
        vocab = train_vocab(stream_factory, size, args.cache)
        tok = TPUTokenizer(vocab)
        stab = tok.tables.stab
        pass_bytes = min(len(raw), tok.max_pass_bytes)
        chunk = raw[:pass_bytes]

        # wall + warm-up + bytes/token
        tokens = tok.encode_bytes(chunk)
        t0 = time.perf_counter()
        tokens = tok.encode_bytes(chunk)
        wall = pass_bytes / (time.perf_counter() - t0) / 1e6

        # device rate on a resident buffer
        cap = 1 << 16
        while cap < pass_bytes:
            cap <<= 1
        cap = -(-cap // tok.chunk_size) * tok.chunk_size
        buf = np.zeros(cap, np.uint8)
        buf[:pass_bytes] = np.frombuffer(chunk, np.uint8)
        dbuf = jax.device_put(jnp.asarray(buf))
        nlen = jnp.asarray(pass_bytes, jnp.int32)

        def timed(t, k):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = t._encode_pass(dbuf, nlen)
            int(r[1])
            return time.perf_counter() - t0

        timed(tok, 1)
        t2, t6 = timed(tok, 2), timed(tok, 6)
        dev = 4 * pass_bytes / max(1e-9, t6 - t2) / 1e6

        # A/B: full-width level chain (rank space off) for comparison —
        # a separate tokenizer instance so each mode traces its own pass
        dev_off = None
        if stab and stab.get("levels"):
            tok_off = TPUTokenizer(vocab, rank_mode="off")
            timed(tok_off, 1)
            t2o, t6o = timed(tok_off, 2), timed(tok_off, 6)
            dev_off = round(4 * pass_bytes / max(1e-9, t6o - t2o) / 1e6, 1)

        max_len = tok.tables.max_token_len
        walk = ("scan32" if max_len <= 31 else
                "scan64" if max_len <= 63 else "gather")
        row = {
            "vocab": len(vocab),
            "device_mb_per_sec": round(dev, 1),
            "device_mb_per_sec_rank_off": dev_off,
            "wall_mb_per_sec": round(wall, 1),
            "bytes_per_token": round(pass_bytes / max(1, len(tokens)), 2),
            "max_token_len": max_len,
            "stab_levels": (1 + len(stab["levels"])) if stab else 0,
            "dense_lengths": tok.tables.dense_lengths,
            "walk": walk,
            "pass_mb": pass_bytes >> 20,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    artifact = {
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "corpus_mb": args.corpus_mb,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
