"""Large-corpus streamed-training validation (BASELINE configs 3/5 envelope).

Synthesizes an N-GB Zipfian corpus on disk (reusing bench.py's generator,
written in slabs so host memory stays flat), streams it through
``api.train_files`` to a 32K vocab, and records wall time, peak RSS,
merges/s, and the model fingerprint as a checked-in artifact.

    python scripts/validate_stream.py --gb 10 --vocab 32768 \
        --out docs/artifacts/stream_10gb.json

The corpus file is cached at /tmp/stream_corpus_<gb>gb.txt and reused.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synth_slab_fast(n_bytes: int, seed: int, vocab_size: int = 120_000) -> bytes:
    """Vectorized Zipfian corpus slab (same flavor as bench.synth_corpus,
    ~40x faster: word table rendered once, slabs assembled with numpy)."""
    rng = np.random.default_rng(seed)
    syllables = [a + b for a in "btkdsmnlrpfgvz"
                 for b in ("a", "e", "i", "o", "u", "ar", "en", "il", "on", "ust")]
    syllables += ["tion", "ing", "er", "ed", "ly", "pre", "con", "anti", "ment", "ness"]
    n_syll = rng.integers(1, 5, size=vocab_size)
    syl_idx = rng.integers(0, len(syllables), size=int(n_syll.sum()))
    words = []
    pos = 0
    for k in n_syll:
        words.append("".join(syllables[i] for i in syl_idx[pos : pos + k]) + " ")
        pos += k
    # flat byte pool + offsets
    blobs = [w.encode() for w in words]
    lens = np.array([len(b) for b in blobs], np.int64)
    offs = np.zeros(vocab_size + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    pool = np.frombuffer(b"".join(blobs), np.uint8)

    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks**-1.05
    cdf = np.cumsum(probs / probs.sum())

    draws_per_round = 1 << 20
    out = np.empty(int(n_bytes * 1.05) + 64, np.uint8)
    written = 0
    while written < n_bytes:
        # inverse-CDF sampling (rng.choice with p= is ~10x slower)
        idx = np.searchsorted(cdf, rng.random(draws_per_round)).clip(0, vocab_size - 1)
        total = int(lens[idx].sum())
        # gather each word's bytes: repeat-based source index construction
        starts = offs[idx]
        wl = lens[idx]
        dst_off = np.zeros(len(idx), np.int64)
        np.cumsum(wl[:-1], out=dst_off[1:])
        flat = np.repeat(starts + wl - 1, wl)  # end positions repeated
        ramp = np.arange(total, dtype=np.int64) - np.repeat(dst_off + wl - 1, wl)
        src = flat + ramp  # contiguous indices per word
        chunk = pool[src]
        # newline every ~80 bytes (deterministic, may split words — same
        # artifact as the bench generator's line chunking)
        chunk[79::80] = 0x0A
        take = min(total, len(out) - written)
        out[written : written + take] = chunk[:take]
        written += take
    return out[:n_bytes].tobytes()


def synth_to_disk(path: str, n_bytes: int, slab: int = 1 << 28) -> None:
    """Fast Zipfian corpus written slab-by-slab (distinct seeds per slab)."""
    if os.path.exists(path) and os.path.getsize(path) == n_bytes:
        return
    t0 = time.time()
    with open(path, "wb") as f:
        written = 0
        seed = 0
        while written < n_bytes:
            blob = synth_slab_fast(min(slab, n_bytes - written), seed=seed)
            f.write(blob)
            written += len(blob)
            seed += 1
            print(f"  synth {written >> 20} / {n_bytes >> 20} MB "
                  f"({written / max(1e-9, time.time() - t0) / 1e6:.0f} MB/s)",
                  file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=10.0)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--out", default="docs/artifacts/stream_validation.json")
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    n_bytes = int(args.gb * (1 << 30))
    corpus_path = args.corpus or f"/tmp/stream_corpus_{args.gb:g}gb.txt"
    print(f"synthesizing {args.gb} GB corpus at {corpus_path}", file=sys.stderr)
    synth_to_disk(corpus_path, n_bytes)

    from gpu_bpe_tpu.api import TrainConfig, train_files

    t0 = time.time()
    tok, result = train_files(
        [corpus_path],
        TrainConfig(vocab_size=args.vocab, show_progress=True),
    )
    wall = time.time() - t0
    peak_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB (ru_maxrss in KB)

    merges = result.merges
    fp = hashlib.sha256(
        json.dumps([[a, b, c] for a, b, c in merges]).encode()
    ).hexdigest()[:16]

    # model round-trip: save -> load -> encode/decode a sample from the
    # corpus plus a fixed probe string; decode must invert encode exactly
    model_path = f"/tmp/stream_model_{args.gb:g}gb.json"
    tok.save(model_path)
    from gpu_bpe_tpu.api import load_model

    tok2 = load_model(model_path)
    with open(corpus_path, "rb") as f:
        sample = f.read(1 << 16).decode("utf-8", errors="ignore")
    probe = "The quick brown fox; étude 中文 2026!"
    roundtrip_ok = (
        tok2.decode_text(tok2.encode(sample)) == sample
        and tok2.decode_text(tok2.encode(probe)) == probe
        and tok2.encode(probe) == tok.encode(probe)
    )
    artifact = {
        "corpus_bytes": n_bytes,
        "corpus_gb": args.gb,
        "vocab_target": args.vocab,
        "merges": len(merges),
        "wall_seconds": round(wall, 1),
        "merges_per_sec_incl_ingest": round(len(merges) / wall, 1),
        "train_seconds": round(result.training_time_s, 1),
        "ingest_seconds_approx": round(wall - result.training_time_s, 1),
        "native_ingest": __import__(
            "gpu_bpe_tpu.ops.native", fromlist=["native_available"]
        ).native_available(),
        "peak_rss_gb": round(peak_rss, 2),
        "merge_list_sha256_16": fp,
        "model_roundtrip_ok": roundtrip_ok,
        "vocab_size": tok2.vocab_size,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
