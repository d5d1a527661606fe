"""Extended randomized conformance soak: tokenizer + trainer vs oracles.

Runs as many randomized trials as fit the time budget, split across:

* tokenizer: random vocabs (mixed length distributions engaging the dense
  join, the chained stab levels, and the wide walk) over random and
  token-soup corpora — TPUTokenizer output must equal the CPU greedy
  oracle byte-for-byte; a slice of trials also pins the rank-space chain
  (interpret Pallas) against the full-width chain.
* trainer: random small corpora — the device path's merge list must equal
  the exact CPU reference trainer.

Writes a JSON artifact with trial counts and the RNG seeds of any failure
(none expected; a failing seed reproduces deterministically).

    python scripts/soak_fuzz.py --minutes 30 --out docs/artifacts/soak_fuzz.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def random_vocab(rng, n_total, long_spec):
    toks = {bytes([b]) for b in range(256)}
    vocab = [bytes([b]) for b in range(256)]
    alpha_lo, alpha_hi = 97, 97 + int(rng.integers(4, 20))
    while len(vocab) < n_total:
        ln = int(rng.integers(2, 9))
        t = bytes(rng.integers(alpha_lo, alpha_hi, size=ln).tolist())
        if t not in toks:
            toks.add(t)
            vocab.append(t)
    longs = set()
    n_long, max_long = long_spec
    while len(longs) < n_long:
        ln = int(rng.integers(9, max_long + 1))
        t = bytes(rng.integers(alpha_lo, alpha_hi, size=ln).tolist())
        if t not in toks:
            longs.add(t)
    return vocab + sorted(longs), alpha_lo, alpha_hi


def tokenizer_trial(seed: int, rank_slice: bool) -> dict | None:
    """One randomized tokenizer trial; returns failure info or None."""
    import jax.numpy as jnp

    from gpu_bpe_tpu.core import GreedyTrieEncoder
    from gpu_bpe_tpu.ops.tokenize import TPUTokenizer, _stab_match

    rng = np.random.default_rng(seed)
    shape = int(rng.integers(0, 3))
    if shape == 0:  # small vocab -> dense join
        vocab, lo, hi = random_vocab(rng, 700, (0, 9))
    elif shape == 1:  # chained levels
        vocab, lo, hi = random_vocab(rng, 2600, (int(rng.integers(10, 60)), 32))
    else:  # wide walk (33..63-byte tokens)
        vocab, lo, hi = random_vocab(rng, 2600, (int(rng.integers(5, 20)), 60))

    pieces = [v for v in vocab[256:]]
    idx = rng.integers(0, len(pieces), size=1500)
    soup = b"".join(pieces[i] for i in idx)
    noise = bytes(rng.integers(lo, hi + 2, size=int(rng.integers(500, 30000))).tolist())
    data = (soup[:40000] + noise)[: int(rng.integers(2000, 60000))]

    chunk = int(rng.choice([512, 1024, 2048]))
    tok = TPUTokenizer(vocab, chunk_size=chunk)
    got = tok.encode_bytes(data)
    ref = GreedyTrieEncoder(vocab, chunk_size=chunk).encode(data)
    if not np.array_equal(got, np.asarray(ref, np.uint32)):
        return {"kind": "tokenizer", "seed": seed, "stage": "oracle"}

    if rank_slice and tok.tables.stab and tok.tables.stab.get("levels"):
        n = 1 << max(16, (len(data) - 1).bit_length())
        buf = np.zeros(n, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        d = jnp.asarray(buf).astype(jnp.uint32)
        ln = jnp.asarray(len(data), jnp.int32)
        full = _stab_match(d, tok.tables.stab, ln, chunk, rank_mode="off")
        rank = _stab_match(d, tok.tables.stab, ln, chunk, rank_mode="interpret")
        if not np.array_equal(np.asarray(full), np.asarray(rank)):
            return {"kind": "tokenizer", "seed": seed, "stage": "rank_vs_full"}
    return None


def trainer_trial(seed: int) -> dict | None:
    from gpu_bpe_tpu.core import ReferenceTrainer, bytes_to_symbols, tag_word_boundaries
    from gpu_bpe_tpu.ops import TPUTrainer, make_stream

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 40000))
    # word-ish text: runs of letters with random word starts
    data = bytes(rng.integers(97, 97 + int(rng.integers(3, 24)), size=n).tolist())
    starts = np.zeros(n, np.uint8)
    pos = 0
    while pos < n:
        starts[pos] = 1
        pos += int(rng.integers(1, 12))
    target = 256 + int(rng.integers(8, 200))

    stream = make_stream(data, starts, dedup=bool(rng.integers(0, 2)))
    res = TPUTrainer().train_stream(stream, target_vocab_size=target)
    sym = tag_word_boundaries(bytes_to_symbols(np.frombuffer(data, np.uint8)), starts)
    ref = ReferenceTrainer().train(sym, target_vocab_size=target)
    if res.merges != ref.merges:
        return {"kind": "trainer", "seed": seed, "stage": "merge_list"}
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--seed0", type=int, default=1000)
    ap.add_argument("--out", default="docs/artifacts/soak_fuzz.json")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    deadline = time.time() + args.minutes * 60
    failures: list[dict] = []
    n_tok = n_rank = n_train = 0
    seed = args.seed0
    while time.time() < deadline:
        rank_slice = (seed % 5) == 0  # interpret Pallas is slow; sample it
        f = tokenizer_trial(seed, rank_slice)
        n_tok += 1
        n_rank += int(rank_slice)
        if f:
            failures.append(f)
        if time.time() >= deadline:
            break
        f = trainer_trial(seed + 1_000_000)
        n_train += 1
        if f:
            failures.append(f)
        seed += 1
        print(f"\r{n_tok} tokenizer ({n_rank} rank) + {n_train} trainer trials, "
              f"{len(failures)} failures", end="", file=sys.stderr, flush=True)
    print(file=sys.stderr)

    artifact = {
        "tokenizer_trials": n_tok,
        "rank_vs_full_trials": n_rank,
        "trainer_trials": n_train,
        "failures": failures,
        "seed_range": [args.seed0, seed],
        "minutes": args.minutes,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
