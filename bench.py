"""Headline benchmark: BPE training merges/sec on a single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: 16 MB synthetic Zipfian English-like corpus, 1024 merges (vocab
256→1280), deduplicated unique-word stream, batched device loop. Steady-state
rate (compile + ingestion excluded) — the same quantity the reference
instruments live (trainer.js:292,326, merges/s in the UI).

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}). We normalize against 100 merges/s — a representative rate
for the reference's fused 8-dispatch WebGPU pipeline on a consumer GPU at
this corpus size (O(table+N) per merge at a few hundred GB/s of effective
bandwidth). See BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MERGES_PER_SEC = 100.0
TARGET_MERGES = 1024
CORPUS_MB = 16


def synth_corpus(n_bytes: int, seed: int = 0) -> bytes:
    """Deterministic Zipfian word soup with newlines/digits/punct mixed in."""
    rng = np.random.default_rng(seed)
    vocab_words = [
        "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
        "was", "on", "are", "as", "with", "be", "at", "by", "this", "have",
        "from", "or", "one", "had", "not", "but", "what", "all", "were",
        "when", "we", "there", "can", "an", "your", "which", "their", "said",
        "if", "do", "will", "each", "about", "how", "up", "out", "them",
        "then", "she", "many", "some", "so", "these", "would", "other",
        "into", "has", "more", "her", "two", "like", "him", "see", "time",
        "could", "no", "make", "than", "first", "been", "its", "who", "now",
        "people", "my", "made", "over", "did", "down", "only", "way", "find",
        "use", "may", "water", "long", "little", "very", "after", "words",
        "called", "just", "where", "most", "know", "tokenization", "training",
        "vocabulary", "123456", "don't", "they'll",
    ]
    n_words = len(vocab_words)
    ranks = np.arange(1, n_words + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    parts = []
    size = 0
    chunk = 65536
    while size < n_bytes:
        idx = rng.choice(n_words, size=chunk, p=probs)
        text = " ".join(vocab_words[i] for i in idx)
        lines = [text[i : i + 80] for i in range(0, len(text), 80)]
        blob = ("\n".join(lines) + "\n").encode()
        parts.append(blob)
        size += len(blob)
    return b"".join(parts)[:n_bytes]


def main() -> None:
    import jax

    from gpu_bpe_tpu.ops import TPUTrainer, make_stream
    from gpu_bpe_tpu.pretok import PreTokenizer

    corpus = synth_corpus(CORPUS_MB << 20)
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize_bytes(corpus)
    stream = make_stream(data, starts, dedup=True)
    print(
        f"# corpus {len(data)>>20} MB -> {stream.n} unique-word symbols "
        f"({stream.dedup_ratio:.1f}x dedup) on {jax.devices()[0]}",
        file=sys.stderr,
    )

    # Warm-up: compile the batch step at the working capacity (excluded).
    warm = TPUTrainer()
    warm.train_stream(
        type(stream)(stream.symbols.copy(), stream.weights.copy(), stream.n, stream.total_bytes),
        target_vocab_size=256 + 8,
    )

    trainer = TPUTrainer()
    t0 = time.perf_counter()
    result = trainer.train_stream(stream, target_vocab_size=256 + TARGET_MERGES)
    dt = time.perf_counter() - t0
    merges = len(result.merges)
    rate = merges / dt
    print(f"# {merges} merges in {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_merges_per_sec",
                "value": round(rate, 2),
                "unit": "merges/s (16MB corpus, 1024 merges, 1 chip)",
                "vs_baseline": round(rate / BASELINE_MERGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
