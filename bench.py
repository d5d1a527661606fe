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


def synth_corpus(n_bytes: int, seed: int = 0, vocab_size: int = 120_000) -> bytes:
    """Deterministic Zipfian text over a large synthetic word vocabulary.

    Words are syllable compositions (realistic length distribution, shared
    sub-word structure for BPE to exploit); Zipf rank-frequency sampling
    yields real-text-like unique-word dedup ratios (~5-10x at 16 MB).
    """
    rng = np.random.default_rng(seed)
    syllables = np.array(
        [a + b for a in "btkdsmnlrpfgvz" for b in ("a", "e", "i", "o", "u", "ar", "en", "il", "on", "ust")]
        + ["tion", "ing", "er", "ed", "ly", "pre", "con", "anti", "ment", "ness"],
        dtype=object,
    )
    n_syll = rng.integers(1, 5, size=vocab_size)
    words = []
    for k in n_syll:
        idx = rng.integers(0, len(syllables), size=k)
        words.append("".join(syllables[i] for i in idx))
    words = np.array(words, dtype=object)

    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks**-1.05
    probs /= probs.sum()

    parts = []
    size = 0
    while size < n_bytes:
        idx = rng.choice(vocab_size, size=65536, p=probs)
        text = " ".join(words[i] for i in idx)
        lines = [text[i : i + 80] for i in range(0, len(text), 80)]
        blob = ("\n".join(lines) + "\n").encode()
        parts.append(blob)
        size += len(blob)
    return b"".join(parts)[:n_bytes]


def main() -> None:
    import jax

    # Persistent compile cache: amortizes the expensive TPU compiles of the
    # batched merge step across runs and capacity levels.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
