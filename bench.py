"""Headline benchmark: BPE training merges/sec on a single chip.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.

Two auxiliary JSON lines go to stderr (captured in the driver's tail):
  - kernel_selftest: the Pallas merge/tracking kernel regression cases run
    ON THE REAL CHIP (CI runs them interpret-only; the historic 64 MB-scale
    bugs were Mosaic-lowering artifacts invisible to interpret mode).
  - tokenize_mb_per_sec: bulk tokenization device + wall rate and
    bytes/token at an 8K vocab — the second performance axis the reference
    instruments live (export-controller.js:209-265).

Config: 16 MB synthetic Zipfian English-like corpus, 1024 merges (vocab
256→1280), deduplicated unique-word stream, batched device loop. Steady-state
rate (compile + ingestion excluded) — the same quantity the reference
instruments live (trainer.js:292,326, merges/s in the UI).

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}). We normalize against 100 merges/s — a representative rate
for the reference's fused 8-dispatch WebGPU pipeline on a consumer GPU at
this corpus size (O(table+N) per merge at a few hundred GB/s of effective
bandwidth). Tokenize vs_baseline normalizes against 250 MB/s (the same
class of GPU walking the trie at a few bytes/cycle/thread). See BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MERGES_PER_SEC = 100.0
BASELINE_TOKENIZE_MB_S = 250.0
TARGET_MERGES = 1024
CORPUS_MB = 16
TOKENIZE_VOCAB = 8192  # multi-byte-rich vocab exercising the stab join


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


# tokenizer-kernel selftest cases: a failure here downgrades the tokenizer
# to its XLA paths (kill switch) instead of killing the bench — the MERGE
# kernel cases remain fatal (training correctness rides on them)
_TOKENIZER_CASES = ("compact_valid", "compact_expand_roundtrip")


def run_selftest() -> None:
    """Pallas kernel regressions on the real chip; fail the bench loudly."""
    import os

    from gpu_bpe_tpu.ops.selftest import run_kernel_selftest

    t0 = time.perf_counter()
    results = run_kernel_selftest(interpret=False)
    dt = time.perf_counter() - t0
    print(
        json.dumps({"metric": "kernel_selftest", "value": results, "seconds": round(dt, 1)}),
        file=sys.stderr,
    )
    core_bad = [k for k, v in results.items() if not v and k not in _TOKENIZER_CASES]
    tok_bad = [k for k in _TOKENIZER_CASES if not results.get(k, False)]
    if core_bad:
        print(f"FATAL: on-TPU kernel selftest failed: {core_bad}", file=sys.stderr)
        raise SystemExit(1)
    if tok_bad:
        print(f"# tokenizer kernels failed selftest ({tok_bad}); "
              "disabling tokenizer Pallas paths for this run", file=sys.stderr)
        os.environ["GPU_BPE_TPU_NO_TOKENIZE_PALLAS"] = "1"


def _synth_vocab_64k(corpus: bytes) -> list[bytes]:
    """Deterministic 65,536-entry vocab from the corpus's frequent words.

    Training 65K merges inside the bench would dominate its runtime; the
    tokenize rate depends on the vocab's SHAPE (entry count, length
    distribution, shared prefixes — they set the stab levels and dense
    lengths), not its provenance, so the wide-walk row uses corpus words
    and their prefixes instead. scripts/bench_tokenize_vocabs.py remains
    the trained-vocab measurement (docs/artifacts/tokenize_rates.json)."""
    vocab: list[bytes] = [bytes([b]) for b in range(256)]
    seen = set(vocab)
    words = corpus.split()
    from collections import Counter

    freq = Counter(words)
    for w, _ in freq.most_common():
        if len(vocab) >= 65536:
            break
        for end in range(2, min(len(w), 20) + 1):
            cand = w[:end]
            if cand not in seen:
                seen.add(cand)
                vocab.append(cand)
                if len(vocab) >= 65536:
                    break
    # pad with deterministic numeric strings if the corpus runs dry
    k = 0
    while len(vocab) < 65536:
        cand = b"#%d" % k
        if cand not in seen:
            seen.add(cand)
            vocab.append(cand)
        k += 1
    return vocab


def _device_rate_row(tok, corpus: bytes, vocab_label: str) -> None:
    """One auxiliary tokenize row (device rate only) on a trained/synth
    vocab — regression coverage for the dense-join (1K) and wide-walk
    (64K) paths that the headline 8K row does not exercise."""
    import jax
    import jax.numpy as jnp

    pass_bytes = min(len(corpus), tok.max_pass_bytes)
    cap = 1 << 16
    while cap < pass_bytes:
        cap <<= 1
    cap = -(-cap // tok.chunk_size) * tok.chunk_size
    buf = np.zeros(cap, dtype=np.uint8)
    buf[:pass_bytes] = np.frombuffer(corpus[:pass_bytes], dtype=np.uint8)
    dbuf = jax.device_put(jnp.asarray(buf))
    nlen = jnp.asarray(pass_bytes, jnp.int32)

    def timed(k: int) -> float:
        t0 = time.perf_counter()
        total = None
        for _ in range(k):
            _pages, total = tok._encode_pass(dbuf, nlen)
        int(total)
        return time.perf_counter() - t0

    try:
        timed(1)  # warm/compile
        t2, t6 = timed(2), timed(6)
    except Exception as e:  # pragma: no cover - device-lowering guard
        print(json.dumps({"metric": "tokenize_mb_per_sec", "value": 0.0,
                          "unit": f"device MB/s (vocab {vocab_label})",
                          "error": f"{type(e).__name__}: {e}"}), file=sys.stderr)
        return
    rate = 4 * pass_bytes / max(1e-9, t6 - t2) / 1e6
    n_levels = len(tok.tables.stab["levels"]) + 1 if tok.tables.stab else 0
    print(json.dumps({
        "metric": "tokenize_mb_per_sec",
        "value": round(rate, 1),
        "unit": f"device MB/s ({pass_bytes >> 20}MB pass, vocab {vocab_label}, 1 chip)",
        "stab_levels": n_levels,
        "dense_lengths": tok.tables.dense_lengths,
    }), file=sys.stderr)


def bench_tokenize(stream, corpus: bytes) -> None:
    """Second axis: bulk tokenization MB/s at a real trained 8K vocab.

    Reports BOTH the device-side rate (chained dispatches, one scalar
    readback — ``block_until_ready`` is a no-op on this tunnel) and the
    end-to-end wall rate including the u16 page readback. Two auxiliary
    rows cover the other match-table paths: a trained 1K vocab (dense
    join) and a synthetic 64K vocab (full stab chain + wide walk).
    """
    from gpu_bpe_tpu.ops import TPUTrainer
    from gpu_bpe_tpu.ops.tokenize import _RANK_MIN_N, TPUTokenizer, _rank_use_pallas

    trainer = TPUTrainer()

    # auxiliary row 1: trained 1K vocab — dense-join path
    def fresh():
        return type(stream)(
            stream.symbols.copy(), stream.weights.copy(), stream.n, stream.total_bytes
        )

    r1k = trainer.train_stream(fresh(), target_vocab_size=1024)
    _device_rate_row(TPUTokenizer(r1k.vocab), corpus, "1024")
    # auxiliary row 2: synthetic 64K vocab — full stab chain + wide paths
    _device_rate_row(TPUTokenizer(_synth_vocab_64k(corpus)), corpus, "65536-synth")

    result = trainer.train_stream(fresh(), target_vocab_size=TOKENIZE_VOCAB)
    tok = TPUTokenizer(result.vocab)
    n_levels = len(tok.tables.stab["levels"]) + 1 if tok.tables.stab else 0
    max_len = tok.tables.max_token_len
    print(
        f"# tokenize vocab {len(result.vocab)} (max token {max_len}B, "
        f"{n_levels} stab levels, dense lengths {tok.tables.dense_lengths})",
        file=sys.stderr,
    )

    # one full pass of data on device, padded to the pass capacity
    pass_bytes = min(len(corpus), tok.max_pass_bytes)
    chunk = corpus[:pass_bytes]

    # warm-up compile + correctness anchor: count tokens for bytes/token.
    # If the rank-space level chain fails to lower on this chip, fall back
    # to the full-width chain rather than losing the bench artifact.
    rank_mode = None
    try:
        tokens = tok.encode_bytes(chunk)
    except Exception as e:  # pragma: no cover - device-lowering guard
        print(f"# rank-space chain failed ({type(e).__name__}: {e}); "
              "retrying with rank_mode=off", file=sys.stderr)
        rank_mode = "off"
        tok = TPUTokenizer(result.vocab, rank_mode="off")
        tokens = tok.encode_bytes(chunk)
    bytes_per_token = pass_bytes / max(1, len(tokens))

    # device rate: upload once, k chained dispatches of the jitted pass,
    # one scalar readback at the end (the host link is ~25 MB/s here — a
    # per-call upload would dominate; standard PCIe hosts don't pay this)
    import jax
    import jax.numpy as jnp

    cap = 1 << 16
    while cap < pass_bytes:
        cap <<= 1
    cap = -(-cap // tok.chunk_size) * tok.chunk_size
    buf = np.zeros(cap, dtype=np.uint8)
    buf[:pass_bytes] = np.frombuffer(chunk, dtype=np.uint8)
    dbuf = jax.device_put(jnp.asarray(buf))
    nlen = jnp.asarray(pass_bytes, jnp.int32)

    def timed(k: int) -> float:
        t0 = time.perf_counter()
        total = None
        for _ in range(k):
            _pages, total = tok._encode_pass(dbuf, nlen)
        int(total)  # sync: k-th completion implies all earlier (one stream)
        return time.perf_counter() - t0

    timed(1)  # warm
    t2, t6 = timed(2), timed(6)
    device_rate = 4 * pass_bytes / max(1e-9, t6 - t2) / 1e6

    # wall rate: end-to-end encode incl. page readback
    t0 = time.perf_counter()
    tokens = tok.encode_bytes(chunk)
    wall_rate = pass_bytes / (time.perf_counter() - t0) / 1e6

    print(
        json.dumps(
            {
                "metric": "tokenize_mb_per_sec",
                "value": round(device_rate, 1),
                "unit": f"device MB/s ({pass_bytes >> 20}MB pass, vocab {TOKENIZE_VOCAB}, 1 chip)",
                "wall_mb_per_sec": round(wall_rate, 1),
                "bytes_per_token": round(bytes_per_token, 2),
                # true only when the rank-space chain actually served the
                # measured pass: not killed (selftest switch / env), not
                # forced off by the lowering fallback, and the pass large
                # enough to engage it
                "rank_space": (
                    rank_mode is None
                    and _rank_use_pallas()
                    and pass_bytes >= _RANK_MIN_N
                    and bool(tok.tables.stab and tok.tables.stab.get("levels"))
                ),
                "vs_baseline": round(device_rate / BASELINE_TOKENIZE_MB_S, 3),
            }
        ),
        file=sys.stderr,
    )


def _wait_for_device(attempts: int = 4, delay_s: float = 120.0) -> None:
    """Retry backend initialization: the tunneled TPU occasionally drops
    for minutes at a time — don't let a transient flap zero the round's
    bench artifact. Each attempt probes in a SUBPROCESS (a failed init
    poisons the backend state in-process)."""
    import subprocess
    import sys as _sys

    for i in range(attempts):
        try:
            probe = subprocess.run(
                [_sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=300,
            )
            if probe.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"# device probe {i + 1}/{attempts} failed; retrying in "
              f"{delay_s:.0f}s", file=_sys.stderr, flush=True)
        time.sleep(delay_s)
    # fail FAST and loud rather than hanging on backend init: emit a
    # machine-readable line so the driver's artifact explains itself
    print(json.dumps({
        "metric": "train_merges_per_sec", "value": 0.0,
        "unit": "merges/s (TPU unavailable: axon tunnel down after retries)",
        "vs_baseline": 0.0, "error": "device_unavailable",
    }))
    _sys.exit(2)


def main() -> None:
    # --selftest-only: compiled-mode kernel regression check without the
    # full bench (~4 min cold vs ~8 min) — the cheap per-change TPU gate
    # for any kernel edit (CPU CI runs the same cases interpret-only).
    selftest_only = "--selftest-only" in sys.argv

    _wait_for_device()
    import jax

    # Persistent compile cache: amortizes the expensive TPU compiles of the
    # batched merge step across runs and capacity levels.
    from gpu_bpe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if selftest_only:
        run_selftest()
        print(json.dumps({"metric": "kernel_selftest_only", "value": "pass"}))
        return

    from gpu_bpe_tpu.ops import TPUTrainer, make_stream
    from gpu_bpe_tpu.pretok import PreTokenizer

    run_selftest()

    corpus = synth_corpus(CORPUS_MB << 20)
    pt = PreTokenizer()
    data, starts = pt.pre_tokenize_bytes(corpus)
    stream = make_stream(data, starts, dedup=True)
    print(
        f"# corpus {len(data)>>20} MB -> {stream.n} unique-word symbols "
        f"({stream.dedup_ratio:.1f}x dedup) on {jax.devices()[0]}",
        file=sys.stderr,
    )

    def fresh_stream():
        return type(stream)(
            stream.symbols.copy(), stream.weights.copy(), stream.n, stream.total_bytes
        )

    # Warm-up: run the FULL merge count once (excluded) — the mid-batch
    # collapse stop re-pads through several capacity rungs, and each rung
    # is a compiled shape; an 8-merge warm-up would leave those compiles
    # inside the timed run.
    warm = TPUTrainer()
    warm.train_stream(fresh_stream(), target_vocab_size=256 + TARGET_MERGES)

    # Best of 3 timed runs: the tunneled chip shows multi-second flaps
    # (a single run has been observed at 0.5s and 1.3s for identical
    # work); the minimum is the steady-state capability. The clock is
    # the trainer's own training_time_s, which starts AFTER the corpus
    # upload syncs — the same boundary the reference instruments
    # (trainer.js:230 starts its merges/s clock after uploadBuffer). On
    # this environment's ~25 MB/s host link the 8 MB state upload costs
    # ~320 ms and is NOT training; a PCIe host pays sub-ms for it.
    best_dt, merges = float("inf"), 0
    for i in range(3):
        trainer = TPUTrainer()
        t0 = time.perf_counter()
        result = trainer.train_stream(fresh_stream(), target_vocab_size=256 + TARGET_MERGES)
        wall = time.perf_counter() - t0
        dt = result.training_time_s
        print(
            f"# run {i}: {len(result.merges)} merges in {dt:.2f}s "
            f"(wall {wall:.2f}s incl. upload)",
            file=sys.stderr,
        )
        if dt < best_dt:
            best_dt, merges = dt, len(result.merges)
    dt = best_dt
    rate = merges / dt

    # dist-path smoke on the real 1-device mesh: one shard_map batch with
    # the fused Pallas kernel inside — composition must not silently rot
    # (full conformance runs on the virtual CPU mesh in tests/)
    try:
        from gpu_bpe_tpu.parallel import DistributedTrainer, make_mesh

        dres = DistributedTrainer(mesh=make_mesh(1)).train_stream(
            fresh_stream(), target_vocab_size=256 + 64
        )
        ok = list(dres.merges) == list(result.merges[:64])
        print(json.dumps({"metric": "dist_smoke", "merges": len(dres.merges),
                          "matches_single_chip": ok}), file=sys.stderr)
        if not ok:
            print("FATAL: dist path diverged from single-chip", file=sys.stderr)
            raise SystemExit(1)
    except SystemExit:
        raise
    except Exception as e:  # pragma: no cover - device-lowering guard
        print(f"FATAL: dist smoke failed ({type(e).__name__}: {e})", file=sys.stderr)
        raise SystemExit(1)

    bench_tokenize(fresh_stream(), data.tobytes() if hasattr(data, "tobytes") else bytes(data))

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
