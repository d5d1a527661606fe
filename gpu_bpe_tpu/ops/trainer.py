"""TPU BPE trainer: host orchestration around the device batch step.

Mirrors the reference's host loop (trainer.js:225-335): per batch of 128
merges → one device round trip → merge-log readback → CPU vocab
reconstruction → progress callback with the reference's schema. TPU-specific
additions: capacity shrinking (arrays re-padded to half capacity as the
symbol stream compacts — the analogue of the reference's indirect dispatch
sizing) and deduplicated weighted streams.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BATCH_MERGES, TOKEN_MASK
from ..core.trainer_ref import ProgressFn, TrainingResult
from ..core.vocab import Vocab
from .ingest import SymbolStream, make_stream, pad_stream
from .train_step import init_state, train_batch_summary_jit

logger = logging.getLogger(__name__)

_MIN_CAP = 2048

# Per-dispatch device-time target. A full sort recount costs roughly
# _RECOUNT_S_PER_ELEM * capacity on v5e (measured ~32 ns/elem at the 2^25
# rung from the 10 GB bisect logs; 35 ns keeps margin), and this
# environment's worker kills any dispatch over ~60 s
# (scripts/probe_dispatch_limit.py) — 12 s of budgeted recounts plus the
# stream-merge cost of a full batch stays a 2-3x margin under it. On
# standard hosts with no watchdog the cap is harmless: at small
# capacities the budget exceeds any real batch's recount count.
_DISPATCH_TARGET_S = 12.0
_RECOUNT_S_PER_ELEM = 35e-9


def _recount_budget(cap: int) -> int:
    import os

    target = float(os.environ.get("GPU_BPE_TPU_DISPATCH_TARGET_S", _DISPATCH_TARGET_S))
    return max(4, int(target / (_RECOUNT_S_PER_ELEM * max(cap, 1))))


class TPUTrainer:
    """Device-resident BPE trainer with batched merge loops."""

    def __init__(self, vocab: Vocab | None = None, batch_merges: int = BATCH_MERGES):
        self.vocab = vocab or Vocab()
        self.batch_merges = min(batch_merges, BATCH_MERGES)

    def train_stream(
        self,
        stream: SymbolStream,
        target_vocab_size: int = 4096,
        on_progress: ProgressFn | None = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 8,  # batches (= 1024 merges at default batch)
    ) -> TrainingResult:
        if stream.n == 0:
            raise ValueError("No symbols to train on — corpus is empty after pre-processing")
        # Count envelope: run totals use wrapping-u32 prefix sums, so the
        # GLOBAL stream mass is unbounded; what must fit is any single
        # pair's mass (< 2^31, the same practical envelope as the
        # reference's u32 atomic counters — a 10 GB natural corpus tops
        # out around ~60M for the heaviest pair). Pathological corpora
        # (e.g. gigabytes of one repeated byte) should be sharded
        # (gpu_bpe_tpu.parallel) to keep per-shard pair mass in range.
        if stream.total_bytes >= 2**31:
            logger.info(
                "corpus mass %d exceeds 2^31: exact while every single "
                "pair's mass stays < 2^31 (shard pathological corpora)",
                stream.total_bytes,
            )

        merges: list[tuple[int, int, int]] = []
        merge_counts: list[int] = []
        fingerprint = None

        # ── resume from checkpoint: deterministic replay of the merge list ──
        import os

        if checkpoint_path and os.path.exists(checkpoint_path):
            from .checkpoint import TrainingCheckpoint, fingerprint_stream, resume_stream

            ckpt = TrainingCheckpoint.load(checkpoint_path)
            fingerprint = fingerprint_stream(stream)
            if ckpt.corpus_fingerprint == fingerprint and self.vocab.size == 256:
                state, vocab = resume_stream(stream, ckpt, strict=False)
                self.vocab = vocab
                merges = list(ckpt.merges)
                merge_counts = list(ckpt.merge_counts)
                logger.info("resumed from %s at %d merges", checkpoint_path, len(merges))
            else:
                logger.warning("checkpoint %s does not match corpus/vocab; ignoring", checkpoint_path)
                state = None
        else:
            state = None

        if state is None:
            padded = pad_stream(stream)
            state = init_state(
                jnp.asarray(padded.symbols),
                jnp.asarray(padded.weights),
                stream.n,
                self.vocab.next_token_id,
            )
        merges_needed = max(target_vocab_size - self.vocab.size, 0)
        # Sync the uploaded state before starting the clock: device_put is
        # async, so without this the host->device corpus transfer is billed
        # to the first batch. The reference also starts its merges/s clock
        # after buffer upload (trainer.js:230); on a standard PCIe host the
        # transfer is sub-ms, but on a slow host link it would dominate.
        _ = np.asarray(state.symbols[0])
        start = time.perf_counter()
        total_done = 0
        early_stop = False
        batches_run = 0
        recounts_total = 0
        duals_total = 0

        def _write_checkpoint():
            from .checkpoint import TrainingCheckpoint, fingerprint_stream

            nonlocal fingerprint
            if fingerprint is None:
                fingerprint = fingerprint_stream(stream)
            TrainingCheckpoint(
                merges=merges,
                merge_counts=merge_counts,
                next_token_id=self.vocab.next_token_id,
                corpus_fingerprint=fingerprint,
                target_vocab_size=target_vocab_size,
            ).save(checkpoint_path)

        while total_done < merges_needed and not early_stop:
            batch = min(self.batch_merges, merges_needed - total_done)
            cap = state.symbols.shape[0]
            # one dispatch per batch: the packed log+scalars summary rides
            # the same jitted call (a separate summary dispatch costs one
            # more host->device command on a high-latency link), and ONE
            # host readback syncs it
            state, packed_dev = train_batch_summary_jit(
                state,
                jnp.asarray(batch, jnp.int32),
                jnp.asarray(_recount_budget(cap), jnp.int32),
            )
            packed = np.asarray(packed_dev)
            log = packed[: BATCH_MERGES * 3].reshape(BATCH_MERGES, 3)
            merges_done = int(packed[-4])
            n_now = int(np.int32(packed[-3]))
            early_stop = bool(packed[-2])
            recounts_total = int(packed[-1])
            duals_total = int(packed[-5])
            logger.debug(
                "batch: %d merges, %d recounts, %d duals total",
                merges_done, recounts_total, duals_total,
            )

            for i in range(merges_done):
                pair, new_id, count = int(log[i, 0]), int(log[i, 1]), int(log[i, 2])
                a, b = pair >> 16, pair & TOKEN_MASK
                got = self.vocab.add_merge(a, b)
                assert got == new_id, f"vocab id drift: {got} != {new_id}"
                merges.append((a, b, new_id))
                merge_counts.append(count)
            total_done += merges_done

            # ── capacity shrink: re-pad when the stream has compacted ──
            # Capacities live on a power-of-two ladder whose compiles are
            # served by the persistent cache across runs and corpora, so
            # shrinking is cheap; every sort/scan in the merge loop costs
            # O(capacity), so track n closely. The device loop returns
            # early when the stream collapses below half capacity
            # (train_step collapse stop), so shrink unconditionally —
            # skipping it would re-enter at the same capacity and stop
            # again immediately.
            new_cap = cap
            while new_cap > _MIN_CAP and n_now + 32 <= new_cap // 2:
                new_cap //= 2
            if new_cap != cap:
                # train_batch ends compacted (dirty=0, extent=n), so slicing
                # the zero tail is safe.
                state = state._replace(
                    symbols=state.symbols[:new_cap],
                    weights=state.weights[:new_cap],
                )

            elapsed = time.perf_counter() - start
            if on_progress and merges_done:
                on_progress(
                    {
                        "mergeIndex": total_done,
                        "totalMerges": merges_needed,
                        "mergeString": self.vocab.strings[-1],
                        "bestCount": merge_counts[-1],
                        "symbolCount": n_now,
                        "mergesPerSecond": total_done / max(elapsed, 1e-9),
                    }
                )
            if early_stop:
                logger.info("early stop after %d merges", total_done)

            batches_run += 1
            if checkpoint_path and batches_run % checkpoint_every == 0:
                _write_checkpoint()

        if checkpoint_path:
            _write_checkpoint()

        elapsed = time.perf_counter() - start
        return TrainingResult(
            vocab=list(self.vocab.entries),
            vocab_strings=list(self.vocab.strings),
            vocab_size=self.vocab.size,
            merges=merges,
            merge_counts=merge_counts,
            training_time_s=elapsed,
            recounts=recounts_total,
            duals=duals_total,
        )

    def train(
        self,
        data: bytes,
        word_starts: np.ndarray | None = None,
        target_vocab_size: int = 4096,
        dedup: bool = True,
        on_progress: ProgressFn | None = None,
    ) -> TrainingResult:
        """Train from pre-tokenized bytes + word-start mask."""
        stream = make_stream(data, word_starts, dedup=dedup)
        if dedup and word_starts is not None:
            logger.info(
                "dedup: %d -> %d symbols (%.1fx)", stream.total_bytes, stream.n, stream.dedup_ratio
            )
        return self.train_stream(stream, target_vocab_size, on_progress)
