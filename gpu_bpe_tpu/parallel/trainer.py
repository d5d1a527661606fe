"""Distributed trainer: host loop around the sharded batch step."""

from __future__ import annotations

import logging
import os
import time

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..constants import BATCH_MERGES, TOKEN_MASK
from ..core.trainer_ref import ProgressFn, TrainingResult
from ..core.vocab import Vocab
from ..ops.ingest import SymbolStream, make_stream
from .dist_train import init_dist_state, make_dist_train_batch, shard_stream
from .mesh import make_mesh

logger = logging.getLogger(__name__)


def _is_tunnel_platform() -> bool:
    """True on the axon-tunneled validation TPU (shard_map donation is
    broken there at execute time; see DistributedTrainer.train_stream)."""
    try:
        import jax

        return "axon" in (jax.config.jax_platforms or "")
    except Exception:
        return False


class DistributedTrainer:
    """Data-parallel BPE trainer over a 1-D device mesh.

    Same host protocol as the single-chip TPUTrainer: one readback per batch
    of 128 merges, CPU vocab reconstruction from the replicated merge log.
    The merge list is provably identical across shard counts (exact global
    argmax — see parallel/dist_train.py).
    """

    def __init__(self, mesh: Mesh | None = None, vocab: Vocab | None = None,
                 batch_merges: int = BATCH_MERGES):
        self.mesh = mesh or make_mesh()
        self.vocab = vocab or Vocab()
        self.batch_merges = min(batch_merges, BATCH_MERGES)
        self._batch = None

    def train(
        self,
        data: bytes,
        word_starts: np.ndarray | None = None,
        target_vocab_size: int = 4096,
        dedup: bool = True,
        on_progress: ProgressFn | None = None,
    ) -> TrainingResult:
        stream = make_stream(data, word_starts, dedup=dedup)
        return self.train_stream(stream, target_vocab_size, on_progress)

    def train_stream(
        self,
        stream: SymbolStream,
        target_vocab_size: int = 4096,
        on_progress: ProgressFn | None = None,
    ) -> TrainingResult:
        if stream.n == 0:
            raise ValueError("No symbols to train on — corpus is empty after pre-processing")
        axis = self.mesh.axis_names[0]
        n_dev = self.mesh.shape[axis]
        sym, w, n = shard_stream(stream.symbols[: stream.n], stream.weights[: stream.n], n_dev)
        state = init_dist_state(self.mesh, sym, w, n, self.vocab.next_token_id, axis)
        if self._batch is None:
            import jax

            # Donate the sharded state between batches (no transient copy
            # of the corpus arrays per batch) EXCEPT on the tunneled
            # validation TPU, where donating into a shard_map program
            # fails at execute time with a backend error (plain jit
            # donation works — the single-chip trainer keeps it). The
            # tunnel is identified by the "axon" platform in
            # jax.config.jax_platforms; physical pods donate.
            donate = (
                jax.default_backend() == "tpu"
                and not _is_tunnel_platform()
                and not os.environ.get("GPU_BPE_TPU_NO_DIST_DONATE")
            )
            self._batch = jax.jit(
                make_dist_train_batch(self.mesh, axis),
                donate_argnums=(0,) if donate else (),
            )

        merges: list[tuple[int, int, int]] = []
        merge_counts: list[int] = []
        merges_needed = max(target_vocab_size - self.vocab.size, 0)
        start = time.perf_counter()
        total_done = 0
        early_stop = False

        # one packed readback per batch (separate scalar reads each pay the
        # full host-link round trip — same fix as ops/trainer.py). The
        # global symbol count rides in the pack: st.n is SHARDED, so a host
        # np.asarray on it would fail under multi-process (non-addressable
        # shards) — summing under jit yields a replicated scalar instead.
        import jax

        rank0 = jax.process_index() == 0

        @jax.jit
        def _summary(st):
            scalars = jnp.stack(
                [st.recounts, st.duals,
                 st.merges_done, st.early_stop.astype(jnp.int32),
                 jnp.sum(st.n)]
            ).astype(jnp.uint32)
            return jnp.concatenate([st.merge_log.reshape(-1), scalars])

        recounts_total = 0
        duals_total = 0
        while total_done < merges_needed and not early_stop:
            batch = min(self.batch_merges, merges_needed - total_done)
            state = self._batch(state, np.int32(batch))
            packed = np.asarray(_summary(state))
            log = packed[: BATCH_MERGES * 3].reshape(BATCH_MERGES, 3)
            recounts_total = int(packed[-5])
            duals_total = int(packed[-4])
            merges_done = int(packed[-3])
            early_stop = bool(packed[-2])
            symbol_count = int(packed[-1])
            for i in range(merges_done):
                pair, new_id, count = int(log[i, 0]), int(log[i, 1]), int(log[i, 2])
                a, b = pair >> 16, pair & TOKEN_MASK
                got = self.vocab.add_merge(a, b)
                assert got == new_id
                merges.append((a, b, new_id))
                merge_counts.append(count)
            total_done += merges_done

            if on_progress and merges_done and rank0:
                elapsed = time.perf_counter() - start
                on_progress(
                    {
                        "mergeIndex": total_done,
                        "totalMerges": merges_needed,
                        "mergeString": self.vocab.strings[-1],
                        "bestCount": merge_counts[-1],
                        "symbolCount": symbol_count,
                        "mergesPerSecond": total_done / max(elapsed, 1e-9),
                    }
                )

        return TrainingResult(
            vocab=list(self.vocab.entries),
            vocab_strings=list(self.vocab.strings),
            vocab_size=self.vocab.size,
            merges=merges,
            merge_counts=merge_counts,
            training_time_s=time.perf_counter() - start,
            recounts=recounts_total,
            duals=duals_total,
        )
