"""Mid-training checkpoint / resume.

The reference only persists finished models (model JSON export,
training-manager.js:173-192); its IterState seeding (trainer.js:191) makes
continuation *conceptually* possible. This module makes it real:

* ``TrainingCheckpoint``  — the merge list so far + vocab cursor + a corpus
  fingerprint, serialized as JSON. Because training is deterministic, the
  merge list IS the full training state: the symbol stream is reconstructed
  by replaying the merges on device.
* ``replay_merges``       — batched device-side replay (merge + compaction
  passes only, no counting), hundreds of merges per dispatch.
* ``resume_stream``       — checkpoint + original stream → (state, vocab)
  ready to continue training.

Checkpoint files are a superset of the model JSON wire format: loading one
with ``BPEModel.from_json`` yields the partial model.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import TOKEN_MASK
from ..core.vocab import Vocab
from .ingest import SymbolStream, pad_stream
from .train_step import TrainState, apply_merge_device, init_state

REPLAY_BATCH = 512


@dataclass
class TrainingCheckpoint:
    merges: list[tuple[int, int, int]]
    merge_counts: list[int]
    next_token_id: int
    corpus_fingerprint: str
    target_vocab_size: int

    def to_json(self) -> str:
        vocab = Vocab()
        for a, b, _ in self.merges:
            vocab.add_merge(a, b)
        return json.dumps(
            {
                "version": 1,
                "kind": "gpu_bpe_tpu.checkpoint",
                "vocabSize": vocab.size,
                "vocab": [list(e) for e in vocab.entries],
                "merges": [list(m) for m in self.merges],
                "mergeCounts": self.merge_counts,
                "nextTokenId": self.next_token_id,
                "corpusFingerprint": self.corpus_fingerprint,
                "targetVocabSize": self.target_vocab_size,
            },
            separators=(",", ":"),
        )

    @classmethod
    def from_json(cls, text: str | bytes) -> "TrainingCheckpoint":
        obj = json.loads(text)
        return cls(
            merges=[tuple(m) for m in obj["merges"]],
            merge_counts=obj.get("mergeCounts", []),
            next_token_id=obj["nextTokenId"],
            corpus_fingerprint=obj["corpusFingerprint"],
            target_vocab_size=obj.get("targetVocabSize", 0),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "TrainingCheckpoint":
        with open(path) as f:
            return cls.from_json(f.read())


def fingerprint_stream(stream: SymbolStream) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(stream.symbols[: stream.n]).tobytes())
    h.update(np.ascontiguousarray(stream.weights[: stream.n]).tobytes())
    return h.hexdigest()[:32]


def _replay_batch(symbols, weights, n, merge_arr, count):
    """Apply ``count`` merges from merge_arr [(a<<16|b, new_id)] sequentially."""

    def body(i, carry):
        sym, w, n_ = carry

        def apply(args):
            sym, w, n_ = args
            pair = merge_arr[i, 0]
            new_id = merge_arr[i, 1]
            return apply_merge_device(sym, w, n_, pair, new_id)

        return lax.cond(i < count, apply, lambda a: a, (sym, w, n_))

    return lax.fori_loop(0, merge_arr.shape[0], body, (symbols, weights, n))


_replay_jit = jax.jit(_replay_batch, donate_argnums=(0, 1))


def replay_merges(stream: SymbolStream, merges, next_token_id_start: int = 256) -> TrainState:
    """Reconstruct the device training state by replaying a merge list."""
    padded = pad_stream(stream)
    sym = jnp.asarray(padded.symbols)
    w = jnp.asarray(padded.weights)
    n = jnp.asarray(stream.n, jnp.int32)

    merge_rows = np.array(
        [((a & TOKEN_MASK) << 16 | (b & TOKEN_MASK), new_id) for a, b, new_id in merges],
        dtype=np.uint32,
    ).reshape(-1, 2)
    for off in range(0, len(merge_rows), REPLAY_BATCH):
        chunk = merge_rows[off : off + REPLAY_BATCH]
        arr = np.zeros((REPLAY_BATCH, 2), np.uint32)
        arr[: len(chunk)] = chunk
        sym, w, n = _replay_jit(sym, w, n, jnp.asarray(arr), jnp.asarray(len(chunk), jnp.int32))

    next_id = merges[-1][2] + 1 if merges else next_token_id_start
    return init_state(sym, w, int(n), next_id)


def resume_stream(stream: SymbolStream, ckpt: TrainingCheckpoint, strict: bool = True):
    """Checkpoint + original corpus stream → (TrainState, Vocab) to continue.

    ``strict`` verifies the corpus fingerprint (deterministic replay is only
    meaningful against the same stream).
    """
    if strict:
        fp = fingerprint_stream(stream)
        if fp != ckpt.corpus_fingerprint:
            raise ValueError(
                f"corpus fingerprint mismatch: checkpoint {ckpt.corpus_fingerprint}, stream {fp}"
            )
    vocab = Vocab()
    for a, b, new_id in ckpt.merges:
        got = vocab.add_merge(a, b)
        assert got == new_id, "corrupt checkpoint: merge ids not contiguous"
    state = replay_merges(stream, ckpt.merges)
    return state, vocab
