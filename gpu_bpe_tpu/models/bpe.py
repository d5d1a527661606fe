"""BPETokenizer: a trained model with every encode/decode/export capability.

One object bundling what the reference spreads across TrainingManager /
TokenizerManager / TrieTokenizer / ExportController:

* ``encode(text)``            — merge-priority-order BPE (exact reference
                                semantics of the interactive Tokenizer tab)
* ``encode_bytes_greedy``     — bulk greedy longest-match (chunked) on TPU,
                                CPU fallback available
* ``decode(tokens)``          — byte concat with U+FFFD for unknown ids
* ``compile_trie()``          — v3 binary trie artifact (wire-compatible)
* ``export_bin(data)``        — tokenize + DXFT .bin container
* ``save/load``               — merge-list JSON (reference wire format)
"""

from __future__ import annotations

import numpy as np

from ..core.encoder_ref import GreedyTrieEncoder, decode_tokens, encode_merge_order
from ..core.model_io import BPEModel, write_dxft
from ..trie.compile import compile_vocab_to_trie


class BPETokenizer:
    def __init__(self, model: BPEModel, backend: str = "tpu", chunk_size: int | None = None):
        self.model = model
        self.backend = backend
        self.chunk_size = chunk_size
        self._greedy_cpu: GreedyTrieEncoder | None = None
        self._greedy_tpu = None

    # ── constructors ────────────────────────────────────────────────
    @classmethod
    def from_json(cls, text: str | bytes, **kw) -> "BPETokenizer":
        return cls(BPEModel.from_json(text), **kw)

    @classmethod
    def load(cls, path: str, **kw) -> "BPETokenizer":
        return cls(BPEModel.load(path), **kw)

    @classmethod
    def from_training_result(cls, result, **kw) -> "BPETokenizer":
        return cls(BPEModel(vocab=result.vocab, merges=result.merges), **kw)

    @property
    def vocab_size(self) -> int:
        return self.model.vocab_size

    # ── encoding ────────────────────────────────────────────────────
    def encode(self, text: str) -> list[int]:
        """Merge-priority-order BPE over raw text bytes (tokenizer-manager.js)."""
        return encode_merge_order(
            text.encode("utf-8"), self.model.merges, byte_ids=self.model.byte_ids
        )

    def encode_bytes_greedy(self, data: bytes) -> np.ndarray:
        """Bulk chunked greedy longest-match (the reference's GPU path)."""
        if self.backend == "tpu":
            if self._greedy_tpu is None:
                from ..ops.tokenize import TPUTokenizer

                self._greedy_tpu = TPUTokenizer(self.model.vocab, chunk_size=self.chunk_size)
            return self._greedy_tpu.encode_bytes(data)
        if self._greedy_cpu is None:
            self._greedy_cpu = GreedyTrieEncoder(self.model.vocab, chunk_size=self.chunk_size)
        return self._greedy_cpu.encode(data)

    def decode(self, tokens) -> bytes:
        return decode_tokens(tokens, self.model.vocab)

    def decode_text(self, tokens) -> str:
        return self.decode(tokens).decode("utf-8", errors="replace")

    def compression_ratio(self, data: bytes, tokens) -> float:
        """bytes/token (export-controller.js:252)."""
        n = len(tokens)
        return len(data) / n if n else 0.0

    # ── artifacts ───────────────────────────────────────────────────
    def compile_trie(self) -> bytes:
        return compile_vocab_to_trie(self.model.vocab)

    def export_bin(self, data: bytes) -> bytes:
        """Tokenize ``data`` and wrap in the DXFT .bin v2 container."""
        tokens = self.encode_bytes_greedy(data)
        return write_dxft(tokens, self.model)

    def export_vocab_text(self) -> str:
        return self.model.to_vocab().export_text()

    def export_hf_json(self, pretok: str = "none") -> str:
        """Hugging Face ``tokenizer.json`` (byte-level BPE; core/hf_io.py)."""
        from ..core.hf_io import model_to_hf_json

        return model_to_hf_json(self.model, pretok=pretok)

    def save(self, path: str) -> None:
        self.model.save(path)
