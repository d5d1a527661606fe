"""gpu_bpe_tpu — TPU-native BPE training & tokenization framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of the
`gpu-bpe` WebGPU application (reference mounted read-only at
/root/reference): corpus ingestion, Unicode pre-tokenization, device-resident
BPE training with batched device-side merge loops, trie compilation, bulk
greedy tokenization, and wire-compatible model/trie/.bin artifacts — built
for SPMD scaling over TPU meshes instead of a single GPU queue.

Layers (bottom-up):
  unicode/   Unicode property tables, NFC, batch classify (C++ + Python)
  pretok/    GPT-4-style word-boundary rules (string + byte paths)
  core/      CPU reference oracle: exact trainer/encoders, model IO
  trie/      trie compile/parse, v3 binary artifacts
  ops/       TPU compute: pair counting, merge, compaction, tokenization
  parallel/  mesh/sharding, multi-chip training with exact global argmax
  models/    trained-model wrappers (BPETokenizer)
  utils/     logging, progress, timing
  api.py     train / encode / decode / export entry points
  cli.py     command-line interface
"""

__version__ = "0.1.0"

from .constants import (
    BATCH_MERGES,
    INVALID_TOKEN,
    MAX_VOCAB,
    TOKEN_MASK,
    WORD_START_BIT,
)
from .core import BPEModel, ReferenceTrainer, Vocab

__all__ = [
    "BATCH_MERGES",
    "BPEModel",
    "BPETokenizer",
    "INVALID_TOKEN",
    "MAX_VOCAB",
    "ReferenceTrainer",
    "TOKEN_MASK",
    "TrainConfig",
    "Vocab",
    "WORD_START_BIT",
    "__version__",
    "build_corpus",
    "collect_files",
    "decode",
    "encode",
    "encode_bulk",
    "export_bin",
    "export_trie",
    "load_model",
    "train",
    "train_files",
]

_API_NAMES = {
    "BPETokenizer", "TrainConfig", "build_corpus", "collect_files", "decode",
    "encode", "encode_bulk", "export_bin", "export_trie", "load_model",
    "train", "train_files",
}


def __getattr__(name: str):
    # High-level entry points resolve lazily (PEP 562) so that importing the
    # package stays light — api pulls in the pre-tokenizer/unicode stack.
    if name in _API_NAMES:
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
