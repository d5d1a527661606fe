"""High-level API: train / encode / decode / export.

The programmatic equivalent of the reference's UI flows (train tab →
TrainingManager, tokenizer tab → TokenizerManager, pre-tokenize tab →
ExportController), with backend selection:

* ``backend="tpu"``   single-chip device-resident training (ops/)
* ``backend="dist"``  data-parallel over all devices (parallel/)
* ``backend="cpu"``   the exact-semantics oracle (core/)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .core.model_io import BPEModel
from .core.trainer_ref import ProgressFn, ReferenceTrainer, TrainingResult, bytes_to_symbols, tag_word_boundaries
from .models.bpe import BPETokenizer
from .pretok import PreTokenizer
from .utils.logging import get_logger, log_progress

logger = get_logger()


@dataclass
class TrainConfig:
    """Training configuration (the reference's UI knobs + TPU additions)."""

    vocab_size: int = 4096  # chips 512..65536 in the reference UI
    backend: str = "tpu"  # tpu | dist | cpu
    pre_tokenize: bool = True  # Unicode word boundaries (vs byte-heuristic)
    dedup: bool = True  # unique-word multiset (exact, faster)
    shuffle: bool = False  # paragraph shuffle at ingest (file-manager.js:108)
    batch_merges: int = 1024  # merges per host round trip (BATCH_MERGES cap)
    seed: int = 0
    show_progress: bool = True
    profile_dir: str | None = None  # capture a jax.profiler trace of training
    extra: dict = field(default_factory=dict)


# Extensions recognized as text for folder-recursive selection
# (FileInputController parity; reference list at src/utils.js:8-18)
TEXT_EXTENSIONS = frozenset(
    "txt md markdown rst json jsonl csv tsv xml yaml yml toml html htm css "
    "py js mjs ts tsx jsx swift rs go c h cpp hpp cc java kt kts scala rb "
    "php pl lua sh bash zsh fish sql r jl zig wgsl glsl hlsl tex bib srt "
    "vtt log".split()
)


def collect_files(paths: list[str]) -> list[str]:
    """Expand files and directories into a sorted list of text-file paths.

    Directories are traversed recursively with the reference's text
    extension filter (file-input-controller.js:163-241 + utils.js:8-18);
    explicitly named files are always included.
    """
    import os

    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, names in os.walk(p):
                dirs.sort()  # machine-independent traversal order
                for name in sorted(names):
                    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
                    if ext in TEXT_EXTENSIONS:
                        out.append(os.path.join(root, name))
        else:
            out.append(p)
    return out


def build_corpus(files: list[bytes], shuffle: bool = False, seed: int = 0) -> bytes:
    """Concatenate file contents with \\n\\n separators; optional paragraph
    shuffle (file-manager.js:90-126)."""
    corpus = b"\n\n".join(bytes(f) for f in files)
    if shuffle:
        paragraphs = [p for p in corpus.split(b"\n\n") if p]
        rng = np.random.default_rng(seed)
        rng.shuffle(paragraphs)
        corpus = b"\n\n".join(paragraphs)
    return corpus


def train(
    corpus: bytes | str | list[bytes],
    config: TrainConfig | None = None,
    on_progress: ProgressFn | None = None,
) -> tuple[BPETokenizer, TrainingResult]:
    """Train a BPE tokenizer. Returns (tokenizer, full training result)."""
    config = config or TrainConfig()
    if isinstance(corpus, list):
        corpus = build_corpus(corpus, config.shuffle, config.seed)
    if isinstance(corpus, str):
        corpus = corpus.encode("utf-8")

    if config.pre_tokenize:
        data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
    else:
        data, starts = corpus, None

    if on_progress is None and config.show_progress:
        on_progress = log_progress

    with _profile_ctx(config):
        result = _train_backend(config, data, starts, on_progress)

    tokenizer = BPETokenizer.from_training_result(result, backend="tpu" if config.backend != "cpu" else "cpu")
    return tokenizer, result


def _profile_ctx(config: TrainConfig):
    """jax.profiler trace capture around training (ROADMAP: profiling
    hooks). View with TensorBoard or xprof on the written directory."""
    import contextlib

    if not config.profile_dir:
        return contextlib.nullcontext()
    import jax

    logger.info("capturing jax.profiler trace to %s", config.profile_dir)
    return jax.profiler.trace(config.profile_dir)


def _train_backend(config: TrainConfig, data, starts, on_progress) -> TrainingResult:
    if config.backend != "cpu":
        from .utils import enable_compile_cache

        enable_compile_cache()  # device compiles are 60-160 s/shape; cache them
    if config.backend == "cpu":
        symbols = bytes_to_symbols(data)
        if starts is not None:
            symbols = tag_word_boundaries(symbols, starts)
        else:
            from .pretok import tag_word_boundaries_bytes

            symbols = tag_word_boundaries_bytes(symbols)
        result = ReferenceTrainer().train(symbols, config.vocab_size, on_progress)
    elif config.backend == "dist":
        from .parallel import DistributedTrainer

        result = DistributedTrainer(batch_merges=config.batch_merges).train(
            data, starts, config.vocab_size, config.dedup, on_progress
        )
    else:
        from .ops import TPUTrainer

        if starts is None:
            from .pretok import tag_word_boundaries_bytes

            symbols = tag_word_boundaries_bytes(bytes_to_symbols(data))
            from .ops.ingest import SymbolStream

            stream = SymbolStream(
                symbols=symbols,
                weights=np.ones(len(symbols), np.int32),
                n=len(symbols),
                total_bytes=len(symbols),
            )
            result = TPUTrainer(batch_merges=config.batch_merges).train_stream(
                stream, config.vocab_size, on_progress
            )
        else:
            result = TPUTrainer(batch_merges=config.batch_merges).train(
                data, starts, config.vocab_size, config.dedup, on_progress
            )
    return result


def train_files(
    paths: list[str],
    config: TrainConfig | None = None,
    on_progress: ProgressFn | None = None,
    chunk_bytes: int = 64 << 20,
) -> tuple[BPETokenizer, TrainingResult]:
    """Streamed training from files: host memory stays bounded by the
    unique-word mass plus one chunk, so 10 GB+ corpora ingest without
    materializing the corpus (tpu/dist backends, pre-tokenized + dedup).

    Not supported in streamed mode: paragraph shuffle (needs the whole
    corpus) and byte-level/no-dedup streams (use ``train``)."""
    config = config or TrainConfig()
    if config.shuffle or not config.pre_tokenize or not config.dedup or config.backend == "cpu":
        files = [open(p, "rb").read() for p in collect_files(paths)]
        return train(files, config, on_progress)

    from .ops.ingest import make_stream_chunked, stream_paths

    stream = make_stream_chunked(stream_paths(collect_files(paths), chunk_bytes))
    logger.info(
        "streamed ingest: %d unique-word symbols from %d corpus bytes (%.1fx dedup)",
        stream.n, stream.total_bytes, stream.dedup_ratio,
    )
    if on_progress is None and config.show_progress:
        on_progress = log_progress
    with _profile_ctx(config):
        if config.backend == "dist":
            from .parallel import DistributedTrainer

            result = DistributedTrainer(batch_merges=config.batch_merges).train_stream(
                stream, config.vocab_size, on_progress
            )
        else:
            from .ops import TPUTrainer

            result = TPUTrainer(batch_merges=config.batch_merges).train_stream(
                stream, config.vocab_size, on_progress
            )
    tokenizer = BPETokenizer.from_training_result(result, backend="tpu")
    return tokenizer, result


def load_model(path: str, backend: str = "tpu") -> BPETokenizer:
    return BPETokenizer.load(path, backend=backend)


def encode(tokenizer: BPETokenizer, text: str) -> list[int]:
    """Interactive encode — exact merge-order BPE semantics."""
    return tokenizer.encode(text)


def encode_bulk(tokenizer: BPETokenizer, data: bytes) -> np.ndarray:
    """Bulk greedy tokenization (chunked longest-match)."""
    return tokenizer.encode_bytes_greedy(data)


def decode(tokenizer: BPETokenizer, tokens) -> str:
    return tokenizer.decode_text(tokens)


def export_bin(tokenizer: BPETokenizer, data: bytes, path: str | None = None) -> bytes:
    blob = tokenizer.export_bin(data)
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_trie(tokenizer: BPETokenizer, path: str | None = None) -> bytes:
    blob = tokenizer.compile_trie()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob
