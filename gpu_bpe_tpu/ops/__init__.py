"""TPU compute ops: device-resident training and tokenization."""

from .ingest import SymbolStream, make_stream, pad_stream
from .train_step import (
    TrainState,
    apply_merge_device,
    find_best_pair,
    init_state,
    train_batch,
)
from .trainer import TPUTrainer

__all__ = [
    "SymbolStream",
    "TPUTrainer",
    "TrainState",
    "apply_merge_device",
    "find_best_pair",
    "init_state",
    "make_stream",
    "pad_stream",
    "train_batch",
]
