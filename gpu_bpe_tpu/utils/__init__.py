"""Utilities: structured logging, progress reporting, phase timing."""

from .compile_cache import enable_compile_cache
from .logging import get_logger, log_progress
from .timing import PhaseTimer, format_duration, format_size

__all__ = [
    "PhaseTimer",
    "enable_compile_cache",
    "format_duration",
    "format_size",
    "get_logger",
    "log_progress",
]
