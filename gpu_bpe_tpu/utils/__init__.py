"""Utilities: structured logging, progress reporting, phase timing."""

from .logging import get_logger, log_progress
from .timing import PhaseTimer, format_duration, format_size

__all__ = ["PhaseTimer", "format_duration", "format_size", "get_logger", "log_progress"]
