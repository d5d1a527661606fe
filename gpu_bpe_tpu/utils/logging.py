"""Structured logging + the reference's progress schema.

The reference streams progress dicts {mergeIndex, totalMerges, mergeString,
bestCount, symbolCount, mergesPerSecond} through a callback
(trainer.js:306-315) and renders merges/s + ETA (ui-manager.js:64-78). We
keep the identical schema and provide a console renderer. In multi-host runs
only process 0 prints.
"""

from __future__ import annotations

import logging
import sys

from .timing import format_duration

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "gpu_bpe_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


def _is_primary_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # noqa: BLE001
        return True


def log_progress(progress: dict, logger: logging.Logger | None = None) -> None:
    """Render one progress event (merges/s + ETA after warm-up)."""
    if not _is_primary_process():
        return
    logger = logger or get_logger()
    done = progress["mergeIndex"]
    total = progress["totalMerges"]
    rate = progress["mergesPerSecond"]
    eta = ""
    if done >= 256 and rate > 0:  # ETA threshold matches ui-manager.js:68
        eta = f" ETA {format_duration((total - done) / rate)}"
    logger.info(
        "[%d/%d] '%s' count:%d symbols:%d (%.1f merges/s)%s",
        done,
        total,
        progress["mergeString"],
        progress["bestCount"],
        progress["symbolCount"],
        rate,
        eta,
    )
