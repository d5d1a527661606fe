"""Persistent XLA compilation cache setup.

TPU compiles of the batched merge step cost 60-160 s per capacity shape
and the stab tokenizer ~90 s per shape bucket (the reference's WebGPU
shaders compile in milliseconds — engine.js:114-136 — so it never needed
this). The power-of-two capacity ladder keeps the set of shapes small and
a persistent on-disk cache makes each one a one-time cost across
processes. Every entry point (CLI, api.train, bench) calls
``enable_compile_cache()``; set ``GPU_BPE_TPU_CACHE_DIR=`` (empty) to
disable, or point it at a different directory.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/jax_cache"
_done = False


def enable_compile_cache() -> None:
    """Idempotently enable JAX's persistent compilation cache."""
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get("GPU_BPE_TPU_CACHE_DIR", _DEFAULT_DIR)
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard requirement
        pass
