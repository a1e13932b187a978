"""Persistent XLA compilation cache.

The reference pays nothing here (eager torch), but every jitted ccmh
program is traced and compiled by XLA on first use — 20-40 s for the
CLIP towers on a TPU backend.  JAX's persistent compilation cache stores
the compiled executable on disk keyed by a content hash of (HLO, flags,
backend), so restarted runs — and *different* processes serving the same
model (retrieval.Retriever) — reuse it instead of recompiling.

Enabled by ``--compilation-cache DIR`` (config field
``compilation_cache``); thresholds are zeroed so even small programs
(eval chunks, encode steps) are cached.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent)."""
    if not path:
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    # default thresholds skip sub-second/small programs; a training run is
    # dominated by a handful of executables, so cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
