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

CPU-backend entries are namespaced by a HOST ISA FINGERPRINT
(VERDICT r4 #3): XLA:CPU ahead-of-time executables embed the LLVM target
features of the machine that compiled them, and deserializing one on a
host with a different feature set emits ``cpu_aot_loader`` mismatch
errors and "could lead to execution errors such as SIGILL" — a cache
pre-warmed on host A must never be able to SIGILL a dryrun on host B.
TPU executables target the chip, not the host, so the TPU cache stays
shared at the top level of the cache directory.
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional


def cpu_feature_fingerprint(cpuinfo_text: Optional[str] = None) -> str:
    """Short stable hash of this host's CPU ISA feature set.

    Reads the first ``flags``/``Features`` line of /proc/cpuinfo (order-
    normalized — kernels may list identical features differently) plus the
    machine architecture.  Two hosts whose XLA:CPU target features could
    differ (the AOT-mismatch hazard) necessarily differ here; hosts with
    identical silicon share the namespace and therefore the warm cache.
    ``cpuinfo_text`` overrides the file read (tests / non-Linux fallback).
    """
    if cpuinfo_text is None:
        try:
            with open("/proc/cpuinfo") as fh:
                cpuinfo_text = fh.read()
        except OSError:
            cpuinfo_text = ""
    flags = ""
    for line in cpuinfo_text.splitlines():
        if line.startswith(("flags", "Features")) and ":" in line:
            flags = " ".join(sorted(set(line.split(":", 1)[1].split())))
            break
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def cache_dir_for_backend(path: str, backend: str,
                          cpuinfo_text: Optional[str] = None) -> str:
    """The directory the cache should actually live in for ``backend``:
    a ``cpu-<isa fingerprint>`` subdirectory for the CPU backend (AOT
    executables are host-feature-specific), ``path`` itself otherwise."""
    path = os.path.abspath(path)
    if backend == "cpu":
        return os.path.join(path, f"cpu-{cpu_feature_fingerprint(cpuinfo_text)}")
    return path


def enable_compilation_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Initializes the default backend if it is not already live — the
    namespace decision needs to know whether compiled executables will be
    host-feature-specific (CPU) or chip-targeted (TPU), and every caller
    initializes the backend immediately afterwards anyway.
    """
    if not path:
        return
    import jax

    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001 - no usable backend: cache moot anyway
        backend = ""
    path = cache_dir_for_backend(path, backend)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default thresholds skip sub-second/small programs; a training run is
    # dominated by a handful of executables, so cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
