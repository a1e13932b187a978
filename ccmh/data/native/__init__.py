"""ctypes binding for the native C++ batch image loader.

Builds ``loader.cpp`` with g++ on first use (cached next to the source;
rebuilt when the source changes) and exposes :func:`decode_batch`.  If the
toolchain or libjpeg is unavailable, ``available()`` returns False and the
data pipeline silently stays on the PIL path — the loader is a throughput
optimisation, not a dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_loader_{digest}.so")
    if not os.path.exists(so_path):
        # per-process tmp name: concurrent builders (multi-process launch,
        # pytest-xdist) must not clobber each other's half-written library;
        # whoever finishes last wins the atomic os.replace, and both end up
        # CDLL-ing a complete file.
        tmp_path = f"{so_path}.tmp.{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, "-o", tmp_path, "-ljpeg",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp_path, so_path)
        except (OSError, subprocess.SubprocessError):
            return None
        finally:
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.ccmh_batch_load.restype = ctypes.c_int
    lib.ccmh_batch_load.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.ccmh_batch_load_u8.restype = ctypes.c_int
    lib.ccmh_batch_load_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.ccmh_batch_load_mem.restype = ctypes.c_int
    lib.ccmh_batch_load_mem.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build()
                _TRIED = True
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def decode_batch(
    paths: Sequence[str],
    resolution: int,
    is_train: bool,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode ``paths`` into [N, R, R, 3] float32 (CLIP-normalized NHWC).

    Returns ``(images, ok)`` where ``ok[i]`` is False for items the native
    loader could not handle (non-JPEG, unreadable) — the caller decodes
    those via the PIL fallback.  The call releases the GIL for its entire
    duration (ctypes does this automatically), so prefetch threads keep
    tokenizing while the loader runs.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.float32)
    ok = np.zeros(n, np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 8)
    lib.ccmh_batch_load(
        c_paths, n, resolution, int(is_train),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out, ok.astype(bool)


def decode_batch_mem(
    blobs: Sequence[bytes],
    resolution: int,
    is_train: bool = False,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode in-memory JPEG byte strings into [N, R, R, 3] float32
    (CLIP-normalized NHWC) — the serving-path twin of :func:`decode_batch`
    (clients POST raw image bytes; no filesystem round trip).  Returns
    ``(images, ok)``; callers fall back to PIL for ``~ok`` items."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(blobs)
    out = np.empty((n, resolution, resolution, 3), np.float32)
    ok = np.zeros(n, np.uint8)
    # c_char_p would truncate at the first NUL byte (JPEG data is binary);
    # hold explicit byte buffers and pass their addresses as void*.
    bufs = [(ctypes.c_ubyte * len(b)).from_buffer_copy(b) if len(b) else None
            for b in blobs]
    c_ptrs = (ctypes.c_void_p * n)(
        *[ctypes.addressof(b) if b is not None else None for b in bufs])
    c_lens = (ctypes.c_int64 * n)(*[len(b) for b in blobs])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 8)
    lib.ccmh_batch_load_mem(
        c_ptrs, c_lens, n, resolution, int(is_train),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max(1, n_threads),
    )
    return out, ok.astype(bool)


def decode_batch_u8(
    paths: Sequence[str],
    resolution: int,
    is_train: bool,
    n_threads: int = 0,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode ``paths`` into [N, R, R, 3] uint8 (post-resize, pre-normalize
    — bit-identical to what PIL yields before ToTensor).  Feeds the
    decoded-tensor cache (data/cache.py); ``out`` may be a caller-provided
    C-contiguous uint8 view (e.g. a memmap slice) to decode in place."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, resolution, resolution, 3), np.uint8)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    ok = np.zeros(n, np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 8)
    lib.ccmh_batch_load_u8(
        c_paths, n, resolution, int(is_train),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out, ok.astype(bool)
