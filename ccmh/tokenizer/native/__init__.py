"""ctypes binding for the native C++ BPE tokenizer.

Builds ``bpe.cpp`` with g++ on first use (cached next to the source,
rebuilt when the source changes) and exposes :func:`encode_padded_batch`.
The native path only covers inputs where the reference cleaning pipeline
(ftfy + double html-unescape) is the identity up to lowercase/whitespace:
pure-ASCII text with no ``&`` (HTML entities) and no ``<|`` (literal
special tokens) — see :func:`eligible`.  Everything else, and any build
failure, falls back to the pure-Python tokenizer; the native path is a
throughput optimisation (GIL-free, threaded), not a dependency.
"""

from __future__ import annotations

import ctypes
import gzip
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bpe.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_HANDLES = {}  # vocab_path -> ctypes.c_void_p


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_bpe_{digest}.so")
    if not os.path.exists(so_path):
        tmp_path = f"{so_path}.tmp.{os.getpid()}"
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, "-o", tmp_path,
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
    lib.ccmh_bpe_create.restype = ctypes.c_void_p
    lib.ccmh_bpe_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.ccmh_bpe_destroy.restype = None
    lib.ccmh_bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.ccmh_bpe_encode_batch.restype = ctypes.c_int
    lib.ccmh_bpe_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
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


def _get_handle(vocab_path: str) -> Optional[ctypes.c_void_p]:
    lib = _get_lib()
    if lib is None:
        return None
    with _LOCK:
        handle = _HANDLES.get(vocab_path)
        if handle is None:
            from ccmh.tokenizer.bpe import VOCAB_SIZE

            with gzip.open(vocab_path, "rb") as fh:
                lines = fh.read().split(b"\n")
            n_merges = VOCAB_SIZE - 2 * 256 - 2
            merges = b"\n".join(lines[1 : 1 + n_merges])
            raw = lib.ccmh_bpe_create(merges, len(merges), n_merges)
            if not raw:
                return None
            handle = ctypes.c_void_p(raw)
            _HANDLES[vocab_path] = handle
        return handle


def available(vocab_path: Optional[str] = None) -> bool:
    if vocab_path is None:
        from ccmh.tokenizer.bpe import DEFAULT_VOCAB_PATH

        vocab_path = DEFAULT_VOCAB_PATH
    return _get_handle(vocab_path) is not None


def eligible(text: str) -> bool:
    """True when the native fast path is bit-exact for ``text``: ASCII only
    (Unicode lowercasing / ftfy / \\p{L} classes don't apply), no HTML
    entities (the reference double-unescapes), no literal special tokens."""
    return text.isascii() and "&" not in text and "<|" not in text


def encode_padded_batch(
    texts: Sequence[str],
    max_words: int,
    vocab_path: Optional[str] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Tokenize eligible ASCII texts -> int32 [B, max_words] padded ids.

    Callers must pre-filter with :func:`eligible`; the GIL is released for
    the whole batch and words fan out across C++ threads.
    """
    if vocab_path is None:
        from ccmh.tokenizer.bpe import DEFAULT_VOCAB_PATH

        vocab_path = DEFAULT_VOCAB_PATH
    lib = _get_lib()
    handle = _get_handle(vocab_path)
    if lib is None or handle is None:
        raise RuntimeError("native tokenizer unavailable")
    n = len(texts)
    out = np.zeros((n, max_words), np.int32)
    if n == 0:
        return out
    c_texts = (ctypes.c_char_p * n)(*[t.encode("ascii") for t in texts])
    if n_threads <= 0:
        n_threads = min(8, max(1, n // 64)) if n > 64 else 1
    lib.ccmh_bpe_encode_batch(
        handle, c_texts, n, max_words,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max(1, n_threads),
    )
    return out
