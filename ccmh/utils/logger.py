"""Logging + metrics (reference parity: utils/logger.py:7-24).

Console + file logger with the same format as the reference, plus a
jsonl metrics writer (the reference creates a TensorBoard SummaryWriter but
never writes scalars to it — utils/logger.py:21-24; we emit machine-readable
jsonl instead and keep the log-line format for human parity).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional


def get_logger(filename: Optional[str] = None, name: str = "ccmh") -> logging.Logger:
    logger = logging.getLogger(name if filename is None else f"{name}:{filename}")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s - %(levelname)s: %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename is not None:
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """Append-only jsonl metrics stream: one record per event."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a", buffering=1)

    def write(self, event: str, step: int, **metrics: Any) -> None:
        rec: Dict[str, Any] = {"event": event, "step": step, "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "item") else v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()
