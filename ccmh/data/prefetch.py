"""Compute/transfer overlap for the input pipeline.

The reference hides host work behind an 8-worker pinned-memory DataLoader
(train/base.py:87-92) and relies on ``non_blocking=True`` H2D copies.  The
TPU-native equivalent is explicit double buffering: JAX device puts are
asynchronous (the call returns once the transfer is *enqueued*), so putting
batch N+1 while the jitted step for batch N is still executing overlaps the
host->device copy with device compute.  Without this, every epoch pays
``put + step`` serialized per batch — the first-order input-pipeline bug on
any PCIe-attached host.

``device_prefetch`` is backend-agnostic: the caller supplies the put
function (plain ``device_put`` single-chip, ``shard_batch`` under a mesh),
so the same wrapper serves both paths and the CPU-mesh tests.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Dict, Iterable, Iterator


def device_prefetch(
    batches: Iterable[Dict[str, Any]],
    put: Callable[[Dict[str, Any]], Dict[str, Any]],
    depth: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Yield ``put(batch)`` for every batch, keeping up to ``depth`` batches
    resident on device ahead of the consumer.

    depth <= 1 degenerates to the serialized put-then-step order (useful as
    the control in correctness tests); depth=2 is the classic double buffer
    — batch N+1's transfer rides under step N's compute.  Larger depths only
    help when individual put latencies vary wildly; they cost device memory
    (one extra batch per level).
    """
    if depth <= 1:
        for batch in batches:
            yield put(batch)
        return

    buf: deque = deque()
    it = iter(batches)
    exhausted = False
    while True:
        while not exhausted and len(buf) < depth:
            try:
                item = next(it)
            except StopIteration:
                exhausted = True
            else:
                # put() runs OUTSIDE the except: a StopIteration leaking out
                # of a caller-supplied put must propagate as an error, not be
                # mistaken for iterator exhaustion (silently truncated epoch)
                buf.append(put(item))
        if not buf:
            return
        yield buf.popleft()
