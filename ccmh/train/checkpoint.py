"""Full-training-state checkpoints (orbax) with auto-resume.

The reference has no resume at all: it dumps *weights only* every epoch
(train/base.py:225-227) and the single recovery path is manually passing
``--pretrained`` to reload them (argsbase.py:17) — optimizer moments,
step counter and RNG state are lost, so a restarted run silently changes
trajectory.  Here the complete :class:`~ccmh.train.state.TrainState`
(params, loss-side extras, BOTH optax optimizer states, aux buffers, step,
PRNG key) plus the epoch counter and the best-mAP trackers are
checkpointed with orbax, and ``Trainer.train`` resumes bit-exactly from
the last completed epoch.

Crash-safety: checkpoints are written to *epoch-named slots*
(``<root>/e000042``) inside the checkpoint root.  A new slot is always a
fresh directory — orbax finalizes it with an atomic rename — and older
slots are pruned only *after* the new one is finalized, keeping the two
newest.  A crash at any point therefore leaves at least one complete
checkpoint on disk (a single-slot ``save(force=True)`` would rmtree the
only recovery point before writing its replacement).

Weights-only ``.npz`` export stays available for ``--pretrained``
interchange (trainer.save_checkpoint), mirroring the reference's .pth
round-trip.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ccmh.train.state import TrainState

_SLOT_RE = re.compile(r"^e(\d{6})$")
_KEEP_SLOTS = 2

# best-mAP trackers checkpointed alongside the state so a resumed run does
# not reset its best-epoch bookkeeping (and overwrite better .mat snapshots
# with worse ones).  step_in_epoch > 0 marks a PREEMPTION checkpoint taken
# mid-epoch: "epoch" is then the epoch in progress and resume fast-forwards
# the loader past the first step_in_epoch batches (Trainer.train).
_LEGACY_META = {
    "max_mapi2t": 0.0, "max_mapt2i": 0.0,
    "best_epoch_i": 0.0, "best_epoch_t": 0.0,
    "total_time": 0.0,
}
DEFAULT_META = {**_LEGACY_META, "step_in_epoch": 0.0}


def _save_checkpointer() -> ocp.Checkpointer:
    """A checkpointer for the SAVE side.

    Single-process: the stock StandardCheckpointer.  Multi-controller: the
    Trainer gates saves to process 0 (state is replicated; the data is
    host numpy by then), but orbax's default checkpointer still runs
    cross-process barriers — a process-0-only save would deadlock against
    peers that never call it (observed: the non-lead worker proceeded to
    the next epoch's collective and hit the 30 s gloo rendezvous timeout).
    Scope the checkpointer to ``active_processes={0}`` so its barriers
    involve only the process that actually saves.
    """
    if jax.process_count() == 1:
        return ocp.StandardCheckpointer()
    return ocp.AsyncCheckpointer(
        ocp.StandardCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0}))


def _pack(state: TrainState, epoch: int, meta: Optional[Dict[str, float]]) -> Any:
    # None members (methods without loss-side extras, e.g. DCHMT) are
    # omitted from the tree — orbax cannot serialise a None placeholder —
    # and reinstated from the field list on restore.
    tree = {k: v for k, v in state._asdict().items() if v is not None}
    out = {"state": tree, "epoch": np.int64(epoch)}
    if meta:
        out["meta"] = {k: np.float64(v) for k, v in meta.items()}
    return out


def _unpack(tree: Any) -> Tuple[TrainState, int, Dict[str, float]]:
    st = {k: tree["state"].get(k) for k in TrainState._fields}
    meta = {k: float(v) for k, v in (tree.get("meta") or {}).items()}
    return TrainState(**st), int(tree["epoch"]), meta


def _slots(root: str):
    """Finalized slot directories under ``root``, oldest first.

    Orbax finalizes a checkpoint by atomically renaming its tmp directory
    (``*.orbax-checkpoint-tmp-*``) to the final slot name, so any directory
    matching the slot pattern is a complete checkpoint; interrupted saves
    only ever leave tmp-named directories behind.
    """
    if not os.path.isdir(root):
        return []
    found = []
    for name in os.listdir(root):
        m = _SLOT_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            found.append((int(m.group(1)), os.path.join(root, name)))
    return [p for _, p in sorted(found)]


def save_state(
    ckpt_root: str,
    state: TrainState,
    epoch: int,
    meta: Optional[Dict[str, float]] = None,
) -> str:
    """Write a full-state checkpoint into a fresh epoch slot, then prune.

    Returns the slot path.  The previous checkpoint is deleted only after
    the new one is finalized (the two newest slots are kept), so a crash
    during the save window never destroys the last good recovery point.
    """
    root = os.path.abspath(ckpt_root)
    os.makedirs(root, exist_ok=True)
    slot = os.path.join(root, f"e{epoch:06d}")
    with _save_checkpointer() as ckptr:
        tmp = jax.tree.map(np.asarray, _pack(state, epoch, meta))
        # re-saving the same epoch (e.g. a restarted run) may overwrite
        ckptr.save(slot, tmp, force=os.path.isdir(slot))
        ckptr.wait_until_finished()
    for old in _slots(root)[:-_KEEP_SLOTS]:
        shutil.rmtree(old, ignore_errors=True)
    for name in os.listdir(root):  # stale tmp dirs from interrupted saves
        if ".orbax-checkpoint-tmp" in name:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return slot


class AsyncStateSaver:
    """Overlapped full-state checkpointing.

    orbax's ``StandardCheckpointer`` is an ``AsyncCheckpointer``: ``save``
    returns once the arrays are staged to host memory and the
    serialization + disk write run on a background thread.
    :func:`save_state` hides that by waiting and closing per call; this
    saver keeps ONE checkpointer alive across the run so the write of
    epoch N's checkpoint overlaps the training of epoch N+1 — for the
    150M-param towers (params + two optimizer moments ≈ 1.8 GB) the disk
    write is the dominant cost and no longer stalls the step loop.

    Crash-safety is preserved: pruning of old slots is DEFERRED until the
    next save (or :meth:`wait`), after the pending write is known
    finalized, so the two-newest-finalized invariant of :func:`save_state`
    holds at every instant.
    """

    def __init__(self):
        self._ckptr: Optional[ocp.StandardCheckpointer] = None
        self._pending_root: Optional[str] = None

    def save(
        self,
        ckpt_root: str,
        state: TrainState,
        epoch: int,
        meta: Optional[Dict[str, float]] = None,
    ) -> str:
        self.wait()  # finalize + prune the previous slot first
        if self._ckptr is None:
            self._ckptr = _save_checkpointer()
        root = os.path.abspath(ckpt_root)
        os.makedirs(root, exist_ok=True)
        slot = os.path.join(root, f"e{epoch:06d}")
        tmp = jax.tree.map(np.asarray, _pack(state, epoch, meta))
        self._ckptr.save(slot, tmp, force=os.path.isdir(slot))
        self._pending_root = root
        return slot

    def wait(self) -> None:
        """Block until the pending write (if any) is finalized, then prune."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
        if self._pending_root is not None:
            root, self._pending_root = self._pending_root, None
            for old in _slots(root)[:-_KEEP_SLOTS]:
                shutil.rmtree(old, ignore_errors=True)
            for name in os.listdir(root):
                if ".orbax-checkpoint-tmp" in name:
                    shutil.rmtree(os.path.join(root, name), ignore_errors=True)

    def close(self) -> None:
        self.wait()
        if self._ckptr is not None:
            self._ckptr.close()
            self._ckptr = None

    def __enter__(self) -> "AsyncStateSaver":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def load_state(
    ckpt_dir: str,
    template: TrainState,
    meta_template: Optional[Dict[str, float]] = None,
) -> Tuple[TrainState, int, Dict[str, float]]:
    """Restore a checkpoint written by :func:`save_state`.

    ``ckpt_dir`` may be a checkpoint root (newest slot is picked), a slot
    directory, or a legacy single-slot directory.  ``template`` is the
    freshly-initialised state of the same run: it gives orbax the tree
    structure/dtypes and keeps restore robust to optax's nested namedtuple
    states.  Returns ``(state, epoch, meta)``; ``meta`` is empty for
    checkpoints written without trackers.
    """
    path = os.path.abspath(ckpt_dir)
    inner = _slots(path)
    if inner:
        path = inner[-1]
    # orbax restore needs the abstract tree to match the saved structure;
    # tolerate checkpoints written with and without the meta trackers (and
    # pre-step_in_epoch layouts) by trying the caller's expectation first,
    # then the other shapes.
    candidates = ([meta_template, _LEGACY_META, None] if meta_template
                  else [None, DEFAULT_META, _LEGACY_META])
    with ocp.StandardCheckpointer() as ckptr:
        err = None
        for meta in candidates:
            abstract = jax.tree.map(np.asarray, _pack(template, 0, meta))
            try:
                restored = ckptr.restore(path, abstract)
                return _unpack(restored)
            except Exception as e:  # noqa: BLE001 — shape-mismatch retry
                err = e
        raise err


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """The auto-resume checkpoint path for a run directory, if present."""
    root = os.path.join(save_dir, "state_ckpt")
    if _slots(root):
        return root
    # legacy layout: state_ckpt itself is the orbax directory
    if os.path.isdir(root) and os.listdir(root):
        return root
    return None
