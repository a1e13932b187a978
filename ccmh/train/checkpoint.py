"""Full-training-state checkpoints (orbax) with auto-resume.

The reference has no resume at all: it dumps *weights only* every epoch
(train/base.py:225-227) and the single recovery path is manually passing
``--pretrained`` to reload them (argsbase.py:17) — optimizer moments,
step counter and RNG state are lost, so a restarted run silently changes
trajectory.  Here the complete :class:`~ccmh.train.state.TrainState`
(params, loss-side extras, BOTH optax optimizer states, aux buffers, step,
PRNG key) plus the epoch counter are checkpointed with orbax, and
``Trainer.train`` resumes bit-exactly from the last completed epoch.

Weights-only ``.npz`` export stays available for ``--pretrained``
interchange (trainer.save_checkpoint), mirroring the reference's .pth
round-trip.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ccmh.train.state import TrainState

def _pack(state: TrainState, epoch: int) -> Any:
    # None members (methods without loss-side extras, e.g. DCHMT) are
    # omitted from the tree — orbax cannot serialise a None placeholder —
    # and reinstated from the field list on restore.
    tree = {k: v for k, v in state._asdict().items() if v is not None}
    return {"state": tree, "epoch": np.int64(epoch)}


def _unpack(tree: Any) -> Tuple[TrainState, int]:
    st = {k: tree["state"].get(k) for k in TrainState._fields}
    return TrainState(**st), int(tree["epoch"])


def save_state(ckpt_dir: str, state: TrainState, epoch: int) -> None:
    """Write a full-state checkpoint (atomic, replaces any previous one)."""
    path = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        tmp = jax.tree.map(np.asarray, _pack(state, epoch))
        ckptr.save(path, tmp, force=True)
        ckptr.wait_until_finished()


def load_state(ckpt_dir: str, template: TrainState) -> Tuple[TrainState, int]:
    """Restore a checkpoint written by :func:`save_state`.

    ``template`` is the freshly-initialised state of the same run: it gives
    orbax the tree structure/dtypes and keeps restore robust to optax's
    nested namedtuple states.
    """
    path = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(np.asarray, _pack(template, 0))
        restored = ckptr.restore(path, abstract)
    return _unpack(restored)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """The auto-resume checkpoint path for a run directory, if present."""
    path = os.path.join(save_dir, "state_ckpt")
    return path if os.path.isdir(path) else None
