"""ZeRO-style fully-sharded data parallelism (FSDP) for the CLIP towers.

A NEW capability with no reference counterpart (the reference is strictly
single-GPU, SURVEY §2.6).  Plain DP replicates every parameter and both
BertAdam moments on every chip: for the ViT-B/32 towers that is ~150M
params x (4 + 4 + 4) bytes ≈ 1.8 GB of per-chip state, and for the zoo's
ViT-L-class towers (~428M) ≈ 5.1 GB — before activations.  FSDP shards the
large tower weights AND their optimizer moments over the SAME mesh axis as
the batch ("data"), dividing that residency by the data-parallel degree.

Idiomatic GSPMD formulation — annotate shardings, let XLA schedule the
collectives (the scaling-book recipe), never hand-written NCCL-style code:

* weights live sharded; XLA inserts an all-gather right before each
  weight's use in the forward/backward and re-shards afterwards,
* the gradient psum of plain DP becomes a reduce-scatter into the sharded
  moment update — each chip updates only ITS weight shard (the ZeRO
  optimizer-state partitioning falls out of the sharding annotations),
* small leaves (LayerNorm scales, biases, positional embeddings — below
  :data:`MIN_SHARD_ELEMS`) stay replicated: gathering a few-KB vector per
  layer costs more in latency than it saves in HBM.

Composes with tensor parallelism: on a 2-D ``("data", "model")`` mesh the
Megatron specs (parallel/tp.py) take their per-head dim and FSDP fills a
remaining dim with ``data`` — per-chip tower residency divides by dp*tp.

Checkpoints stay canonical and fully assembled: ``Trainer._canonical_state``
gathers shards transparently (``np.asarray`` on a sharded jax.Array), so
FSDP/DP/TP/single-chip runs interchange checkpoints freely.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccmh.parallel.tp import _TP_BLOCK_SPECS, DATA_AXIS, MODEL_AXIS

# Leaves smaller than this stay replicated (per-layer all-gather latency
# beats the few KB of HBM).  2^16 elements = 256 KB fp32: every tower
# matmul weight (qkv/fc/proj, token embedding, patchify) shards; LN
# scales, biases and positional embeddings replicate.
MIN_SHARD_ELEMS = 1 << 16


def _spec_for_leaf(names, leaf, data_size: int, use_tp: bool):
    """PartitionSpec for one state leaf.

    ``names`` is the key path (dict keys / namedtuple fields); the same
    rules apply to params and to the BertAdam m/v moment trees because
    moments mirror the param structure (so their paths also contain
    ``clip``/``blocks``).
    """
    shape = getattr(leaf, "shape", None)
    if shape is None or len(shape) == 0:
        return P()
    base = [None] * len(shape)
    in_clip = "clip" in names
    in_blocks = "blocks" in names
    if use_tp and in_clip and in_blocks and len(names) >= 2:
        tp_spec = _TP_BLOCK_SPECS.get((names[-2], names[-1]))
        if tp_spec is not None and len(tp_spec) == len(shape):
            base = list(tp_spec)
    if (not in_clip or data_size <= 1
            or int(np.prod(shape)) < MIN_SHARD_ELEMS):
        return P(*base) if any(a is not None for a in base) else P()
    # stacked tower blocks carry a leading [n_layers] dim that the scan /
    # unrolled indexing slices — never shard it; for everything else any
    # dim is pure storage layout.  Prefer the largest free divisible dim.
    start = 1 if in_blocks else 0
    for d in sorted(range(start, len(shape)), key=lambda i: -shape[i]):
        if base[d] is None and shape[d] % data_size == 0:
            base[d] = DATA_AXIS
            break
    return P(*base)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState: large CLIP-tower leaves (and,
    via path matching, their m/v moments) sharded over ``data``; Megatron
    ``model`` specs preserved when the mesh has a >1 model axis; heads,
    aux, extra and small leaves replicated."""
    data_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)
    use_tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1) > 1

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        return NamedSharding(mesh,
                             _spec_for_leaf(names, leaf, data_size, use_tp))

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, state_shardings(state, mesh))


def fsdp_train_step(step_fn, mesh: Mesh, state: Any) -> Tuple[Any, Any]:
    """jit the raw ``(state, batch) -> (state, metrics)`` step with the FSDP
    (or FSDP+TP on a 2-D mesh) state shardings pinned on both sides and the
    live state placed accordingly.  The batch feeds through the existing
    ``mesh.shard_batch`` (leading axis over ``data``); GSPMD inserts the
    weight all-gathers and gradient reduce-scatters."""
    sh = state_shardings(state, mesh)
    repl = NamedSharding(mesh, P())
    step = jax.jit(step_fn, out_shardings=(sh, repl), donate_argnums=(0,))
    return step, jax.device_put(state, sh)
