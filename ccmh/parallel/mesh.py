"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY §2.6: ``trainer(args, 0)``,
rank is only a CUDA device id).  Parallelism here is therefore a new
TPU-native subsystem, not a port:

* 1-D ``("data",)`` mesh — batch axis sharded, parameters replicated.
  ViT-B/32 (~150M params) fits comfortably per chip, so data parallelism is
  the right (and only load-bearing) axis; gradients are combined by psum
  which XLA inserts from the sharding annotations.
* evaluation shards the *query* axis; packed gallery codes are tiny
  (1M x 64-bit = 8 MB) and stay replicated, so Hamming ranking needs no
  collectives at all and scales linearly in chips.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis,))


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host (DCN-connected) TPU slice.

    Call once per host before any other jax use; afterwards
    :func:`make_mesh` sees every chip in the slice and the same 1-D data
    mesh spans hosts — XLA routes the gradient psum over ICI within a pod
    slice and DCN across slices, with no further code changes (the batch
    must be fed per-process via :func:`shard_host_batch`).

    On single-host setups (including this repo's CI) it is a no-op
    returning 1.  Args default to the TPU metadata environment
    (JAX_COORDINATOR_ADDRESS etc.) when launched by a cluster manager.
    """
    import os

    if num_processes in (None, 1) and not coordinator and \
            not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def shard_host_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = "data") -> Dict[str, Any]:
    """Multi-host batch feed: each process holds ITS shard of the global
    batch; assemble per-key jax.Arrays spanning the mesh without any
    cross-host copy (jax.make_array_from_process_local_data)."""
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        spec = P(axis) if arr.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out


def global_device_put(x, sharding=None):
    """``device_put`` that also works on MULTI-CONTROLLER meshes.

    Single-process: plain ``jax.device_put``.  Multi-process (a mesh whose
    devices span jax processes): ``device_put`` cannot target
    non-addressable devices, so the global array is assembled from each
    process's addressable shards via ``jax.make_array_from_callback`` —
    the caller must hold the IDENTICAL full host array in every process
    (true for ccmh's loaders/labels/galleries: they are pure functions of
    the seed), and the callback hands each local shard its slice with no
    cross-host traffic.
    """
    if sharding is None or jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = "data") -> Dict[str, Any]:
    """Place a host batch with the leading dim sharded over the mesh
    (scalar entries, e.g. the epoch counter, replicate).  Works on
    multi-controller meshes: every process feeds the identical global
    batch and lands only its addressable rows (global_device_put)."""
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v) if jax.process_count() > 1 else jnp.asarray(v)
        out[k] = global_device_put(arr, data if arr.ndim >= 1 else repl)
    return out


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(lambda t: global_device_put(t, sharding), tree)


def data_parallel_train_step(step_fn, mesh: Mesh, axis: str = "data"):
    """Wrap a jitted train step with explicit in/out shardings.

    State (params, opt state, aux) is replicated; the batch is sharded on
    its leading axis (place inputs with ``replicate``/``shard_batch`` —
    GSPMD propagates those input shardings).  XLA turns the loss mean into
    a cross-chip psum of gradients — the NCCL-allreduce equivalent, but
    compiler-inserted and fused with the backward pass.
    """
    repl = NamedSharding(mesh, P())
    return jax.jit(step_fn, out_shardings=(repl, repl), donate_argnums=(0,))


def sharded_map_eval(mesh: Mesh, calc_map_fn, q_codes, r_codes, q_labels, r_labels,
                     k=None, axis: str = "data"):
    """mAP with queries sharded across chips and the gallery replicated.

    Each chip ranks its query shard against the full gallery; the AP sums
    combine with one scalar psum (inside calc_map's final mean).  Thin
    wrapper over ``calc_map(..., mesh=...)`` — the Trainer passes the mesh
    straight to calc_map_4way; this entry point remains for direct use.
    """
    return calc_map_fn(q_codes, r_codes, q_labels, r_labels, k,
                       mesh=mesh, mesh_axis=axis)
