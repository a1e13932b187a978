"""Hamming distance kernels.

Replaces the reference's float matmul ``0.5 * (K - B1 @ B2.T)``
(utils/calc_utils.py:8-14, executed on CPU) with two on-device paths:

* ``hamming_distance``        — ±1 int8 codes, one MXU int8 matmul.  For
  code lengths 16..64 this is the speed-of-light formulation on TPU: the
  systolic array does (query x gallery x K) MACs at int8 throughput.
* ``hamming_distance_packed`` — packed uint32 codes, XOR + popcount Pallas
  kernel.  8x smaller gallery residency in HBM; preferable when the gallery
  is huge or codes are stored packed (e.g. sharded 1M-item galleries).

Both return int32 distances (the true Hamming distance, no 0.5 scaling —
monotonicity is what ranking needs; calc_map uses them directly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccmh.ops.packing import popcount32


def hamming_distance(q: jax.Array, r: jax.Array) -> jax.Array:
    """±1 codes -> Hamming distances.

    q: [Q, K] ±1 (int8/float), r: [N, K] ±1.  d = (K - q·r) / 2.
    """
    k = q.shape[-1]
    dot = jax.lax.dot_general(
        q.astype(jnp.int8), r.astype(jnp.int8),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (k - dot) >> 1


def _popcount_kernel(q_ref, r_ref, out_ref):
    """out[i, j] = sum_w popcount(q[i, w] ^ r[j, w]) for one (Qt, Nt) tile."""
    q = q_ref[:]                                   # [Qt, W] uint32
    r = r_ref[:]                                   # [Nt, W] uint32
    w = q.shape[1]
    acc = jnp.zeros((q.shape[0], r.shape[0]), jnp.int32)
    for lane in range(w):                          # W is tiny (K/32 <= 8)
        x = jnp.bitwise_xor(q[:, lane][:, None], r[:, lane][None, :])
        acc = acc + popcount32(x)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_q", "block_n"))
def hamming_distance_packed(
    q: jax.Array, r: jax.Array, *, block_q: int = 256, block_n: int = 1024
) -> jax.Array:
    """Packed uint32 codes -> Hamming distances via XOR+popcount.

    q: [Q, W] uint32, r: [N, W] uint32 (W = ceil(K/32)).  Q and N must be
    multiples of the block sizes (pad with zero rows and slice the result —
    zero rows cost nothing and keep shapes static).
    """
    Q, W = q.shape
    N, _ = r.shape
    block_q = min(block_q, Q)
    block_n = min(block_n, N)
    grid = (Q // block_q, N // block_n)
    return pl.pallas_call(
        _popcount_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, W), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.int32),
    )(q, r)


def hamming_distance_packed_xla(q: jax.Array, r: jax.Array) -> jax.Array:
    """Pure-XLA packed fallback (CPU tests; interpret-free)."""
    x = jnp.bitwise_xor(q[:, None, :], r[None, :, :])
    return jnp.sum(popcount32(x), axis=-1)
