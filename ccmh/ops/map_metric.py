"""Fully on-device vectorized mAP over Hamming ranking.

The reference evaluates retrieval with a *CPU Python loop over queries*
(utils/calc_utils.py:16-39: per query — label matmul, Hamming row, sort,
cumulative precision).  That loop is the dominant eval cost and the single
biggest defect to fix on TPU (SURVEY §3.3).

Here the whole metric is one jitted program per query chunk:

  1. Hamming distances for the chunk: one int8 MXU matmul            [C, N]
  2. ground-truth relevance:          one label matmul > 0           [C, N]
  3. a single *stable* ``lax.sort`` of (distance, relevance) rows — the
     stable sort reproduces deterministic index-order tie-breaking (torch's
     unstable sort makes tie order arbitrary; any tie order is admissible
     under the metric definition, stable-by-index is reproducible)
  4. AP from the cumulative sum of sorted relevance:
       AP_q = (1/total) * sum_s rel[s] * (csum[s] <= total) * csum[s]/(s+1)
     with total = min(k, tsum); queries with tsum == 0 contribute 0 but
     still count in the denominator (parity: calc_utils.py:27-28, 38).

Matches ``calc_map_k_matrix`` exactly on tie-free data; within tie
permutation variance otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ccmh.ops.hamming import hamming_distance


@functools.partial(jax.jit, static_argnames=("k",))
def _map_chunk(
    q_codes: jax.Array,     # [C, K] ±1
    r_codes: jax.Array,     # [N, K] ±1
    q_labels: jax.Array,    # [C, L] multi-hot
    r_labels: jax.Array,    # [N, L]
    k: Optional[int],
) -> jax.Array:
    """Sum of per-query APs for one chunk (scalar float32)."""
    n = r_codes.shape[0]
    dist = hamming_distance(q_codes, r_codes)                     # [C, N] int32
    gnd = (
        jnp.dot(q_labels, r_labels.T, preferred_element_type=jnp.float32) > 0
    ).astype(jnp.int32)                                           # [C, N]

    tsum = jnp.sum(gnd, axis=1)                                   # [C]
    total = tsum if k is None else jnp.minimum(k, tsum)

    # Stable sort each row by distance, carrying relevance along.
    _, gnd_sorted = jax.lax.sort((dist, gnd), dimension=-1, num_keys=1)
    csum = jnp.cumsum(gnd_sorted, axis=1)                         # [C, N]
    positions = jnp.arange(1, n + 1, dtype=jnp.float32)
    contrib = gnd_sorted * (csum <= total[:, None])
    precision = csum.astype(jnp.float32) / positions
    ap_sum = jnp.sum(contrib * precision, axis=1)                 # [C]
    ap = jnp.where(total > 0, ap_sum / jnp.maximum(total, 1).astype(jnp.float32), 0.0)
    return jnp.sum(ap)


def calc_map(
    q_codes: jax.Array,
    r_codes: jax.Array,
    q_labels: jax.Array,
    r_labels: jax.Array,
    k: Optional[int] = None,
    chunk: int = 512,
) -> jax.Array:
    """mAP@k of Hamming ranking (k=None -> mAP@all).

    Drop-in on-device replacement for the reference ``calc_map_k_matrix``
    (utils/calc_utils.py:16-39).  Queries are processed in fixed-size
    chunks so the [chunk, N] distance matrix stays comfortably in HBM for
    million-item galleries; the final division is by the *total* query
    count, zero-relevance queries included (reference parity).
    """
    num_query = q_codes.shape[0]
    q_codes = jnp.asarray(q_codes)
    r_codes = jnp.asarray(r_codes)
    q_labels = jnp.asarray(q_labels, dtype=jnp.float32)
    r_labels = jnp.asarray(r_labels, dtype=jnp.float32)

    total = jnp.zeros((), jnp.float32)
    for start in range(0, num_query, chunk):
        size = min(chunk, num_query - start)
        qc = jax.lax.dynamic_slice_in_dim(q_codes, start, size, 0)
        ql = jax.lax.dynamic_slice_in_dim(q_labels, start, size, 0)
        total = total + _map_chunk(qc, r_codes, ql, r_labels, k)
    return total / num_query


def calc_map_4way(
    query_img: jax.Array, query_txt: jax.Array,
    retrieval_img: jax.Array, retrieval_txt: jax.Array,
    q_labels: jax.Array, r_labels: jax.Array,
    k: Optional[int] = None,
    chunk: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(i2t, t2i, i2i, t2t) mAP — the reference's validation quartet
    (train/base.py:259-262)."""
    i2t = calc_map(query_img, retrieval_txt, q_labels, r_labels, k, chunk)
    t2i = calc_map(query_txt, retrieval_img, q_labels, r_labels, k, chunk)
    i2i = calc_map(query_img, retrieval_img, q_labels, r_labels, k, chunk)
    t2t = calc_map(query_txt, retrieval_txt, q_labels, r_labels, k, chunk)
    return i2t, t2i, i2i, t2t
