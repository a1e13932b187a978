"""Similarity primitives shared by the method losses.

jnp re-expressions of utils/utils.py:26-69 (calc_neighbor, cosine /
euclidean similarity) — each one line of XLA-fusable math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_neighbor(a: jax.Array, b: jax.Array) -> jax.Array:
    """Label-overlap indicator: (a @ b.T > 0) as float (utils/utils.py:26-28)."""
    return (
        jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32).T,
                preferred_element_type=jnp.float32) > 0
    ).astype(jnp.float32)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """Row-wise-normalized inner products (utils/utils.py:59-69)."""
    return jnp.dot(l2_normalize(a), l2_normalize(b).T, preferred_element_type=jnp.float32)


def cosine_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    return 1.0 - cosine_similarity(a, b)


def euclidean_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Pairwise euclidean distances via the inner-product expansion
    (utils/utils.py:43-57 euclidean_dist_matrix; torch.cdist equivalent)."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    sq = a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(sq, eps))
