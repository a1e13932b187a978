"""Poincaré-ball operations in jnp (DHaPH's hyperbolic geometry).

Re-expression of the geoopt-derived ops the method actually uses
(train/DHaPH/pmath.py:11-107, 270-300, 409-487): clamped tanh/artanh,
manifold projection, exponential map at the origin, batched Möbius
addition, pairwise geodesic distances, and the two custom-gradient
functions (Artanh and RiemannianGradient) as jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def tanh_clamp(x: jax.Array, clamp: float = 15.0) -> jax.Array:
    return jnp.tanh(jnp.clip(x, -clamp, clamp))


@jax.custom_vjp
def artanh(x: jax.Array) -> jax.Array:
    x = jnp.clip(x, -1 + 1e-5, 1 - 1e-5)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def _artanh_fwd(x):
    xc = jnp.clip(x, -1 + 1e-5, 1 - 1e-5)
    return 0.5 * (jnp.log1p(xc) - jnp.log1p(-xc)), xc


def _artanh_bwd(xc, g):
    # reference Artanh.backward (pmath.py:24-27): grad wrt the *clamped* input
    return (g / (1 - xc ** 2),)


artanh.defvjp(_artanh_fwd, _artanh_bwd)


def make_riemannian_gradient(c: float):
    """Identity forward; backward scales by the inverse conformal factor
    squared, (1 - c||x||²)² / 4 (pmath.py:30-45)."""

    @jax.custom_vjp
    def rgrad(x):
        return x

    def fwd(x):
        return x, x

    def bwd(x, g):
        scale = (1 - c * jnp.sum(x * x, -1, keepdims=True)) ** 2 / 4
        return (g * scale,)

    rgrad.defvjp(fwd, bwd)
    return rgrad


def project(x: jax.Array, c: float) -> jax.Array:
    """Clip points to stay strictly inside the ball (pmath.py:94-99)."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-5)
    maxnorm = (1 - 1e-3) / (c ** 0.5)
    return jnp.where(norm > maxnorm, x / norm * maxnorm, x)


def expmap0(u: jax.Array, c: float) -> jax.Array:
    """Exp map at the origin (pmath.py:296-300)."""
    sqrt_c = c ** 0.5
    u_norm = jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-5)
    return tanh_clamp(sqrt_c * u_norm) * u / (sqrt_c * u_norm)


def mobius_addition_batch(x: jax.Array, y: jax.Array, c: float) -> jax.Array:
    """All-pairs Möbius addition -> [B, C, D] (HPloss.py:14-25)."""
    xy = x @ y.T                                          # [B, C]
    x2 = jnp.sum(x * x, -1, keepdims=True)                # [B, 1]
    y2 = jnp.sum(y * y, -1, keepdims=True)                # [C, 1]
    num = 1 + 2 * c * xy + c * y2.T                       # [B, C]
    num = num[:, :, None] * x[:, None, :] + (1 - c * x2)[:, :, None] * y[None, :, :]
    denom = 1 + 2 * c * xy + (c ** 2) * x2 * y2.T
    return num / (denom[:, :, None] + 1e-5)


def _safe_norm(x: jax.Array) -> jax.Array:
    """L2 norm over the last axis with zero (not NaN) gradient at 0 — torch's
    norm backward special-cases the origin; jnp.linalg.norm does not."""
    sq = jnp.sum(x * x, axis=-1)
    is_zero = sq < 1e-24
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def dist_matrix(x: jax.Array, y: jax.Array, c: float) -> jax.Array:
    """Pairwise Poincaré geodesic distances (HPloss.py:46-57)."""
    sqrt_c = c ** 0.5
    add = mobius_addition_batch(-x, y, c)
    return (2.0 / sqrt_c) * artanh(sqrt_c * _safe_norm(add))
