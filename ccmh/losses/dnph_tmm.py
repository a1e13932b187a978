"""DNpH quadratic spherical mutual information loss (TMM'24).

Pure-jnp re-expression of train/DNpH_TMM/loss.py:5-72 (qmi_loss): cosine
kernel matrices shifted to [0, 1], square-clamp form summed over the
image-image, text-text and image-text pairs.  The reference hardcodes CUDA
(loss.py:41 ``torch.cuda.FloatTensor`` — recorded bug); the math is device
neutral here.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _cos_kernel(a: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + eps)
    b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + eps)
    return 0.5 * (a @ b.T + 1.0)


def qmi_loss(
    images: jax.Array, texts: jax.Array, targets: jax.Array,
    *, sigma: float = 3.0, m: float = 0.0, eps: float = 1e-8,
    use_cosine: bool = True, use_square_clamp: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    if use_cosine:
        Y = _cos_kernel(images, images, eps)
        T = _cos_kernel(texts, texts, eps)
        YT = 0.5 * (
            (images / (jnp.sqrt(jnp.sum(images ** 2, 1, keepdims=True)) + eps))
            @ (texts / (jnp.sqrt(jnp.sum(texts ** 2, 1, keepdims=True)) + eps)).T
            + 1.0
        )
    else:
        def rbf(a, b):
            aa = jnp.sum(a * a, 1)[:, None]
            bb = jnp.sum(b * b, 1)[None, :]
            d = jnp.maximum(aa + bb - 2 * a @ b.T, 0.0)
            return jnp.exp(-d / (2 * sigma ** 2))
        Y, T, YT = rbf(images, images), rbf(texts, texts), rbf(images, texts)

    D = (targets @ targets.T > 0).astype(jnp.float32)
    M = jnp.where(m == 0, D.shape[1] ** 2 / jnp.maximum(jnp.sum(D), 1.0), m)

    if use_square_clamp:
        loss = jnp.sum(
            (D * Y - 1) ** 2 + Y ** 2 / M
            + (D * T - 1) ** 2 + T ** 2 / M
            + (D * YT - 1) ** 2 + YT ** 2 / M
        )
    else:
        loss = -(jnp.sum(D * Y - Y / M) + jnp.sum(D * T - T / M) + jnp.sum(D * YT - YT / M))
    return loss, {"qmi": loss}
