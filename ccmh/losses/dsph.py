"""DSPH HyP proxy loss (TCSVT'23).

Pure-jnp re-expression of train/DSPH/loss.py:22-72: cosine proxy terms
thresholded by the codetable value, plus the optional pairwise regulariser
among multi-label samples.  Data-dependent boolean indexing in the
reference (``label[index]``) becomes fixed-shape masked reductions.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.ops.similarity import l2_normalize

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")
CODETABLE_PATH = os.path.join(_ASSET_DIR, "codetable.xlsx")


def codetable_threshold(output_dim: int, numclass: int, path: str = CODETABLE_PATH) -> float:
    """codetable.xlsx[row=output_dim][col=ceil(log2 numclass)]
    (train/DSPH/loss.py:19-20)."""
    from ccmh.utils.xlsx import read_cell

    value = read_cell(path, output_dim, math.ceil(math.log(numclass, 2)))
    if value is None:
        raise ValueError(f"no codetable threshold for K={output_dim}, C={numclass}")
    return float(value)


def hyp_loss(
    x: jax.Array, y: jax.Array, label: jax.Array, proxies: jax.Array,
    threshold: float, alpha: float,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    p = l2_normalize(proxies)
    cos = l2_normalize(x) @ p.T                    # [B, C]
    cos_t = l2_normalize(y) @ p.T

    pos_mask = (label == 1).astype(jnp.float32)
    neg_mask = (label == 0).astype(jnp.float32)
    p_num = jnp.maximum(jnp.sum(pos_mask), 1.0)
    n_num = jnp.maximum(jnp.sum(neg_mask), 1.0)

    pos_term = jnp.sum((1.0 - cos) * pos_mask) / p_num
    neg_term = jnp.sum(jax.nn.relu(cos - threshold) * neg_mask) / n_num
    pos_term_t = jnp.sum((1.0 - cos_t) * pos_mask) / p_num
    neg_term_t = jnp.sum(jax.nn.relu(cos_t - threshold) * neg_mask) / n_num

    loss = pos_term + neg_term + pos_term_t + neg_term_t
    metrics = {"pos": pos_term + pos_term_t, "neg": neg_term + neg_term_t}

    if alpha > 0:
        # multi-label rows only (loss.py:43-45); reference gathers them,
        # we mask the full BxB similarity matrices instead.
        multi = (jnp.sum(label, axis=1) > 1).astype(jnp.float32)   # [B]
        pair_mask = multi[:, None] * multi[None, :]
        lab_sim = label @ label.T
        zero_mask = (lab_sim == 0).astype(jnp.float32) * pair_mask
        n_zero = jnp.sum(zero_mask)

        xn, tn = l2_normalize(x), l2_normalize(y)
        x_sim = xn @ xn.T
        t_sim = tn @ tn.T
        xt_sim = xn @ tn.T
        denom = jnp.maximum(n_zero, 1.0)
        reg = jnp.sum(alpha * jax.nn.relu(x_sim - threshold) * zero_mask) / denom
        reg_t = jnp.sum(alpha * jax.nn.relu(t_sim - threshold) * zero_mask) / denom
        reg_xt = jnp.sum(alpha * jax.nn.relu(xt_sim - threshold) * zero_mask) / denom
        has_zero = (n_zero > 0).astype(jnp.float32)
        loss = loss + has_zero * (reg + reg_t + reg_xt)
        metrics["reg"] = has_zero * (reg + reg_t + reg_xt)

    return loss, metrics


def init_proxies(rng: jax.Array, numclass: int, output_dim: int) -> jax.Array:
    """kaiming_normal_(randn(C, K), mode='fan_out') (loss.py:15-17):
    std = sqrt(2 / fan_out), fan_out = K for a [C, K] tensor."""
    std = math.sqrt(2.0 / output_dim)
    return std * jax.random.normal(rng, (numclass, output_dim))
