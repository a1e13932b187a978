"""Recall@K / median-rank metrics (reference parity: utils/utils.py:7-24
``compute_metrics`` — similarity-matrix R@1/5/10, MedianR, MeanR)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def compute_metrics(sim: jax.Array) -> Dict[str, float]:
    """sim: [N, N] similarity matrix with ground truth on the diagonal."""
    sim = jnp.asarray(sim)
    # rank of the diagonal element within its (descending-sorted) row
    diag = jnp.diagonal(sim)
    rank = jnp.sum(sim > diag[:, None], axis=1)           # 0-based rank
    rank_np = np.asarray(rank)
    n = rank_np.shape[0]
    return {
        "R1": float(np.sum(rank_np == 0)) * 100 / n,
        "R5": float(np.sum(rank_np < 5)) * 100 / n,
        "R10": float(np.sum(rank_np < 10)) * 100 / n,
        "MR": float(np.median(rank_np) + 1),
        "MedianR": float(np.median(rank_np) + 1),
        "MeanR": float(np.mean(rank_np) + 1),
        "cols": [int(i) for i in rank_np],
    }
