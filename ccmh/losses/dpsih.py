"""DPSIH losses (AAAI'26): multi-semantic-correlation triplets + auxiliary
multi-embed regularizers.

Re-expression of train/DPSIH/Loss.py:

* Multi_Semantic_Correlation_Loss (:81-137): negated (max-pooled for
  multi-embed) inner-product similarity, all-pairs triplet enumeration from
  label overlap, "all" mining (margin-violating triplets), mean violation.
  The reference enumerates triplets with torch.where (ragged); here the
  [B, B, B] violation tensor is reduced under a mask — identical math;
* distribution-consistency RBF loss (:53-57) and embedding-diversity gram
  penalty (:45-51) for num_embeds > 1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import DPSIHConfig
from ccmh.models.dpsih import l2norm


def _pooled_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    """Multi-embed [B, E, K] pairs -> [B, B] max inner product over E x E
    (Loss.py:100-104); 2-D inputs use the plain inner product."""
    if a.ndim == 2:
        return a @ b.T
    sim = jnp.einsum("aek,bfk->abef", a, b)
    return jnp.max(sim, axis=(2, 3))


def msc_loss(
    batch_inputs: jax.Array, batch_labels: jax.Array,
    inputs: jax.Array = None, margin: float = 0.25,
) -> jax.Array:
    other = batch_inputs if inputs is None else inputs
    sim_mat = -_pooled_sim(batch_inputs, other)            # [B, M]

    sames = (batch_labels @ batch_labels.T) > 0
    diffs = ~sames
    if sim_mat.shape[0] == sim_mat.shape[1]:
        sames = sames & ~jnp.eye(sames.shape[0], dtype=bool)

    # triplets (a, p, n): ap from sim[a, p], an from sim[a, n]
    valid = sames[:, :, None] & diffs[:, None, :]          # [B, M, M]
    viol = sim_mat[:, :, None] - sim_mat[:, None, :] + margin
    sel = valid & (viol >= 0)                              # mining "all"
    count = jnp.sum(sel)
    total = jnp.sum(jnp.where(sel, viol, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def rbf_mmd_loss(x: jax.Array, y: jax.Array, gamma: float) -> jax.Array:
    def rbf(a, b):
        diff = a[:, None, :] - b[None, :, :]
        sq = jnp.sum(diff * diff, axis=-1)
        # zero-safe sqrt: the (x, x) diagonal is exactly 0 and a plain norm
        # would produce NaN gradients there (torch zeroes this subgradient)
        is_zero = sq < 1e-24
        d = jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))
        return jnp.exp(-gamma * d)
    # SUM, not mean: the reference constructs DPSIHLoss(self.args, self.rank)
    # (hash_train.py:49) so the device rank lands in the ``reduction``
    # parameter (Loss.py:29), reduction is never 'mean', and both auxiliary
    # losses take their .sum() branch.  Reproduced because it changes the
    # effective loss weights ~1000x (trajectory golden pins it).
    return jnp.sum(rbf(x, x) - 2 * rbf(x, y) + rbf(y, y))


def embedding_diversity_loss(x: jax.Array, num_embeds: int) -> jax.Array:
    """Gram off-diagonal norm over the residuals [B, E, K] (Loss.py:45-51);
    batch-SUM reduction (the rank-as-reduction quirk, see rbf_mmd_loss)."""
    xn = l2norm(x)
    gram = jnp.einsum("bek,bfk->bef", xn, xn)
    gram = gram * (1.0 - jnp.eye(gram.shape[1]))
    return jnp.sum(jnp.linalg.norm(gram.reshape(gram.shape[0], -1), axis=1)) / (num_embeds ** 2)


def dpsih_loss(
    img: jax.Array, txt: jax.Array,
    img_r: jax.Array, txt_r: jax.Array,
    label: jax.Array, mcfg: DPSIHConfig,
    num_embeds: int = 4, alpha1: float = 0.01, alpha2: float = 0.01,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss.py:59-77 forward."""
    msc = (msc_loss(img, label, margin=mcfg.margin)
           + msc_loss(txt, label, margin=mcfg.margin)
           + msc_loss(img, label, inputs=txt, margin=mcfg.margin))
    loss = msc * mcfg.msc_weight
    metrics = {"msc": msc}
    if num_embeds > 1 and alpha1 > 0:
        dc = rbf_mmd_loss(img.reshape(-1, img.shape[-1]),
                          txt.reshape(-1, txt.shape[-1]), gamma=0.5)
        loss = loss + alpha1 * dc
        metrics["dc"] = dc
    if num_embeds > 1 and alpha2 > 0:
        ed = (embedding_diversity_loss(img_r, num_embeds)
              + embedding_diversity_loss(txt_r, num_embeds))
        loss = loss + alpha2 * ed
        metrics["ed"] = ed
    return loss, metrics
