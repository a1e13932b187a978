"""DCHMT loss (MM'22) — differentiable cross-modal hashing.

Pure-jnp re-expression of the trainer-embedded loss
(train/DCHMT/hash_train.py:82-150 similarity_loss/our_loss): intra (i<->t)
plus inter (i<->i, t<->t) similarity terms over cosine or euclidean
distance with threshold clipping, l1/l2 reduction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import DCHMTConfig
from ccmh.ops.similarity import calc_neighbor, cosine_similarity, euclidean_similarity


def similarity_loss(
    a: jax.Array, b: jax.Array, label_sim: jax.Array,
    mcfg: DCHMTConfig, output_dim: int,
) -> Tuple[jax.Array, jax.Array]:
    """-> (positive_loss, negative_loss) for one modality pair."""
    threshold = mcfg.sim_threshold if mcfg.sim_threshold != 0 else 0.05
    if mcfg.similarity_function == "cosine":
        sim = 1.0 - cosine_similarity(a, b)
    else:
        sim = euclidean_similarity(a, b)

    pos = sim * label_sim
    neg = sim * (1.0 - label_sim)

    if mcfg.similarity_function == "cosine":
        pos = jnp.maximum(pos, threshold) - threshold
        neg = jnp.minimum(neg, 1.0)
        neg = 1.0 * (1.0 - label_sim) - neg
    else:
        # Tolerated distance: half the (doubled, for select pairs) code
        # length times the error rate (hash_train.py:104-107).
        max_value = float(output_dim * 2 * mcfg.vartheta) ** 0.5
        neg = jnp.minimum(neg, max_value)
        neg = max_value * (1.0 - label_sim) - neg

    if mcfg.loss_type == "l1":
        return jnp.mean(pos), jnp.mean(neg)
    return jnp.mean(pos ** 2), jnp.mean(neg ** 2)


def dchmt_loss(
    hash_img: jax.Array, hash_txt: jax.Array, label: jax.Array,
    mcfg: DCHMTConfig, output_dim: int,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """our_loss (hash_train.py:117-150): intra + inter similarity terms.

    ``hash_img``/``hash_txt``: [B, 2K] flattened select pairs, or [B, K]
    tanh codes in "linear" mode.
    """
    label_sim = calc_neighbor(label, label)
    ip, inn = similarity_loss(hash_img, hash_txt, label_sim, mcfg, output_dim)
    iip, iin = similarity_loss(hash_img, hash_img, label_sim, mcfg, output_dim)
    ttp, ttn = similarity_loss(hash_txt, hash_txt, label_sim, mcfg, output_dim)
    intra = ip + inn
    inter = iip + iin + ttp + ttn
    loss = intra + inter
    if mcfg.hash_layer != "select":
        # "linear" mode quantization pull toward ±1.  The reference calls an
        # undefined self.hash_loss here (hash_train.py:131 — latent bug); we
        # use the standard DCHMT-paper quantization |h|->1 penalty instead.
        quant = 0.5 * (jnp.mean((jnp.abs(hash_img) - 1.0) ** 2)
                       + jnp.mean((jnp.abs(hash_txt) - 1.0) ** 2))
        loss = loss + quant
    metrics = {"intra": intra, "inter": inter}
    return loss, metrics
