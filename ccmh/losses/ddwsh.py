"""DDWSH loss (TMM'26): margin loss with distance-weighted negative mining.

Re-expression of train/DDWSH/loss.py.  The reference file is broken as
committed (``self.beta_constant`` never defined, loss.py:32; the miner is
constructed with the args namespace as ``tau``, loss.py:14 vs 84 — recorded
bugs); this implements the intended per-class-beta margin loss with the
inverse-sphere-distance negative sampler, fully on-device:

* distances for the loss: cdist of L2-normalized codes, clamp min 1e-8;
* the miner receives the *detached distance matrix as its feature matrix*
  (loss.py:22 passes cdist to a sampler that calls pdist on it,
  loss.py:101-122) — an upstream quirk we reproduce because it shapes the
  sampling distribution;
* negatives ~ q(d) ∝ d^(2-n) (1 - d²/4)^-((n-3)/2), same-label zeroed;
* anchors with <2 positives or all-positive rows are skipped (masked);
* loss = sum(relu(d_ap - beta + margin) + relu(beta - d_an + margin)) /
  #active pairs, beta per anchor = label-weighted mean of class betas.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import DDWSHConfig
from ccmh.ops.similarity import euclidean_similarity, l2_normalize

_BIG = 1e30


def _pdist(a: jax.Array, eps: float = 1e-4) -> jax.Array:
    prod = a @ a.T
    norm = jnp.diag(prod)[:, None]
    sq = jnp.maximum(norm + norm.T - 2.0 * prod, 0.0)
    return jnp.sqrt(jnp.maximum(sq, eps))


def margin_loss(
    codes: jax.Array, labels: jax.Array, extra: Dict, rng: jax.Array,
    mcfg: DDWSHConfig, y: jax.Array = None,
) -> jax.Array:
    batch = l2_normalize(codes)
    other = batch if y is None else l2_normalize(y)
    b = batch.shape[0]

    cdist = jnp.maximum(euclidean_similarity(batch, other), 1e-8)     # [B, B]

    # ---- distance-weighted sampling over pdist(cdist) (loss.py:101-122)
    d = jnp.maximum(_pdist(jax.lax.stop_gradient(cdist)), mcfg.cutoff)
    dim = float(b)  # the miner's "feature dim" is B (it sees the B x B matrix)
    A = jnp.maximum(1.0 - 0.25 * d * d, 1e-8)
    log_q = (2.0 - dim) * jnp.log(d) - ((dim - 3.0) / 2.0) * jnp.log(A)

    same = (labels @ labels.T) > 0                                     # [B, B]
    pos_count = jnp.sum(same, axis=1)                                  # incl. self
    all_same = pos_count == b
    anchor_ok = (pos_count > 1) & ~all_same

    log_q = jnp.where(same, -_BIG, log_q)                              # zero same-class prob
    k_pos, k_neg = jax.random.split(rng)
    pos_logits = jnp.where(same & ~jnp.eye(b, dtype=bool), 0.0, -_BIG)
    pos_idx = jax.random.categorical(k_pos, pos_logits, axis=1)        # uniform positive
    neg_idx = jax.random.categorical(k_neg, log_q, axis=1)

    d_ap = jnp.take_along_axis(cdist, pos_idx[:, None], axis=1)[:, 0]
    d_an = jnp.take_along_axis(cdist, neg_idx[:, None], axis=1)[:, 0]

    # per-anchor beta: label-weighted mean of class betas (loss.py:36-37)
    beta = (labels @ extra["beta"]) / jnp.maximum(jnp.sum(labels, axis=1), 1.0)

    pos_loss = jax.nn.relu(d_ap - beta + mcfg.margin) * anchor_ok
    neg_loss = jax.nn.relu(beta - d_an + mcfg.margin) * anchor_ok
    pair_count = jnp.sum((pos_loss > 0).astype(jnp.float32)
                         + (neg_loss > 0).astype(jnp.float32))
    total = jnp.sum(pos_loss + neg_loss)
    return jnp.where(pair_count > 0, total / jnp.maximum(pair_count, 1.0), total)


def ddwsh_loss(
    hash_img: jax.Array, hash_txt: jax.Array, label: jax.Array,
    extra: Dict, rng: jax.Array, mcfg: DDWSHConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """hash_train.py:66-68: criterion(i), criterion(t), criterion(i, y=t)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    li = margin_loss(hash_img, label, extra, r1, mcfg)
    lt = margin_loss(hash_txt, label, extra, r2, mcfg)
    lit = margin_loss(hash_img, label, extra, r3, mcfg, y=hash_txt)
    return li + lt + lit, {"img": li, "txt": lt, "i_t": lit}


def init_ddwsh_extra(rng: jax.Array, nclass: int, beta_init: float) -> Dict:
    return {"beta": jnp.full((nclass,), beta_init)}
