"""DMsH-LN loss (Neurocomputing'24): LabelNet + multi-similarity mining.

Re-expression of train/DMsH_LN/{MSLOSS.py,labelnet.py}:

* LabelNet: label -> code MLP with epoch-annealed tanh sharpness
  alpha = sqrt(epoch + 1) (labelnet.py:6-22);
* MultiSimilarityLoss (MSLOSS.py:4-56): per-row pair mining over the
  *row-normalized* similarity matrix (the reference F.normalize's a full
  row of feats @ featsᵀ), positives defined by sign of label-code inner
  products, exp-weighted log-sum losses.  The reference's per-row python
  loop with boolean indexing becomes fixed-shape masked reductions.

The reference hardcodes the MSL module to cuda:1 (hash_train.py:35 —
recorded bug); MSL has no parameters so this only crashed single-GPU boxes.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import DMsHLNConfig

_NEG_INF = -1e30


def init_label_net(rng: jax.Array, label_dim: int, code_len: int) -> Dict:
    hidden = (label_dim + code_len) // 2

    def linear(key, i, o):
        bound = 1.0 / math.sqrt(i)
        kw, kb = jax.random.split(key)
        return {
            "w": jax.random.uniform(kw, (i, o), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (o,), minval=-bound, maxval=bound),
        }

    k1, k2 = jax.random.split(rng)
    return {"fc1": linear(k1, label_dim, hidden), "fc2": linear(k2, hidden, code_len)}


def label_net(p: Dict, label: jax.Array, epoch: jax.Array) -> jax.Array:
    alpha = jnp.sqrt(epoch.astype(jnp.float32) + 1.0)
    feat = jax.nn.relu(label @ p["fc1"]["w"] + p["fc1"]["b"])
    hid = feat @ p["fc2"]["w"] + p["fc2"]["b"]
    return jnp.tanh(alpha * hid)


def multi_similarity_loss(
    feats: jax.Array, label_codes: jax.Array, mcfg: DMsHLNConfig,
    feat2: jax.Array = None,
) -> jax.Array:
    """MSLOSS.py:13-56 with masked (fixed-shape) mining."""
    other = feats if feat2 is None else feat2
    raw = feats @ other.T
    # F.normalize over dim=1: each ROW of the similarity matrix to unit norm.
    sim = raw / jnp.maximum(jnp.linalg.norm(raw, axis=1, keepdims=True), 1e-12)

    pos_label = (label_codes @ label_codes.T) > 0            # [B, B] bool
    eps = 1e-5
    pos_mask = pos_label & (sim < 1 - eps)
    neg_mask = ~pos_label

    has_pos = jnp.any(pos_mask, axis=1)
    has_neg = jnp.any(neg_mask, axis=1)

    min_pos = jnp.min(jnp.where(pos_mask, sim, -_NEG_INF), axis=1)   # +inf if none
    max_neg = jnp.max(jnp.where(neg_mask, sim, _NEG_INF), axis=1)    # -inf if none

    mined_neg = neg_mask & (sim + mcfg.ms_margin > min_pos[:, None])
    mined_pos = pos_mask & (sim - mcfg.ms_margin < max_neg[:, None])

    valid = has_pos & has_neg & jnp.any(mined_neg, 1) & jnp.any(mined_pos, 1)

    sp, sn, th = mcfg.scale_pos, mcfg.scale_neg, mcfg.ms_thresh
    pos_exp = jnp.where(mined_pos, jnp.exp(-sp * (sim - th)), 0.0)
    neg_exp = jnp.where(mined_neg, jnp.exp(sn * (sim - th)), 0.0)
    pos_loss = jnp.log1p(jnp.sum(pos_exp, axis=1)) / sp
    neg_loss = jnp.log1p(jnp.sum(neg_exp, axis=1)) / sn

    return jnp.sum(jnp.where(valid, pos_loss + neg_loss, 0.0)) / feats.shape[0]


def dmsh_ln_loss(
    hash_img: jax.Array, hash_txt: jax.Array, label: jax.Array,
    label_net_params: Dict, epoch: jax.Array, mcfg: DMsHLNConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """hash_train.py:62-67: MSL(img, L), MSL(txt, L), MSL(img, L, feat2=txt)."""
    codes = label_net(label_net_params, label, epoch)
    li = multi_similarity_loss(hash_img, codes, mcfg)
    lt = multi_similarity_loss(hash_txt, codes, mcfg)
    lit = multi_similarity_loss(hash_img, codes, mcfg, feat2=hash_txt)
    return li + lt + lit, {"img": li, "txt": lt, "i_t": lit}
