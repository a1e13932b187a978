"""DHaPH losses (TKDE'24): self-paced multi-similarity + hyperbolic proxies.

Re-expressions of train/DHaPH/{MSLoss.py,HPloss.py,hp_model.py}:

* MSLoss (MSLoss.py:13-34): exp-reweighted contrastive with a warm ramp
  over the first third of training; weights are stop-gradiented
  (``.detach()`` parity);
* HPmodel (hp_model.py:61-72): affine-free LayerNorm -> Linear -> norm clip
  (clip_r 2.3) -> expmap0/project onto the c=0.1 Poincaré ball with the
  Riemannian gradient fix; fed *detached* codes (hash_train.py:77-78);
* HPLoss (HPloss.py:115-221): 500 trainable LCA proxies, reciprocal-top-k
  triplet mining, Gumbel-softmax (hard, straight-through) LCA selection,
  margin hierarchy loss.  The reference mines triplets with host-side
  numpy random choice over ragged index sets (HPloss.py:162-183); here the
  sampling is fixed-shape on-device categorical draws over the same masks
  — same distribution, no host round-trip.  The reference pins lcas to
  GPU 0 (HPloss.py:125-127 ``.to(0)`` — recorded bug).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import DHaPHConfig
from ccmh.losses import pmath
from ccmh.ops.similarity import l2_normalize

_BIG = 1e30


# ---------------------------------------------------------------------------
# self-paced multi-similarity loss
# ---------------------------------------------------------------------------

def ms_loss(
    image_feature: jax.Array, text_feature: jax.Array, labels: jax.Array,
    epoch: jax.Array, *, temperature: float, total_epoch: int,
    self_paced: bool = True,
) -> jax.Array:
    mask = ((labels @ labels.T) > 0).astype(jnp.float32)
    dot = l2_normalize(image_feature) @ l2_normalize(text_feature).T
    all_exp = jnp.exp(dot / temperature)
    pos_exp = mask * all_exp
    neg_exp = (1.0 - mask) * all_exp

    if self_paced:
        third = max(int(total_epoch / 3), 1)
        e = epoch.astype(jnp.float32)
        delta = jnp.where(e <= third, e / third, 1.0)
        w_pos = jax.lax.stop_gradient(jnp.exp(-1.0 - dot)) ** (delta / 4.0)
        w_neg = jax.lax.stop_gradient(jnp.exp(-1.0 + dot)) ** delta
        pos_exp = pos_exp * w_pos
        neg_exp = neg_exp * w_neg

    pos_sum = jnp.sum(pos_exp, 1)
    denom = jnp.sum(neg_exp, 1) + pos_sum
    # Rows with no positive pair would hit log(0) (the reference would too,
    # MSLoss.py:33 — real datasets guarantee >=1 label per item); exclude
    # them rather than poisoning the batch (fix, documented).
    has_pos = jnp.sum(mask, 1) > 0
    per_row = jnp.where(has_pos, -jnp.log(jnp.maximum(pos_sum, 1e-30) / denom), 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(has_pos), 1)


# ---------------------------------------------------------------------------
# HPmodel: Euclidean -> Poincaré ball
# ---------------------------------------------------------------------------

def init_hp_model(rng: jax.Array, bdim: int, emb: int) -> Dict:
    bound = 1.0 / math.sqrt(bdim)
    kw, kb = jax.random.split(rng)
    return {
        "linear": {
            "w": jax.random.uniform(kw, (bdim, emb), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (emb,), minval=-bound, maxval=bound),
        },
    }


def to_poincare(x: jax.Array, c: float, clip_r: float) -> jax.Array:
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-5
    x = x * jnp.minimum(1.0, clip_r / norm)
    rgrad = pmath.make_riemannian_gradient(c)
    return rgrad(pmath.project(pmath.expmap0(x, c), c))


def hp_model(p: Dict, x: jax.Array, mcfg: DHaPHConfig) -> jax.Array:
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)            # affine-free LayerNorm
    x = x @ p["linear"]["w"] + p["linear"]["b"]
    return to_poincare(x, mcfg.curvature, mcfg.clip_r)


def init_lcas(rng: jax.Array, mcfg: DHaPHConfig, sz_embed: int) -> jax.Array:
    lcas = jax.random.normal(rng, (mcfg.n_proxies, sz_embed))
    return lcas / math.sqrt(sz_embed) * mcfg.clip_r * 0.9


# ---------------------------------------------------------------------------
# HPLoss
# ---------------------------------------------------------------------------

def _gumbel_softmax_hard(rng: jax.Array, logits: jax.Array) -> jax.Array:
    """F.gumbel_softmax(logits, tau=1, hard=True): straight-through one-hot."""
    g = jax.random.gumbel(rng, logits.shape)
    soft = jax.nn.softmax(logits + g, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(soft, -1), logits.shape[-1], dtype=soft.dtype)
    return hard + soft - jax.lax.stop_gradient(soft)


def _reciprocal_triplets(
    rng: jax.Array, sim_matrix: jax.Array, topk: int, t_per_anchor: int,
):
    """HPloss.py:162-183: mutual-top-k positives, the rest negatives;
    t_per_anchor samples per valid anchor (uniform with replacement)."""
    n = sim_matrix.shape[0]
    _, topk_idx = jax.lax.top_k(sim_matrix, topk)
    nn = jnp.zeros_like(sim_matrix).at[
        jnp.arange(n)[:, None], topk_idx].set(1.0)
    mutual = (nn + nn.T) / 2.0
    mutual = mutual - 2.0 * jnp.eye(n)                     # diagonal -> negative
    pos_allowed = mutual == 1.0
    neg_allowed = mutual < 1.0
    anchor_ok = jnp.sum(pos_allowed, 1) > 1

    kp, kn = jax.random.split(rng)
    pos_logits = jnp.where(pos_allowed, 0.0, -_BIG)        # uniform over allowed
    neg_logits = jnp.where(neg_allowed, 0.0, -_BIG)
    pos = jax.random.categorical(kp, pos_logits[:, None, :],
                                 axis=-1, shape=(n, t_per_anchor))
    neg = jax.random.categorical(kn, neg_logits[:, None, :],
                                 axis=-1, shape=(n, t_per_anchor))
    anchors = jnp.broadcast_to(jnp.arange(n)[:, None], (n, t_per_anchor))
    mask = jnp.broadcast_to(anchor_ok[:, None], (n, t_per_anchor))
    return anchors.ravel(), pos.ravel(), neg.ravel(), mask.ravel()


def _compute_ghhc(
    rng: jax.Array, cp_dist: jax.Array, triplets, mrg: float, tau: float,
) -> jax.Array:
    """HPloss.py:133-159 with a validity mask instead of ragged lists."""
    i, j, k, valid = triplets
    r1, r2 = jax.random.split(rng)
    max_ij = jnp.maximum(cp_dist[i], cp_dist[j])           # [T, C]
    p_ij = _gumbel_softmax_hard(r1, -max_ij / tau)
    idx_ij = jnp.argmax(p_ij, -1)

    max_ijk = jnp.maximum(cp_dist[k], max_ij)
    p_ijk = _gumbel_softmax_hard(r2, -max_ijk / tau)
    idx_ijk = jnp.argmax(p_ijk, -1)

    def d(row, prob):
        return jnp.sum(cp_dist[row] * prob, 1)

    hc = (jax.nn.relu(d(i, p_ij) - d(i, p_ijk) + mrg)
          + jax.nn.relu(d(j, p_ij) - d(j, p_ijk) + mrg)
          + jax.nn.relu(d(k, p_ijk) - d(k, p_ij) + mrg))
    hc = hc * (idx_ij != idx_ijk) * valid
    return jnp.sum(hc) / jnp.maximum(jnp.sum(valid), 1.0)


def hp_loss(
    rng: jax.Array, z_s: jax.Array, t_s: jax.Array, y: jax.Array,
    lcas_raw: jax.Array, mcfg: DHaPHConfig,
) -> jax.Array:
    """HPloss.forward (HPloss.py:185-221)."""
    bs = z_s.shape[0]
    c, tau, mrg = mcfg.curvature, mcfg.temperature, 0.1
    hot = (y @ y.T) > 0

    lcas = to_poincare(lcas_raw, c, mcfg.clip_r)

    def dists(feats):
        nodes = jnp.concatenate([feats, lcas])
        return pmath.dist_matrix(nodes, nodes, c)

    dm = dists(z_s)
    t_dm = dists(t_s)

    def sims(d):
        s = jax.lax.stop_gradient(jnp.exp(-d[:bs, :bs]))
        s = s + hot.astype(s.dtype)
        s2 = jax.lax.stop_gradient(jnp.exp(-d[bs:, bs:]))
        return s, s2

    sim, sim2 = sims(dm)
    t_sim, t_sim2 = sims(t_dm)

    keys = jax.random.split(rng, 8)
    loss = _compute_ghhc(keys[0], dm[:bs, bs:],
                         _reciprocal_triplets(keys[1], sim, mcfg.topk, 50), mrg, tau)
    loss += _compute_ghhc(keys[2], dm[bs:, bs:],
                          _reciprocal_triplets(keys[3], sim2, mcfg.topk, 50), mrg, tau)
    loss += _compute_ghhc(keys[4], t_dm[:bs, bs:],
                          _reciprocal_triplets(keys[5], t_sim, mcfg.topk, 50), mrg, tau)
    loss += _compute_ghhc(keys[6], t_dm[bs:, bs:],
                          _reciprocal_triplets(keys[7], t_sim2, mcfg.topk, 50), mrg, tau)
    return loss


def dhaph_loss(
    rng: jax.Array,
    hash_img: jax.Array, hash_txt: jax.Array, label: jax.Array,
    extra: Dict, epoch: jax.Array, mcfg: DHaPHConfig, total_epoch: int,
    alpha: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """hash_train.py:70-84: 3x self-paced MS + alpha x hyperbolic proxy loss
    on detached codes through HPmodel."""
    e = epoch + 1
    l1 = ms_loss(hash_img, hash_img, label, e,
                 temperature=0.3, total_epoch=total_epoch)
    l2 = ms_loss(hash_txt, hash_txt, label, e,
                 temperature=0.3, total_epoch=total_epoch)
    l3 = ms_loss(hash_img, hash_txt, label, e,
                 temperature=0.3, total_epoch=total_epoch)

    hp_img = hp_model(extra["hpmodel"], jax.lax.stop_gradient(hash_img), mcfg)
    hp_txt = hp_model(extra["hpmodel"], jax.lax.stop_gradient(hash_txt), mcfg)
    l4 = hp_loss(rng, hp_img, hp_txt, label, extra["lcas"], mcfg)

    loss = l1 + l2 + l3 + alpha * l4
    return loss, {"ms": l1 + l2 + l3, "hp": l4}
