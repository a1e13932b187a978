"""DScPH loss (TMM'25): circle-proxy-filter + Householder rotation +
bit-variance quantization.

Re-expressions of train/DScPH/{CPF_loss.py,FAST_HPP.py}:

* CPF (CPF_loss.py:4-53): class-proxy cosine loss with exp re-weighting
  (weights stop-gradiented, matching ``.detach()``), masked negative terms
  over cos > tau — the reference's boolean indexing becomes fixed-shape
  masks;
* Householder rotation: product of K normalized-column reflections.  The
  reference's O(log d) blocked fasthpp (FAST_HPP.py:30-79) is a *compute
  schedule* for the same orthogonal matrix; on TPU a lax.scan of rank-1
  reflection applications over K <= 64 columns is simpler and equally fast.
  NOTE the reference never adds the rotation to any optimizer
  (hash_train.py:37-44 — recorded bug, it stays frozen at its identity-ish
  init); here it trains under the head lr by default;
* bit_var_loss (FAST_HPP.py:6-11): mean sigma(z)(1 - sigma(z)).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import DScPHConfig
from ccmh.ops.similarity import l2_normalize


def init_cpf(rng: jax.Array, embed_dim: int, n_classes: int) -> Dict:
    """xavier_uniform over [n_classes, embed_dim] (CPF_loss.py:12-13)."""
    bound = math.sqrt(6.0 / (n_classes + embed_dim))
    return {"weight": jax.random.uniform(rng, (n_classes, embed_dim),
                                         minval=-bound, maxval=bound)}


def cpf_loss(
    image: jax.Array, text: jax.Array, labels: jax.Array, cpf: Dict,
    *, tau: float = 0.9, psi: float = 0.7, sp: float = 1.3, sn: float = 1.3,
    mu: float = 1.0, b: float = 2.0,
) -> jax.Array:
    w = l2_normalize(cpf["weight"])

    def one_modality(feat):
        cos = l2_normalize(feat) @ w.T                         # [B, C]
        tp = jnp.sum(jnp.maximum(cos, 0.0) * labels) * 2.0 + b
        wp = jax.lax.stop_gradient(jnp.exp((1.0 - cos) * sp))
        lossp = jnp.sum((1.0 - cos) * wp * labels)
        mask = cos > tau
        wn = jax.lax.stop_gradient(jnp.exp((cos - mu) * sn))
        lossn = jnp.sum(jnp.where(mask, (cos - psi) * wn * (1.0 - labels), 0.0))
        return 1.0 - tp / (tp + lossp + lossn)

    return one_modality(image) + one_modality(text)


def init_householder(dim: int) -> Dict:
    return {"weights": jnp.eye(dim)}


def householder_rotate(p: Dict, x: jax.Array) -> jax.Array:
    """Apply the product of Householder reflections H_0..H_{d-1} (columns of
    the normalized weight matrix) to x: [B, d] -> [B, d]."""
    v = p["weights"] / jnp.maximum(jnp.linalg.norm(p["weights"], axis=0, keepdims=True), 1e-12)

    def body(carry, vi):
        # H x = x - 2 v (v^T x)
        proj = carry @ vi                                       # [B]
        return carry - 2.0 * proj[:, None] * vi[None, :], None

    out, _ = jax.lax.scan(body, x, v.T)
    return out


def bit_var_loss(z: jax.Array) -> jax.Array:
    s = jax.nn.sigmoid(z)
    return jnp.mean(s * (1.0 - s))


def dscph_loss(
    hash_img: jax.Array, hash_txt: jax.Array, label: jax.Array,
    extra: Dict, mcfg: DScPHConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """hash_train.py:63-70: CPF + bit-variance of rotated, row-normalized codes."""
    cpf = cpf_loss(hash_img, hash_txt, label, extra["cpf"], tau=mcfg.tau)
    img_rot = l2_normalize(householder_rotate(extra["rot"], hash_img))
    txt_rot = l2_normalize(householder_rotate(extra["rot"], hash_txt))
    quant = bit_var_loss(img_rot) + bit_var_loss(txt_rot)
    return cpf + quant, {"cpf": cpf, "bit_var": quant}
