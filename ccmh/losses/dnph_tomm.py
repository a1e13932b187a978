"""DNPH loss (TOMM'24): proxy loss + class CE + uniform-noise regularizer.

Re-expressions of train/DNPH_TOMM/{loss.py,b_reg.py}:

* DNPH_out (loss.py:14-31): squared cdist of concatenated normalized codes
  to normalized proxies, +1 margin added at positive entries,
  ``-label * log_softmax(-D)`` plus cross-entropy on the label-logit heads;
* noise regularizer (b_reg.py:5-41 + hash_train.py:66-81): random ±1
  vectors Hungarian-matched to the batch codes (minimum total L2), then
  ``-0.1 * mean(sum(code * noise))``.  The assignment is combinatorial and
  O(B^3); it runs on host via jax.pure_callback exactly like the
  reference's scipy call — it consumes detached codes, so it sits outside
  the gradient path and XLA overlaps it with the backward pass.

DP semantics: the jitted step is a single GLOBAL program, so under a data-
parallel mesh the callback receives the WHOLE batch's cost matrix (GSPMD
gathers the sharded operands before the host call).  The assignment is
therefore identical to the reference's whole-batch Hungarian
(b_reg.py:33), NOT a per-shard approximation — asserted by
tests/test_parallel.py::test_dp_state_mutating_methods[DNPH].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccmh.ops.similarity import l2_normalize


def init_dnph_proxies(rng: jax.Array, nclass: int, output_dim: int) -> Dict:
    return {"proxies": jax.random.normal(rng, (nclass, output_dim)) / 8.0}


def _softmax_ce(logits: jax.Array, target_idx: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target_idx[:, None], axis=1)[:, 0])


def dnph_proxy_loss(
    feat1: jax.Array, feat2: jax.Array,
    pred1: jax.Array, pred2: jax.Array,
    label1: jax.Array, label2: jax.Array,
    proxies: jax.Array, mrg: float = 1.0,
) -> jax.Array:
    feats = l2_normalize(jnp.concatenate([feat1, feat2], axis=0))
    labels = jnp.concatenate([label1, label2], axis=0)
    p = l2_normalize(proxies)
    # squared euclidean distance to proxies
    d = (jnp.sum(feats ** 2, 1, keepdims=True) + jnp.sum(p ** 2, 1)[None, :]
         - 2.0 * feats @ p.T)
    d = d + mrg * (labels == 1)
    p_loss = jnp.mean(jnp.sum(-labels * jax.nn.log_softmax(-d, axis=1), axis=-1))
    d_loss = _softmax_ce(pred1, jnp.argmax(label1, -1)) + _softmax_ce(pred2, jnp.argmax(label2, -1))
    return p_loss + d_loss


def _hungarian(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    _, col = linear_sum_assignment(cost)
    return col.astype(np.int32)


def assign_noise(codes: jax.Array, noise: jax.Array) -> jax.Array:
    """Permute noise rows to minimize total L2 to the codes (b_reg.py:20-41)."""
    c = jax.lax.stop_gradient(codes)
    cost = jnp.linalg.norm(c[:, None, :] - noise[None, :, :], axis=-1)
    col = jax.pure_callback(
        _hungarian,
        jax.ShapeDtypeStruct((codes.shape[0],), jnp.int32),
        cost,
        vmap_method="sequential",
    )
    return noise[col]


def noise_regularizer(rng: jax.Array, hash_img: jax.Array, hash_txt: jax.Array) -> jax.Array:
    """rand ±1 vectors -> Hungarian assignment per modality -> mean inner
    product (hash_train.py:66-78).  Returns the value to *subtract* scaled."""
    b, k = hash_img.shape
    noise = (2 * jax.random.randint(rng, (b, k), 0, 2) - 1).astype(jnp.float32)
    i_noise = assign_noise(hash_img, noise)
    t_noise = assign_noise(hash_txt, noise)
    i_term = jnp.mean(jnp.sum(hash_img * i_noise, axis=-1))
    t_term = jnp.mean(jnp.sum(hash_txt * t_noise, axis=-1))
    return i_term + t_term
