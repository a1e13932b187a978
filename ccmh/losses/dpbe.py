"""DPBE Laplace-approximation Bayesian hashing (MM'25).

Re-expression of train/DPBE/hash_train.py:89-258 plus the parts of the
vendored stochman library the method actually uses:

* diagonal Laplace posterior over the Linear->L2Norm head weights
  (stochman/laplace.py:51-77): sigma = 1/(sqrt(relu(H) + 1) + 1e-6),
  theta_s = mu + eps * sigma; gradients flow to mu through the sampled
  evaluation point (vector_to_parameters semantics);
* the diagonal generalized-Gauss-Newton of the head, which stochman derives
  with a generic Jacobian engine (nnj.Sequential._jTmjp), has a closed form
  for Linear->L2Norm and is implemented directly:
      M = J_l2^T J_l2 with diag M_jj = (1 - (2 - s) yhat_j^2) / (n + eps)^2,
      H[W_jk] = mean_b M_jj x_k^2,   H[b_j] = mean_b M_jj,
  (L2Norm jacobian: stochman/nnj.py:1466-1476; MSE calculator:
  stochman/hessian.py:75-95 — identity output metric, mean over batch);
* affinity targets: 2*sigmoid(label@label^T) - 1 (hash_train.py:289-303);
* Hessian scaling N^2/b with b = #triplets capped at max_pairs
  (laplace.scale, hash_train.py:158-170), EMA 0.999 + relu;
* the reference's loss overwrite inside the sample loop (hash_train.py:136-141
  keeps only the LAST sample's loss, then divides by n_samples — recorded
  bug) is repaired to a proper mean over samples.

The reference's train loop also double-applies the hashing head
(hash_train.py:103 model() already hashes, then :130 hashing() again —
crashes for K != 512; recorded bug).  Here the CLIP embedding feeds the
sampled heads once, the clear intent of MDPBE.encoding (model/DPBE.py:27-31).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]
EPS = 1e-6


def l2norm_head_apply(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"] + p["b"]
    return y / (jnp.linalg.norm(y, axis=1, keepdims=True) + EPS)


def head_ggn_diag(p: Params, x: jax.Array) -> Params:
    """Closed-form diagonal GGN of Linear->L2Norm wrt (w, b), batch-mean."""
    y = x @ p["w"] + p["b"]                        # [B, K]
    n = jnp.linalg.norm(y, axis=1, keepdims=True)  # [B, 1]
    yhat = y / (n + EPS)
    s = jnp.sum(yhat * yhat, axis=1, keepdims=True)
    m_diag = (1.0 - (2.0 - s) * yhat ** 2) / (n + EPS) ** 2   # [B, K]
    x2 = x * x                                                 # [B, D]
    h_w = jnp.einsum("bd,bk->dk", x2, m_diag) / x.shape[0]     # [D, K]
    h_b = jnp.mean(m_diag, axis=0)                             # [K]
    return {"w": h_w, "b": h_b}


def posterior_scale(hessian: Params, prior_prec: float = 1.0) -> Params:
    return jax.tree.map(
        lambda h: 1.0 / (jnp.sqrt(jax.nn.relu(h) + prior_prec) + 1e-6), hessian)


def sample_head(rng: jax.Array, mu: Params, sigma: Params) -> Params:
    """One posterior weight sample; gradient flows to mu only."""
    noise = {
        "w": jax.random.normal(rng, mu["w"].shape),
        "b": jax.random.normal(jax.random.fold_in(rng, 1), mu["b"].shape),
    }
    return jax.tree.map(lambda m, e, s: m + jax.lax.stop_gradient(e * s),
                        mu, noise, sigma)


def affinity_targets(label: jax.Array) -> jax.Array:
    aff = label @ label.T
    return 2.0 * jax.nn.sigmoid(aff) - 1.0


def n_triplets(label: jax.Array) -> jax.Array:
    """Count of (anchor, pos, neg) triplets EXACTLY as the reference's
    TripletMinner computes it (train/DPBE/triplet_miner.py:5-38) — the
    count scales every Hessian term, so its upstream quirks are reproduced
    bit-for-bit: ``matches = (L @ L^T).byte()`` keeps the raw overlap count
    (mod 256) rather than a boolean, ``diffs = matches ^ 1`` marks a pair
    as a NEGATIVE whenever that byte XOR 1 is nonzero (overlap 0, and any
    overlap >= 2), and the triplet tensor itself is the **uint8 product**
    ``matches[a,p] * diffs[a,n]`` — products that are nonzero multiples of
    256 (e.g. 16*16, 64*4) wrap to 0 and are DROPPED from the count.

    The wrap is counted without materialising the [B,B,B] tensor: a uint8
    product is 0 mod 256 iff v2(x) + v2(y) >= 8 (v2 = 2-adic valuation,
    v2(0) treated as 8 since x = 0 mod 256), so per-anchor 9-bin histograms
    of v2(matches) and v2(diffs) give the exact count via a [9,9] mask.
    (Trajectory-parity evidence: tests/test_trajectory.py
    test_dpbe_trajectory asserts the resulting Hessian EMA buffers.)"""
    m = jnp.asarray(label @ label.T, jnp.int32) % 256
    d = m ^ 1

    def v2(x):  # 2-adic valuation of bytes: 8 for 0, else trailing zeros
        return sum((x % (1 << j) == 0).astype(jnp.int32) for j in range(1, 9))

    hist_m = jnp.sum(jax.nn.one_hot(v2(m), 9, dtype=jnp.int32), axis=1)
    hist_d = jnp.sum(jax.nn.one_hot(v2(d), 9, dtype=jnp.int32), axis=1)
    i = jnp.arange(9)
    nonzero = (i[:, None] + i[None, :] < 8).astype(jnp.int32)
    return jnp.einsum("ai,aj,ij->", hist_m, hist_d, nonzero)


def dpbe_sampled_loss(
    rng: jax.Array,
    embed_i: jax.Array, embed_t: jax.Array, label: jax.Array,
    mu_i: Params, mu_t: Params,
    hessian_i: Params, hessian_t: Params,
    *, n_samples: int, max_pairs: int, train_num: int,
) -> Tuple[jax.Array, Params, Params]:
    """-> (mean loss over posterior samples, batch hessian_i, hessian_t)."""
    aff = affinity_targets(label)
    sigma_i = posterior_scale(jax.tree.map(jax.nn.relu, hessian_i))
    sigma_t = posterior_scale(jax.tree.map(jax.nn.relu, hessian_t))

    trips = n_triplets(label)
    b = jnp.minimum(trips, max_pairs).astype(jnp.float32)
    scale = (train_num ** 2) / jnp.maximum(b, 1.0)

    def per_sample(key):
        ki, kt = jax.random.split(key)
        theta_i = sample_head(ki, mu_i, sigma_i)
        theta_t = sample_head(kt, mu_t, sigma_t)
        z_i = l2norm_head_apply(theta_i, embed_i)
        z_t = l2norm_head_apply(theta_t, embed_t)
        loss = (jnp.mean((z_i @ z_i.T - aff) ** 2)
                + jnp.mean((z_t @ z_t.T - aff) ** 2)
                + jnp.mean((z_i @ z_t.T - aff) ** 2))
        h_i = jax.tree.map(lambda h: h * scale,
                           head_ggn_diag(jax.lax.stop_gradient(theta_i),
                                         jax.lax.stop_gradient(embed_i)))
        h_t = jax.tree.map(lambda h: h * scale,
                           head_ggn_diag(jax.lax.stop_gradient(theta_t),
                                         jax.lax.stop_gradient(embed_t)))
        return loss, h_i, h_t

    keys = jax.random.split(rng, n_samples)
    losses, h_is, h_ts = jax.vmap(per_sample)(keys)
    mean_h_i = jax.tree.map(lambda h: jnp.mean(h, axis=0), h_is)
    mean_h_t = jax.tree.map(lambda h: jnp.mean(h, axis=0), h_ts)
    return jnp.mean(losses), mean_h_i, mean_h_t


def dpbe_encode_codes(
    rng: jax.Array,
    embed_i: jax.Array, embed_t: jax.Array,
    mu_i: Params, mu_t: Params,
    hessian_i: Params, hessian_t: Params,
    n_samples: int,
) -> Tuple[jax.Array, jax.Array]:
    """Eval: mean of n sampled normalized codes, then sign
    (hash_train.py:214-242)."""
    sigma_i = posterior_scale(jax.tree.map(jax.nn.relu, hessian_i))
    sigma_t = posterior_scale(jax.tree.map(jax.nn.relu, hessian_t))

    def per_sample(key):
        ki, kt = jax.random.split(key)
        z_i = l2norm_head_apply(sample_head(ki, mu_i, sigma_i), embed_i)
        z_t = l2norm_head_apply(sample_head(kt, mu_t, sigma_t), embed_t)
        return z_i, z_t

    zs_i, zs_t = jax.vmap(per_sample)(jax.random.split(rng, n_samples))
    return jnp.mean(zs_i, axis=0), jnp.mean(zs_t, axis=0)
