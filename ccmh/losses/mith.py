"""MITH 5-part loss (MM'23).

Re-expression of train/MITH/hash_train.py:104-200:

* bayesian likelihood vs epoch-persistent buffers of all train codes
  (tokens intra, cls inter) — the buffers live in the method's aux state
  and are scatter-updated each step exactly like the reference's GPU
  buffers (:72-78);
* sign-target quantization with λ-blended joint target B (:80-83,146-147);
* global InfoNCE + token-level bmm InfoNCE (:103-136);
* bidirectional distillation cls<->tokens, 1x student / 0.1x teacher
  (:192-200).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ccmh.config import MITHConfig
from ccmh.models.mith import MithOutputs


def bayesian_loss(a: jax.Array, b: jax.Array, label_sim: jax.Array) -> jax.Array:
    s = jnp.clip(0.5 * a @ b.T, -64.0, 64.0)
    return -jnp.mean(label_sim * s - jax.nn.softplus(s))


def info_nce_loss(out_1: jax.Array, out_2: jax.Array, temperature: float) -> jax.Array:
    scores = out_1 @ out_2.T / temperature
    targets = jnp.arange(out_1.shape[0])
    lp0 = jax.nn.log_softmax(scores, axis=1)
    lp1 = jax.nn.log_softmax(scores.T, axis=1)
    loss0 = -jnp.mean(jnp.take_along_axis(lp0, targets[:, None], 1))
    loss1 = -jnp.mean(jnp.take_along_axis(lp1, targets[:, None], 1))
    return 0.5 * (loss0 + loss1)


def info_nce_loss_bmm(out_1: jax.Array, out_2: jax.Array, temperature: float) -> jax.Array:
    """Token-level InfoNCE over [B, L, D] pairs (hash_train.py:118-136)."""
    sim = jnp.einsum("bld,bmd->blm", out_1, out_2) / temperature
    L = sim.shape[1]
    targets = jnp.arange(L)
    lp1 = jax.nn.log_softmax(sim, axis=2)
    lp2 = jax.nn.log_softmax(sim.transpose(0, 2, 1), axis=2)
    loss1 = -jnp.mean(jnp.take_along_axis(lp1, jnp.broadcast_to(targets[None, :, None], (sim.shape[0], L, 1)), 2))
    loss2 = -jnp.mean(jnp.take_along_axis(lp2, jnp.broadcast_to(targets[None, :, None], (sim.shape[0], L, 1)), 2))
    return 0.5 * (loss1 + loss2)


def quantization_loss(hash_feature: jax.Array, B: jax.Array, k_bits: int) -> jax.Array:
    return jnp.sum((hash_feature - B) ** 2) / hash_feature.shape[0] / k_bits


def mith_loss(
    out: MithOutputs,
    label_sim: jax.Array,          # [train_num, B]
    buffers: Dict[str, jax.Array],  # img/txt tokens/cls buffers [train_num, K]
    mcfg: MITHConfig,
    k_bits: int,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    lam = mcfg.hyper_lambda
    B_target = jnp.sign(jax.lax.stop_gradient(
        out.img_cls_hash * lam + out.img_tokens_hash * (1 - lam)
        + out.txt_cls_hash * lam + out.txt_tokens_hash * (1 - lam)))

    losses = {}
    losses["tokens_intra_likelihood"] = mcfg.hyper_tokens_intra * (
        bayesian_loss(buffers["img_tokens"], out.img_tokens_hash, label_sim)
        + bayesian_loss(buffers["txt_tokens"], out.txt_tokens_hash, label_sim))
    losses["cls_inter_likelihood"] = mcfg.hyper_cls_inter * (
        bayesian_loss(buffers["img_cls"], out.txt_cls_hash, label_sim)
        + bayesian_loss(buffers["txt_cls"], out.img_cls_hash, label_sim))

    H_i = out.img_cls_hash * 0.5 + out.img_tokens_hash * 0.5
    H_t = out.txt_cls_hash * 0.5 + out.txt_tokens_hash * 0.5
    losses["quantization"] = mcfg.hyper_quan * (
        quantization_loss(H_i, B_target, k_bits)
        + quantization_loss(H_t, B_target, k_bits))

    losses["infoNCE"] = mcfg.hyper_info_nce * (
        info_nce_loss(out.res_img_cls, out.res_txt_cls, mcfg.nce_temperature)
        + mcfg.hyper_alpha * info_nce_loss_bmm(
            out.trans_tokens_i, out.trans_tokens_t, mcfg.nce_temperature))

    sg = jax.lax.stop_gradient
    item_1 = (jnp.sum((sg(out.img_cls_hash) - out.img_tokens_hash) ** 2)
              + jnp.sum((sg(out.txt_cls_hash) - out.txt_tokens_hash) ** 2))
    item_2 = 0.1 * (jnp.sum((out.img_cls_hash - sg(out.img_tokens_hash)) ** 2)
                    + jnp.sum((out.txt_cls_hash - sg(out.txt_tokens_hash)) ** 2))
    losses["distillation"] = mcfg.hyper_distill * (item_1 + item_2) / out.img_cls_hash.shape[0]

    return sum(losses.values()), losses
