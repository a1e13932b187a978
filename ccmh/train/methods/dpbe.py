"""DPBE method (MM'25): Bayesian Linear->L2Norm heads with diagonal Laplace
posterior; Hessian EMA state lives in aux."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dpbe import dpbe_encode_codes, dpbe_sampled_loss
from ccmh.models.heads import init_l2norm_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2 = jax.random.split(rng)
    heads = {
        "img_head": init_l2norm_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_l2norm_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
    }
    # hessian init: data_size * ones (stochman/laplace.py:63-66)
    def ones_like_head(h):
        return jax.tree.map(lambda t: float(cfg.train_num) * jnp.ones_like(t), h)

    aux = {
        "hessian_i": ones_like_head(heads["img_head"]),
        "hessian_t": ones_like_head(heads["txt_head"]),
    }
    return heads, None, aux


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    mcfg = cfg.dpbe
    loss, h_i, h_t = dpbe_sampled_loss(
        rng, img.pooled, txt.pooled, batch["label"],
        params["img_head"], params["txt_head"],
        aux["hessian_i"], aux["hessian_t"],
        n_samples=mcfg.n_samples, max_pairs=mcfg.max_pairs,
        train_num=cfg.train_num,
    )
    f = mcfg.hessian_ema
    new_aux = {
        "hessian_i": jax.tree.map(
            lambda old, new: f * old + jax.nn.relu(new), aux["hessian_i"], h_i),
        "hessian_t": jax.tree.map(
            lambda old, new: f * old + jax.nn.relu(new), aux["hessian_t"], h_t),
    }
    return loss, (new_aux, {})


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    # deterministic eval sampling (the reference draws from the global torch
    # rng once per valid pass, hash_train.py:195-197)
    rng = jax.random.PRNGKey(cfg.seed)
    z_i, z_t = dpbe_encode_codes(
        rng, img.pooled, txt.pooled,
        params["img_head"], params["txt_head"],
        aux["hessian_i"], aux["hessian_t"], cfg.dpbe.n_samples)
    return sign_codes(z_i), sign_codes(z_t)


register(Method(name="DPBE", init=_init, loss=_loss, encode=_encode))
