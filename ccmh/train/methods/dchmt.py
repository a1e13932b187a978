"""DCHMT method (MM'22) — the PR1 / minimum end-to-end slice.

Select-mechanism hash heads (model/DCHMT.py:8-45) over the shared CLIP,
our_loss, argmax-pair code extraction (train/base.py:150-178).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dchmt import dchmt_loss
from ccmh.models.heads import (
    init_select_hash, select_hash, select_code,
    init_linear_hash, linear_hash,
)
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng: jax.Array, cfg: Config, clip_cfg: ClipConfig):
    k1, k2 = jax.random.split(rng)
    if cfg.dchmt.hash_layer == "select":
        heads = {
            "img_head": init_select_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
            "txt_head": init_select_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        }
    else:
        heads = {
            "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
            "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        }
    return heads, None, {}


def _hashes(params, batch, cfg: Config, clip_cfg: ClipConfig, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    if cfg.dchmt.hash_layer == "select":
        hi = select_hash(params["img_head"], img.pooled)
        ht = select_hash(params["txt_head"], txt.pooled)
        return hi, ht
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, cfg, clip_cfg, rng, train=True)
    if cfg.dchmt.hash_layer == "select":
        hi = hi.reshape(hi.shape[0], -1)   # [B, 2K] (hash_train.py:55-57)
        ht = ht.reshape(ht.shape[0], -1)
    loss, metrics = dchmt_loss(hi, ht, batch["label"], cfg.dchmt, cfg.output_dim)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, cfg, clip_cfg)
    if cfg.dchmt.hash_layer == "select":
        return select_code(hi), select_code(ht)
    return sign_codes(hi), sign_codes(ht)


register(Method(name="DCHMT", init=_init, loss=_loss, encode=_encode))
