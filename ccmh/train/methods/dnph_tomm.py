"""DNPH method (TOMM'24): LinearHash + per-modality label predictors +
proxy loss + Hungarian-matched noise regularizer.  Proxies get their own
plain SGD(1e-4) (hash_train.py:48).

Recorded upstream bug, repair gated: the reference constructs that proxy
SGD but never calls its step() anywhere (hash_train.py:48 is its only
mention), so its proxies never actually move.  By default ccmh reproduces
that no-step behavior (so imported reference .pth checkpoints continue on
reference-faithful dynamics); ``--set dnph.step_proxies=true`` opts into
the clearly-intended repair of stepping the SGD.  The trajectory golden
pins the default against the real reference trainer
(tests/test_trajectory.py test_dnph_trajectory)."""

from __future__ import annotations

import jax
import optax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dnph_tomm import (
    dnph_proxy_loss, init_dnph_proxies, noise_regularizer,
)
from ccmh.models.heads import init_linear_hash, init_pre_layer, linear_hash, pre_layer
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        "img_pre": init_pre_layer(k3, clip_cfg.embed_dim, cfg.nclass),
        "txt_pre": init_pre_layer(k4, clip_cfg.embed_dim, cfg.nclass),
    }
    extra = init_dnph_proxies(k5, cfg.nclass, cfg.output_dim)
    return heads, extra, {}


def _forward(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    pi = pre_layer(params["img_pre"], img.pooled)
    pt = pre_layer(params["txt_pre"], txt.pooled)
    return hi, ht, pi, pt


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    rng, noise_rng = jax.random.split(rng)
    hi, ht, pi, pt = _forward(params, batch, clip_cfg, cfg, rng, train=True)
    label = batch["label"]
    proxy = dnph_proxy_loss(hi, ht, pi, pt, label, label, extra["proxies"])
    noise = noise_regularizer(noise_rng, hi, ht)
    loss = proxy - cfg.dnph.noise_weight * noise
    return loss, (aux, {"proxy": proxy, "noise": noise})


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht, _, _ = _forward(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


def _extra_tx(cfg: Config) -> optax.GradientTransformation:
    if cfg.dnph.step_proxies:
        return optax.sgd(cfg.dnph.proxy_lr)
    # reference-faithful: the SGD exists but its step() is never called
    # (train/DNPH_TOMM/hash_train.py:48) — proxies stay at init
    return optax.set_to_zero()


register(Method(name="DNPH", init=_init, loss=_loss, encode=_encode, extra_tx=_extra_tx))
