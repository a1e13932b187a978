"""DSPH method (TCSVT'23): LinearHash heads + HyP proxy loss with its own
SGD proxy optimizer (train/DSPH/hash_train.py:25-46)."""

from __future__ import annotations

import jax
import optax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dsph import codetable_threshold, hyp_loss, init_proxies
from ccmh.models.heads import init_linear_hash, linear_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng: jax.Array, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
    }
    extra = {"proxies": init_proxies(
        jax.random.fold_in(k3, cfg.dsph.hypseed), cfg.nclass, cfg.output_dim)}
    return heads, extra, {}


def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
    threshold = codetable_threshold(cfg.output_dim, cfg.nclass)
    loss, metrics = hyp_loss(hi, ht, batch["label"], extra["proxies"],
                             threshold, cfg.dsph.alpha)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


def _extra_tx(cfg: Config) -> optax.GradientTransformation:
    """SGD(lr=0.02, momentum=0.9, wd=5e-4) for proxies
    (train/DSPH/hash_train.py:44); decay applied to the gradient before the
    momentum trace, matching torch SGD."""
    return optax.chain(
        optax.add_decayed_weights(cfg.dsph.proxy_weight_decay),
        optax.trace(decay=cfg.dsph.proxy_momentum, nesterov=False),
        optax.scale(-cfg.dsph.proxy_lr),
    )


register(Method(name="DSPH", init=_init, loss=_loss, encode=_encode, extra_tx=_extra_tx))
