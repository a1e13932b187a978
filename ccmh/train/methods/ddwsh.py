"""DDWSH method (TMM'26): Baseclip LinearHash heads + margin loss with
distance-weighted mining; trainable per-class beta under head lr
(hash_train.py:41-48 puts criterion.parameters() in the BertAdam groups)."""

from __future__ import annotations

import jax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.ddwsh import ddwsh_loss, init_ddwsh_extra
from ccmh.models.heads import init_linear_hash, linear_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        "loss_heads": init_ddwsh_extra(k3, cfg.nclass, cfg.ddwsh.beta_init),
    }
    return heads, None, {}


def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    rng, mine_rng = jax.random.split(rng)
    hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
    loss, metrics = ddwsh_loss(hi, ht, batch["label"], params["loss_heads"],
                               mine_rng, cfg.ddwsh)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


register(Method(name="DDWSH", init=_init, loss=_loss, encode=_encode))
