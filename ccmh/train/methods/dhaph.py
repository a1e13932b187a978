"""DHaPH method (TKDE'24): LinearHash heads + self-paced MS loss +
hyperbolic proxy loss.  HPmodel + 500 LCAs train under their own AdamW(1e-5)
(hash_train.py:47-50: two AdamW optimizers; merged into one extra-tree
optimizer here since both use identical hyperparameters)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dhaph import dhaph_loss, init_hp_model, init_lcas
from ccmh.models.heads import init_linear_hash, linear_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
    }
    extra = {
        "hpmodel": init_hp_model(k3, cfg.output_dim, cfg.output_dim),
        "lcas": init_lcas(k4, cfg.dhaph, cfg.output_dim),
    }
    return heads, extra, {}


def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    rng, hp_rng = jax.random.split(rng)
    hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
    epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
    loss, metrics = dhaph_loss(hp_rng, hi, ht, batch["label"], extra, epoch,
                               cfg.dhaph, total_epoch=cfg.epochs)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


def _extra_tx(cfg: Config) -> optax.GradientTransformation:
    return optax.adamw(cfg.dhaph.hp_lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=0.01)


register(Method(name="DHaPH", init=_init, loss=_loss, encode=_encode, extra_tx=_extra_tx))
