"""DScPH method (TMM'25): LinearHash + CPF proxies + Householder rotation.
CPF weights train under the head lr (hash_train.py:40-44); the rotation is
trainable by default (reference bug: never optimized — hash_train.py:37-44
omits ``self.rot`` from every group) so both live in the head param tree
rather than a separately-optimized extra tree.  ``dscph.train_rot=False``
severs the rotation's gradient to reproduce the reference's frozen-rot
dynamics exactly."""

from __future__ import annotations

import jax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dscph import dscph_loss, init_cpf, init_householder
from ccmh.models.heads import init_linear_hash, linear_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        "loss_heads": {
            "cpf": init_cpf(k3, cfg.output_dim, cfg.nclass),
            "rot": init_householder(cfg.output_dim),
        },
    }
    return heads, None, {}


def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
    loss_heads = params["loss_heads"]
    if not cfg.dscph.train_rot:
        loss_heads = {**loss_heads,
                      "rot": jax.tree.map(jax.lax.stop_gradient,
                                          loss_heads["rot"])}
    loss, metrics = dscph_loss(hi, ht, batch["label"], loss_heads, cfg.dscph)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


register(Method(name="DScPH", init=_init, loss=_loss, encode=_encode))
