"""DMsH_LN method (Neurocomputing'24): LinearHash heads + LabelNet +
multi-similarity loss.  LabelNet trains under the same BertAdam at head lr
(train/DMsH_LN/hash_train.py:36-46 puts L_net in the optimizer groups)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dmsh_ln import dmsh_ln_loss, init_label_net
from ccmh.models.heads import init_linear_hash, linear_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        "label_net": init_label_net(k3, cfg.nclass, cfg.output_dim),
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
    epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
    loss, metrics = dmsh_ln_loss(hi, ht, batch["label"], params["label_net"],
                                 epoch, cfg.dmsh_ln)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


register(Method(name="DMsH_LN", init=_init, loss=_loss, encode=_encode))
