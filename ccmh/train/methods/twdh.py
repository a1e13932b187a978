"""TwDH method (TOMM'24): two-step discrete hashing with long + derived
short codes (model/TwDH.py:93-171, train/TwDH/hash_train.py).

Heads are ModalityHash modules (1-token attention + norm + 2K softmax
pairs); short codes are re-quantized linear transforms of the long code via
vendored per-dataset trans matrices.  The image head uses BatchNorm
(layernorm=False, model/TwDH.py:119) whose running stats live in aux.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.twdh import load_twdh_assets, twdh_loss
from ccmh.models.heads import (
    init_bn_state, init_modality_hash, modality_hash, pair_code,
    softmax_pair_quantize,
)
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _load_assets(cfg: Config):
    return load_twdh_assets(cfg.dataset, cfg.output_dim, cfg.twdh.center_path)


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2 = jax.random.split(rng)
    heads = {
        "img_head": init_modality_hash(k1, clip_cfg.embed_dim, cfg.output_dim, layernorm=False),
        "txt_head": init_modality_hash(k2, clip_cfg.embed_dim, cfg.output_dim, layernorm=True),
    }
    aux = {"bn": init_bn_state(clip_cfg.embed_dim), "assets": _load_assets(cfg)}
    return heads, None, aux


def _forward(params, aux, batch, clip_cfg, cfg, train=False, mask=None):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    img_long, new_bn = modality_hash(params["img_head"], img.pooled,
                                     train=train, bn_state=aux["bn"],
                                     mask=mask)
    txt_long, _ = modality_hash(params["txt_head"], txt.pooled, train=train)
    assets = aux["assets"]
    img_short = {k: softmax_pair_quantize(img_long @ t) for k, t in assets["trans"].items()}
    txt_short = {k: softmax_pair_quantize(txt_long @ t) for k, t in assets["trans"].items()}
    return img_long, txt_long, img_short, txt_short, new_bn


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    img_long, txt_long, img_short, txt_short, new_bn = _forward(
        params, aux, batch, clip_cfg, cfg, train=True)
    loss, metrics = twdh_loss(
        rng, img_long, txt_long, img_short, txt_short, batch["label"],
        aux["assets"], quan_alpha=0.5, low_rate=cfg.twdh.low_rate)
    new_aux = dict(aux)
    new_aux["bn"] = jax.lax.stop_gradient(new_bn)
    return loss, (new_aux, metrics)


# Reference quirk, reproduced: TwDH's overridden valid() NEVER calls
# change_state("valid") (train/TwDH/hash_train.py:206-217 — only train_epoch
# sets a mode, :56), so the image head's BatchNorm runs in TRAIN mode for
# every get_code — evaluation normalizes with the EVAL BATCH's statistics,
# not the running stats.  The running stats in aux["bn"] are consequently
# dead state upstream (updated, never consumed); ccmh keeps them for .pth
# interchange only.  Whole-loop parity evidence:
# tests/test_whole_loop.py::test_whole_loop_twdh (batch-stats encode matches
# the composed reference loop's codes; running-stats encode diverges ~38%
# on the image side).
def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    # 'valid' masks wrap-padded eval rows out of the BN batch statistics:
    # the reference computes them over a smaller RAGGED final batch, so
    # duplicated pad rows must not pollute the real items' normalization
    img_long, txt_long, _, _, _ = _forward(params, aux, batch, clip_cfg, cfg,
                                           train=True,
                                           mask=batch.get("valid"))
    return pair_code(img_long), pair_code(txt_long)


def _multi_encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig) -> Dict:
    """Long + every short code length (train/TwDH/hash_train.py:179-217)."""
    img_long, txt_long, img_short, txt_short, _ = _forward(
        params, aux, batch, clip_cfg, cfg, train=True,
        mask=batch.get("valid"))
    out = {"long": (pair_code(img_long), pair_code(txt_long))}
    for k in img_short:
        out[f"short{k}"] = (pair_code(img_short[k]), pair_code(txt_short[k]))
    return out


register(Method(name="TwDH", init=_init, loss=_loss, encode=_encode,
                multi_encode=_multi_encode))
