"""MITH method (MM'23): token-level interaction hashing.

Uses the CLIP "mith" feature mode (all projected tokens + last-layer
attention + extended key-padding mask, model/MITH.py:57-144), the shared-
weight concept-learning hashing model, and epoch-persistent train-code
buffers in aux (train/MITH/hash_train.py:44-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.mith import mith_loss
from ccmh.models.mith import hashing_model, init_hashing_model
from ccmh.ops.packing import sign_codes
from ccmh.ops.similarity import calc_neighbor
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2 = jax.random.split(rng)
    heads = {"hash": init_hashing_model(k1, clip_cfg.embed_dim, cfg.output_dim, cfg.mith)}
    n = cfg.train_num
    keys = jax.random.split(k2, 4)
    aux = {
        "buffers": {
            "img_tokens": jax.random.normal(keys[0], (n, cfg.output_dim)),
            "img_cls": jax.random.normal(keys[1], (n, cfg.output_dim)),
            "txt_tokens": jax.random.normal(keys[2], (n, cfg.output_dim)),
            "txt_cls": jax.random.normal(keys[3], (n, cfg.output_dim)),
        },
        "train_labels": jnp.zeros((n, cfg.nclass)),  # filled by the trainer
    }
    return heads, None, aux


def _forward(params, batch, clip_cfg, cfg, top_k=8):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg, features="mith")
    return hashing_model(
        params["hash"],
        img.tokens_proj[:, 1:, :],     # patch tokens (cls excluded)
        txt.tokens_proj,
        img.pooled,                    # projected cls token
        txt.pooled,                    # EOS token
        txt.key_padding_mask,
        top_k=top_k,
    )


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    out = _forward(params, batch, clip_cfg, cfg, cfg.mith.top_k_label)
    label_sim = calc_neighbor(aux["train_labels"], batch["label"])

    # buffers are updated BEFORE the loss (train/MITH/hash_train.py:72-83):
    # the bayesian terms see the current batch's detached codes in their own
    # buffer rows, not the previous epoch's
    idx = batch["index"]
    sg = jax.lax.stop_gradient
    new_buffers = {
        "img_tokens": aux["buffers"]["img_tokens"].at[idx].set(sg(out.img_tokens_hash)),
        "img_cls": aux["buffers"]["img_cls"].at[idx].set(sg(out.img_cls_hash)),
        "txt_tokens": aux["buffers"]["txt_tokens"].at[idx].set(sg(out.txt_tokens_hash)),
        "txt_cls": aux["buffers"]["txt_cls"].at[idx].set(sg(out.txt_cls_hash)),
    }
    loss, metrics = mith_loss(out, label_sim, new_buffers, cfg.mith, cfg.output_dim)

    new_aux = dict(aux)
    new_aux["buffers"] = new_buffers
    return loss, (new_aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    """sign(tokens_hash + cls_hash) (train/base.py:180-203 get_code_MITH)."""
    out = _forward(params, batch, clip_cfg, cfg, cfg.mith.top_k_label)
    return (sign_codes(out.img_tokens_hash + out.img_cls_hash),
            sign_codes(out.txt_tokens_hash + out.txt_cls_hash))


register(Method(name="MITH", init=_init, loss=_loss, encode=_encode,
                features="mith", needs_mask=True))
