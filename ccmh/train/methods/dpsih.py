"""DPSIH method (AAAI'26): LinearHash + DSIE multi-embed codes + MSC loss.

The reference model requires a patched CLIP exposing token sequences
(model/DPSIH.py:88-101, absent upstream — the build's "tokens" feature mode
provides it: image tokens at vision width, text tokens at transformer
width).  Codes are [B, E, K] multi-embeddings; ranking for eval uses the
max-over-embed-pairs similarity (train/DPSIH/_utils.py:5-31), expressed as
a custom dist_fn for the shared mAP machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dpsih import dpsih_loss
from ccmh.models.dpsih import dsie, init_dsie, l2norm
from ccmh.models.heads import init_linear_hash, linear_hash
from ccmh.ops.packing import sign_codes
from ccmh.train.methods import register
from ccmh.train.methods.base import Method, clip_embeds

NUM_EMBEDS = 4  # train/DPSIH/get_args.py:16


def _init(rng, cfg: Config, clip_cfg: ClipConfig):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    d_img, d_txt = clip_cfg.vision_width, clip_cfg.transformer_width
    heads = {
        "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
        "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        "dsie_i": init_dsie(k3, NUM_EMBEDS, d_img, cfg.output_dim, d_img // 2),
        "dsie_t": init_dsie(k4, NUM_EMBEDS, d_txt, cfg.output_dim, d_txt // 2),
    }
    return heads, None, {}


def _forward(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg, features="tokens")
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    embed_i, _, resi_i = dsie(params["dsie_i"], hi, img.tokens_pre)
    embed_t, _, resi_t = dsie(params["dsie_t"], ht, txt.tokens_pre)
    return l2norm(embed_i), l2norm(embed_t), resi_i, resi_t


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    ei, et, ri, rt = _forward(params, batch, clip_cfg, cfg, rng, train=True)
    loss, metrics = dpsih_loss(ei, et, ri, rt, batch["label"], cfg.dpsih,
                               num_embeds=NUM_EMBEDS)
    return loss, (aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    """±1 multi-embed codes flattened to [B, E*K] (dist_fn un-flattens)."""
    ei, et, _, _ = _forward(params, batch, clip_cfg, cfg)
    b = ei.shape[0]
    return (sign_codes(ei).reshape(b, -1), sign_codes(et).reshape(b, -1))


def make_dist_fn(output_dim: int):
    """Pseudo-Hamming distance from the best embed pair
    (train/DPSIH/_utils.py:16-26): d = (K - max_{e,f} q_e · r_f) / 2."""

    def dist(q_flat: jax.Array, r_flat: jax.Array) -> jax.Array:
        qc = q_flat.reshape(q_flat.shape[0], -1, output_dim)
        rc = r_flat.reshape(r_flat.shape[0], -1, output_dim)
        sim = jnp.einsum("aek,bfk->abef", qc.astype(jnp.float32), rc.astype(jnp.float32))
        best = jnp.max(sim, axis=(2, 3))
        return ((output_dim - best) / 2).astype(jnp.int32)

    return dist


def _dist_fn(cfg: Config):
    return make_dist_fn(cfg.output_dim)


register(Method(name="DPSIH", init=_init, loss=_loss, encode=_encode,
                features="tokens", dist_fn=_dist_fn, grad_clip=2.0))
