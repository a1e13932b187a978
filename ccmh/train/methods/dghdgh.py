"""DGHDGH method (ICLR'26) — reconstructed (the reference snapshot is
unrunnable: missing gnn/graph_generator/gen_triplets modules, SURVEY §2.5).

LinearHash heads over CLIP; GNN + classifier train as extra params under
Adam (hash_train.py uses Adam(lr) for the GNN and Adam(clip_lr) for the
classifier; merged into one labeled optax partition here).  J_r / J_gen
running averages (the reference's AverageMeters that feed back into loss
weights) live in aux.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.losses.dghdgh import dghdgh_loss, init_gnn, init_softmax_classifier
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
    mc = cfg.dghdgh
    extra = {
        "gnn": init_gnn(k3, cfg.output_dim, cfg.nclass, hidden=mc.gnn_hidden,
                        n_layers=mc.n_layers, n_heads=mc.n_heads),
        "classifier": init_softmax_classifier(k4, cfg.output_dim, cfg.nclass),
    }
    aux = {"j_r_avg": jnp.zeros(()), "j_gen_avg": jnp.zeros(()),
           "avg_count": jnp.zeros(())}
    return heads, extra, aux


def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    rng, trip_rng = jax.random.split(rng)
    hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
    loss, metrics = dghdgh_loss(
        trip_rng, hi, ht, batch["label"],
        extra["gnn"], extra["classifier"],
        aux["j_r_avg"], aux["j_gen_avg"], cfg.dghdgh)

    # running means (reference AverageMeter over the epoch; a cumulative
    # mean here — same signal, state-space form)
    n = aux["avg_count"] + 1.0
    sg = jax.lax.stop_gradient
    new_aux = {
        "j_r_avg": aux["j_r_avg"] + (sg(metrics["J_r"]) - aux["j_r_avg"]) / n,
        "j_gen_avg": aux["j_gen_avg"] + (sg(metrics["J_gen"]) - aux["j_gen_avg"]) / n,
        "avg_count": n,
    }
    return loss, (new_aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


def _extra_tx(cfg: Config) -> optax.GradientTransformation:
    def labels(params):
        return {
            "gnn": jax.tree.map(lambda _: "gnn", params["gnn"]),
            "classifier": jax.tree.map(lambda _: "classifier", params["classifier"]),
        }

    # reference optimizer wiring (hash_train.py:58-60,110,129): the GNN
    # trains under Adam(clip_lr, weight_decay) with its grads clipped to
    # global-norm 1.0 (torch Adam's weight_decay is L2-into-the-gradient,
    # hence add_decayed_weights before adam); the classifier under
    # Adam(clip_lr), unclipped, no decay.
    gnn_tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(cfg.clip_lr),
    )
    return optax.multi_transform(
        {"gnn": gnn_tx, "classifier": optax.adam(cfg.clip_lr)},
        param_labels=labels,
    )


register(Method(name="DGHDGH", init=_init, loss=_loss, encode=_encode,
                extra_tx=_extra_tx, grad_clip=2.0))
