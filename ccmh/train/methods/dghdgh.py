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
           "avg_count": jnp.zeros(()), "epoch": jnp.asarray(-1, jnp.int32)}
    return heads, extra, aux


def _roll_epoch(aux, batch):
    """The reference creates fresh AverageMeters at the top of every
    train_epoch (hash_train.py:69-75) — the J_r / J_gen running means that
    feed back into GeneralPulling and the λ3 schedule reset per epoch.  The
    trainer stamps each batch with its epoch; reset the meters when it
    changes (batches without the stamp — direct step calls in tests/bench —
    keep the cumulative form)."""
    if "epoch" not in batch:
        return aux
    e = jnp.asarray(batch["epoch"], jnp.int32)
    fresh = e != aux["epoch"]
    z = jnp.zeros(())
    return {**aux,
            "j_r_avg": jnp.where(fresh, z, aux["j_r_avg"]),
            "j_gen_avg": jnp.where(fresh, z, aux["j_gen_avg"]),
            "avg_count": jnp.where(fresh, z, aux["avg_count"]),
            "epoch": e}


def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
    img, txt = clip_embeds(params, clip_cfg, batch, cfg)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
    ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
    return hi, ht


def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
    aux = _roll_epoch(aux, batch)
    rng, trip_rng = jax.random.split(rng)
    hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
    loss, metrics = dghdgh_loss(
        trip_rng, hi, ht, batch["label"],
        extra["gnn"], extra["classifier"],
        aux["j_r_avg"], aux["j_gen_avg"], cfg.dghdgh)

    # per-epoch running means (the reference's AverageMeters)
    n = aux["avg_count"] + 1.0
    sg = jax.lax.stop_gradient
    new_aux = {
        **aux,
        "j_r_avg": aux["j_r_avg"] + (sg(metrics["J_r"]) - aux["j_r_avg"]) / n,
        "j_gen_avg": aux["j_gen_avg"] + (sg(metrics["J_gen"]) - aux["j_gen_avg"]) / n,
        "avg_count": n,
    }
    return loss, (new_aux, metrics)


def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
    hi, ht = _hashes(params, batch, clip_cfg, cfg)
    return sign_codes(hi), sign_codes(ht)


def _seq_transforms(cfg: Config):
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
    return gnn_tx, optax.adam(cfg.clip_lr)


def _extra_tx(cfg: Config) -> optax.GradientTransformation:
    gnn_tx, cls_tx = _seq_transforms(cfg)
    if cfg.dghdgh.sequenced:
        # the sequenced custom step applies gnn_tx twice and cls_tx once per
        # batch itself; this transformation only shapes the opt-state pytree
        def init(params):
            return {"gnn": gnn_tx.init(params["gnn"]),
                    "cls": cls_tx.init(params["classifier"])}

        def update(*_a, **_k):
            raise RuntimeError(
                "sequenced DGHDGH applies its extra transforms in the "
                "custom step; the generic update must never run")

        return optax.GradientTransformation(init, update)
    return optax.multi_transform(
        {"gnn": gnn_tx, "classifier": cls_tx},
        param_labels=lambda params: {
            "gnn": jax.tree.map(lambda _: "gnn", params["gnn"]),
            "classifier": jax.tree.map(lambda _: "classifier", params["classifier"]),
        },
    )


def _custom_step(cfg: Config, clip_cfg: ClipConfig, tx, extra_tx):
    """``dghdgh.sequenced``: the reference's EXACT per-batch sequencing
    (hash_train.py:75-130) —

      phase A  J_m = λ1·J_r + λ2·J_gca + λ3·J_syn  → model (BertAdam, after
               the global clip at 2.0 already chained into ``tx``) AND the
               GNN (Adam step #1, clip 1.0);
      phase B  λ4·J_cz on detached embeds          → classifier (Adam);
      phase C  J_gen = λ5·J_ce + λ6·J_sim + λ7·J_div computed against the
               PHASE-A-STEPPED GNN, the PHASE-B-STEPPED classifier and the
               J_r meter INCLUDING this step (hash_train.py:92,125)
                                                   → GNN (Adam step #2).

    The default fused step collapses this into one program (one GNN update,
    pre-step parameters everywhere) — same gradient routing, different
    optimizer dynamics; this mode exists for exact reference parity
    (tests/test_whole_loop.py) and as the faithful formulation."""
    if not cfg.dghdgh.sequenced:
        return None
    import optax as _optax

    from ccmh.losses import dghdgh as D
    from ccmh.ops.similarity import l2_normalize
    from ccmh.train.state import TrainState

    mc = cfg.dghdgh
    gnn_tx, cls_tx = _seq_transforms(cfg)
    sg = jax.lax.stop_gradient

    def step_fn(state, batch):
        rng, step_rng = jax.random.split(state.rng)
        model_rng, trip_rng = jax.random.split(step_rng)
        label = batch["label"]
        aux = _roll_epoch(state.aux, batch)
        j_r_avg0, j_gen_avg0 = aux["j_r_avg"], aux["j_gen_avg"]

        # triplets are mined once in fwd_stage2 and REUSED by fwd_stage1
        # (loss.py:112-114,195-197)
        k1, k2 = jax.random.split(trip_rng)
        ii_tt = D.gen_triplets(k1, label)
        it_ti = D.gen_triplets(k2, label, cross=True)

        # ---------------- phase A: J_m -> model + GNN
        def loss_a(params, gnn_p):
            hi, ht = _hashes(params, batch, clip_cfg, cfg, model_rng, train=True)
            zi, zt = l2_normalize(hi), l2_normalize(ht)
            j_r, j_gca, j_syn = D.stage2_losses(
                zi, zt, label, gnn_p, ii_tt, it_ti, j_r_avg0, mc)
            lam3 = D.adaptive_lambda3(j_gen_avg0, mc.beta)
            j_m = mc.lambda1 * j_r + mc.lambda2 * j_gca + sg(lam3) * j_syn
            return j_m, (zi, zt, j_r, j_gca, j_syn, lam3)

        (j_m, (zi, zt, j_r, j_gca, j_syn, lam3)), (g_p, g_gnn) = \
            jax.value_and_grad(loss_a, argnums=(0, 1), has_aux=True)(
                state.params, state.extra["gnn"])
        updates, opt_state = tx.update(g_p, state.opt_state, state.params)
        params = _optax.apply_updates(state.params, updates)
        up_g, gnn_opt = gnn_tx.update(g_gnn, state.extra_opt_state["gnn"],
                                      state.extra["gnn"])
        gnn = _optax.apply_updates(state.extra["gnn"], up_g)

        zi, zt = sg(zi), sg(zt)
        # J_r meter updates between stage 2 and stage 1 (hash_train.py:92)
        n = aux["avg_count"] + 1.0
        j_r_avg1 = j_r_avg0 + (sg(j_r) - j_r_avg0) / n

        # ---------------- phase B: λ4·J_cz -> classifier
        def loss_b(cls_p):
            return mc.lambda4 * D.classifier_ce(cls_p, zi, zt, label)

        j_cz_w, g_cls = jax.value_and_grad(loss_b)(state.extra["classifier"])
        up_c, cls_opt = cls_tx.update(g_cls, state.extra_opt_state["cls"],
                                      state.extra["classifier"])
        cls_p = _optax.apply_updates(state.extra["classifier"], up_c)

        # ---------------- phase C: J_gen -> GNN (second Adam step)
        def loss_c(gnn_p):
            j_ce, j_sim, j_div = D.stage1_losses(
                zi, zt, label, gnn_p, cls_p, ii_tt, it_ti, j_r_avg1, mc)
            return mc.lambda5 * j_ce + mc.lambda6 * j_sim + mc.lambda7 * j_div

        j_gen, g_gnn2 = jax.value_and_grad(loss_c)(gnn)
        up_g2, gnn_opt = gnn_tx.update(g_gnn2, gnn_opt, gnn)
        gnn = _optax.apply_updates(gnn, up_g2)

        j_gen_avg1 = j_gen_avg0 + (sg(j_gen) - j_gen_avg0) / n
        new_aux = {**aux, "j_r_avg": j_r_avg1, "j_gen_avg": j_gen_avg1,
                   "avg_count": n}
        j_cz = j_cz_w / mc.lambda4 if mc.lambda4 else j_cz_w
        metrics = {"J_r": j_r, "J_gca": j_gca, "J_syn": j_syn, "J_cz": j_cz,
                   "J_gen": j_gen, "lambda3": lam3,
                   "loss": j_m + mc.lambda4 * j_cz + j_gen}
        new_state = TrainState(
            params=params, extra={"gnn": gnn, "classifier": cls_p},
            opt_state=opt_state,
            extra_opt_state={"gnn": gnn_opt, "cls": cls_opt},
            aux=new_aux, step=state.step + 1, rng=rng)
        return new_state, metrics

    return step_fn


register(Method(name="DGHDGH", init=_init, loss=_loss, encode=_encode,
                extra_tx=_extra_tx, grad_clip=2.0, custom_step=_custom_step))
