"""Training state and generic jitted step builders.

Replaces the reference's mutable-module training loop (train/base.py:117-241
plus each train/<METHOD>/hash_train.py train_epoch) with a functional
TrainState threaded through one fused XLA program per step: CLIP forward x2,
heads, method loss, backward, BertAdam update and any extra-parameter
optimizer all compile into a single program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.train.optim import bert_adam, block_stacked_tree, lr_tree_for


class TrainState(NamedTuple):
    params: Dict[str, Any]          # {"clip": ..., "img_head": ..., "txt_head": ..., ...}
    extra: Optional[Dict[str, Any]]  # loss-side trainables (proxies, label nets, ...)
    opt_state: Any
    extra_opt_state: Any
    aux: Dict[str, Any]             # non-trainable method state (buffers, bn, hessians)
    step: jax.Array
    rng: jax.Array


def make_main_optimizer(cfg: Config, params: Dict[str, Any], steps_per_epoch: int):
    """BertAdam over clip + heads with the reference param groups
    (e.g. train/DSPH/hash_train.py:35-41): clip at clip_lr, rest at lr,
    warmup_cosine over t_total = steps_per_epoch * epochs."""
    lr_map = lr_tree_for(params, cfg.lr, {"clip": cfg.clip_lr})
    return bert_adam(
        lr_map,
        warmup=cfg.warmup_proportion,
        t_total=max(steps_per_epoch * cfg.epochs, 1),
        schedule="warmup_cosine",
        b1=0.9, b2=0.98, eps=1e-6,
        weight_decay=cfg.weight_decay,
        max_grad_norm=1.0,
        # scan-stacked transformer blocks clip per layer, matching the
        # reference's per-parameter-tensor clip (optimization.py:136-140)
        block_stacked=block_stacked_tree(params),
        # opt-in reduced-dtype moment storage (halves optimizer HBM
        # traffic and frees ~600 MB for the 150M-param towers); default
        # float32 keeps exact reference numerics
        moments_dtype=(None if getattr(cfg, "optim_moments_dtype",
                                       "float32") == "float32"
                       else jnp.dtype(cfg.optim_moments_dtype)),
    )


def init_state(
    rng: jax.Array,
    params: Dict[str, Any],
    extra: Optional[Dict[str, Any]],
    aux: Dict[str, Any],
    tx: optax.GradientTransformation,
    extra_tx: Optional[optax.GradientTransformation],
) -> TrainState:
    return TrainState(
        params=params,
        extra=extra,
        opt_state=tx.init(params),
        extra_opt_state=extra_tx.init(extra) if (extra_tx is not None and extra is not None) else None,
        aux=aux,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


LossFn = Callable[..., Tuple[jax.Array, Tuple[Dict[str, Any], Dict[str, jax.Array]]]]


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    extra_tx: Optional[optax.GradientTransformation],
    cfg: Config,
    clip_cfg: ClipConfig,
    jit: bool = True,
    custom_step=None,
):
    """Build the fused train step.

    ``loss_fn(params, extra, aux, batch, rng) -> (loss, (new_aux, metrics))``
    differentiates w.r.t. params and extra jointly; params get BertAdam,
    extra gets the method's own optimizer (mirrors the reference's two
    optimizer.step() calls per batch, e.g. train/DSPH/hash_train.py:66-70).

    ``custom_step`` — a pre-built raw ``(state, batch) -> (state, metrics)``
    replacing the generic body (Method.custom_step already resolved by the
    caller); jit/donation handling is shared.
    """
    if custom_step is not None:
        if not jit:
            return custom_step
        return jax.jit(custom_step, donate_argnums=(0,))

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, step_rng = jax.random.split(state.rng)

        def wrapped(params, extra):
            return loss_fn(params, extra, state.aux, batch, step_rng)

        (loss, (new_aux, metrics)), grads = jax.value_and_grad(
            wrapped, argnums=(0, 1) if state.extra is not None else 0, has_aux=True
        )(state.params, state.extra)

        if state.extra is not None:
            g_params, g_extra = grads
        else:
            g_params, g_extra = grads, None

        updates, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        extra, extra_opt_state = state.extra, state.extra_opt_state
        if extra is not None and extra_tx is not None:
            e_updates, extra_opt_state = extra_tx.update(g_extra, extra_opt_state, extra)
            extra = optax.apply_updates(extra, e_updates)

        metrics = dict(metrics)
        metrics["loss"] = loss
        new_state = TrainState(
            params=params, extra=extra, opt_state=opt_state,
            extra_opt_state=extra_opt_state, aux=new_aux,
            step=state.step + 1, rng=rng,
        )
        return new_state, metrics

    if not jit:
        return step_fn  # caller applies pjit with explicit shardings
    return jax.jit(step_fn, donate_argnums=(0,))
