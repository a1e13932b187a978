"""BertAdam-equivalent optimizer as an optax transformation.

Exact step-level reproduction of the reference optimizer
(model/base/optimization.py:26-168), which differs from stock Adam/AdamW in
ways that measurably shift final mAP (SURVEY §7 "hard parts"):

* **no bias correction** on either moment;
* **per-parameter-tensor gradient clipping** (each tensor clipped to
  max_grad_norm independently — *not* global-norm clipping);
* decoupled weight decay added to the *update* (update += wd * p) before
  the lr scaling;
* schedule multiplier evaluated at progress = step / t_total with
  ``warmup_cosine | warmup_constant | warmup_linear`` — the first step runs
  at progress 0 => lr 0 for warmup schedules, matching the reference's
  post-increment step counter;
* per-parameter-group learning rates (CLIP backbone at clip_lr, hashing
  heads at lr) — expressed here as a pytree of per-leaf lr multipliers.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jax.Array], jax.Array]


def warmup_cosine(progress: jax.Array, warmup: float) -> jax.Array:
    return jnp.where(
        progress < warmup,
        progress / warmup,
        0.5 * (1.0 + jnp.cos(math.pi * progress)),
    )


def warmup_constant(progress: jax.Array, warmup: float) -> jax.Array:
    return jnp.where(progress < warmup, progress / warmup, 1.0)


def warmup_linear(progress: jax.Array, warmup: float) -> jax.Array:
    return jnp.where(
        progress < warmup,
        progress / warmup,
        jnp.maximum((progress - 1.0) / (warmup - 1.0), 0.0),
    )


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


class BertAdamState(NamedTuple):
    step: jax.Array
    m: Any
    v: Any


def bert_adam(
    lr: Union[float, Any],
    *,
    warmup: float = -1.0,
    t_total: int = -1,
    schedule: str = "warmup_cosine",
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
    block_stacked: Optional[Any] = None,
    moments_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Build the transform.

    ``lr`` is either a scalar (single group) or a pytree matching the params
    (per-leaf base learning rate — the param-group mechanism).  Typical use:
    clip-backbone leaves at 1e-5, head leaves at 1e-3, mirroring
    train/DSPH/hash_train.py:35-41.

    ``block_stacked`` is an optional pytree of bools congruent to the
    params: True marks leaves whose axis 0 stacks what the reference holds
    as SEPARATE per-layer tensors (the lax.scan transformer blocks).  The
    per-parameter-tensor grad clip must then apply per axis-0 slice — a
    whole-leaf norm would couple the layers and diverge from the reference
    trajectory whenever any layer's gradient exceeds max_grad_norm.

    ``moments_dtype`` (e.g. ``jnp.bfloat16``) stores the m/v moments in a
    reduced dtype — a DELIBERATE deviation from the reference (which keeps
    fp32 moments), opt-in via ``--set optim_moments_dtype=bfloat16``: the
    moment update math still runs in fp32 (cast up, accumulate, cast
    down), but storage and the optimizer's HBM traffic halve (~600 MB
    less device memory for the ViT-B/32 towers' 150M params).  None keeps
    exact reference numerics.
    """
    if schedule not in SCHEDULES:
        raise ValueError(f"unknown schedule {schedule!r}")
    sched_fn = SCHEDULES[schedule]

    def moment_zeros(params):
        if moments_dtype is None:
            return jax.tree.map(jnp.zeros_like, params)
        return jax.tree.map(
            lambda p: jnp.zeros(p.shape, moments_dtype), params)

    def init(params):
        return BertAdamState(step=jnp.zeros((), jnp.int32),
                             m=moment_zeros(params), v=moment_zeros(params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("bert_adam requires params")

        if max_grad_norm > 0:
            def clip_leaf(g, blocked=False):
                if blocked and g.ndim >= 1:
                    axes = tuple(range(1, g.ndim))
                    norm = jnp.sqrt(jnp.sum(g * g, axis=axes, keepdims=True))
                else:
                    norm = jnp.linalg.norm(g.ravel())
                scale = jnp.minimum(1.0, max_grad_norm / (norm + 1e-6))
                return g * scale
            if block_stacked is None:
                grads = jax.tree.map(clip_leaf, grads)
            else:
                grads = jax.tree.map(clip_leaf, grads, block_stacked)

        # accumulate in fp32 even for reduced-dtype storage: bf16's 8-bit
        # mantissa would swallow (1-b2)=0.02-scale v increments entirely
        up = (lambda x: x) if moments_dtype is None else (
            lambda x: x.astype(jnp.float32))
        down = (lambda x: x) if moments_dtype is None else (
            lambda x: x.astype(moments_dtype))
        m = jax.tree.map(
            lambda mu, g: down(b1 * up(mu) + (1 - b1) * g), state.m, grads)
        v = jax.tree.map(
            lambda nu, g: down(b2 * up(nu) + (1 - b2) * g * g), state.v, grads)

        if t_total > 0:
            progress = state.step.astype(jnp.float32) / t_total
            lr_scale = sched_fn(progress, warmup)
        else:
            lr_scale = jnp.ones((), jnp.float32)

        if isinstance(lr, (int, float)):
            lr_tree = jax.tree.map(lambda _: lr, params)
        else:
            lr_tree = lr  # pytree of per-leaf base learning rates

        def leaf_update(mu, nu, p, base_lr):
            upd = up(mu) / (jnp.sqrt(up(nu)) + eps)
            if weight_decay > 0:
                upd = upd + weight_decay * p
            return -(base_lr * lr_scale) * upd

        updates = jax.tree.map(leaf_update, m, v, params, lr_tree)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


def block_stacked_tree(params: Any) -> Any:
    """Pytree of bools marking scan-stacked transformer-block leaves.

    Converted CLIP params stack the per-layer block weights along axis 0
    under a ``blocks`` key (clip/convert.py _convert_blocks); those are the
    leaves whose reference counterparts are per-layer tensors."""
    def mark(path, leaf):
        return any(getattr(k, "key", None) == "blocks" for k in path)

    return jax.tree_util.tree_map_with_path(mark, params)


def lr_tree_for(params: Any, default_lr: float, overrides: dict) -> Any:
    """Per-leaf lr pytree: top-level keys in ``overrides`` get their own lr.

    ``params`` is the usual ccmh param dict, e.g.
    ``{"clip": ..., "img_head": ..., "txt_head": ...}``;
    ``lr_tree_for(params, 1e-3, {"clip": 1e-5})`` reproduces the reference
    param groups.
    """
    return {
        key: jax.tree.map(lambda _: overrides.get(key, default_lr), sub)
        for key, sub in params.items()
    }
