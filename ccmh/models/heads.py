"""Per-method hashing heads as functional JAX modules.

Each head is (init_fn, apply_fn) over a plain param dict.  Heads project the
512-d CLIP embedding to a K-bit relaxed code; binarization semantics differ
per method and live in ccmh.train.methods.

Reference anchors:
  LinearHash      — model/modelbase.py:25-35 (Linear + Dropout(0.2) + tanh)
  SelectHash      — model/DCHMT.py:8-28 (fc->128, relu, K x Linear(128,2),
                    softmax pairs; the "select" mechanism)
  PreLayer        — model/DNPH_TOMM.py:7-14 (label-logit predictor)
  ModalityHash    — model/TwDH.py:60-90 (1-token MHA + norm + fc -> 2K,
                    relu, softmax pairs)
  L2NormHash      — model/DPBE.py:23-25 (Linear + L2 normalize, no tanh)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ccmh.clip.model import layer_norm

Params = Dict[str, Any]


def _kaiming_uniform_fan_out(key, in_dim: int, out_dim: int) -> jax.Array:
    """weights_init_kaiming (model/modelbase.py:11-14): kaiming_uniform with
    mode='fan_out', gain sqrt(2) => U(-sqrt(6/out), sqrt(6/out)).  Stored
    [in, out] (JAX convention: y = x @ w + b)."""
    bound = math.sqrt(6.0 / out_dim)
    return jax.random.uniform(key, (in_dim, out_dim), minval=-bound, maxval=bound)


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# LinearHash (shared by DSPH/DNpH/DHaPH/DMsH_LN/DScPH/DDWSH/DDBH/DNPH/DPSIH)
# ---------------------------------------------------------------------------

def init_linear_hash(key, in_dim: int, out_dim: int) -> Params:
    return {
        "w": _kaiming_uniform_fan_out(key, in_dim, out_dim),
        "b": jnp.zeros((out_dim,)),
    }


def linear_hash(p: Params, x: jax.Array, *, train: bool = False,
                rng: Optional[jax.Array] = None, drop_rate: float = 0.2) -> jax.Array:
    """tanh(dropout(x @ w + b)) — dropout precedes tanh as in the reference."""
    h = x @ p["w"] + p["b"]
    return jnp.tanh(_dropout(h, drop_rate, rng, train))


# ---------------------------------------------------------------------------
# DCHMT select hash
# ---------------------------------------------------------------------------

SELECT_EMBED = 128  # model/DCHMT.py:10 LINEAR_EMBED


def init_select_hash(key, in_dim: int, out_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    # K independent Linear(128 -> 2) == one Linear(128 -> 2K) on a
    # reshaped output; keep the fused form for one MXU matmul.
    return {
        "fc_w": _kaiming_uniform_fan_out(k1, in_dim, SELECT_EMBED),
        "fc_b": jnp.zeros((SELECT_EMBED,)),
        "pairs_w": _kaiming_uniform_fan_out(k2, SELECT_EMBED, 2 * out_dim).reshape(SELECT_EMBED, out_dim, 2),
        "pairs_b": jnp.zeros((out_dim, 2)),
    }


def select_hash(p: Params, x: jax.Array) -> jax.Array:
    """-> [B, K, 2] softmax pair distributions ("select" mechanism)."""
    h = jax.nn.relu(x @ p["fc_w"] + p["fc_b"])
    logits = jnp.einsum("be,ekt->bkt", h, p["pairs_w"]) + p["pairs_b"]
    return jax.nn.softmax(logits, axis=-1)


def select_hash_flat(p: Params, x: jax.Array) -> jax.Array:
    """-> [B, 2K] concatenated pairs (loss-side view, DCHMT hash_train.py:55-57)."""
    pairs = select_hash(p, x)
    return pairs.reshape(pairs.shape[0], -1)


def select_code(pairs: jax.Array) -> jax.Array:
    """[B, K, 2] -> ±1 codes: argmax per pair, 0 -> -1
    (train/base.py:150-158 make_hash_code_DCHMT)."""
    idx = jnp.argmax(pairs, axis=-1)
    return (2 * idx - 1).astype(jnp.int8)


# ---------------------------------------------------------------------------
# DNPH pre-layer (label-logit predictor)
# ---------------------------------------------------------------------------

def init_pre_layer(key, in_dim: int, n_class: int) -> Params:
    # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, n_class), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (n_class,), minval=-bound, maxval=bound),
    }


def pre_layer(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


# ---------------------------------------------------------------------------
# TwDH modality hash
# ---------------------------------------------------------------------------

def init_modality_hash(key, in_dim: int, out_dim: int, layernorm: bool) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(in_dim)
    p: Params = {
        # nn.MultiheadAttention over a single token: softmax over one key is
        # the identity, so attention reduces to out_proj(v_proj(x)).  The q/k
        # projections still exist in the torch module but cannot influence
        # the output; we keep only the value path (exact same function).
        "v_w": jax.random.uniform(k1, (in_dim, in_dim), minval=-bound, maxval=bound),
        "v_b": jnp.zeros((in_dim,)),
        "out_w": jax.random.uniform(k2, (in_dim, in_dim), minval=-bound, maxval=bound),
        "out_b": jnp.zeros((in_dim,)),
        "fc2_w": _kaiming_uniform_fan_out(k3, in_dim, out_dim * 2),
        "fc2_b": jnp.zeros((out_dim * 2,)),
    }
    if layernorm:
        p["ln"] = {"scale": jnp.ones((in_dim,)), "bias": jnp.zeros((in_dim,))}
    else:
        p["bn"] = {"scale": jnp.ones((in_dim,)), "bias": jnp.zeros((in_dim,))}
    return p


def init_bn_state(in_dim: int) -> Params:
    return {"mean": jnp.zeros((in_dim,)), "var": jnp.ones((in_dim,)),
            "count": jnp.zeros((), jnp.int32)}


def modality_hash(
    p: Params, x: jax.Array, *, train: bool = False,
    bn_state: Optional[Params] = None, momentum: float = 0.1,
    mask: Optional[jax.Array] = None,
):
    """[B, D] -> ([B, 2K] softmax-pair code, new_bn_state).

    Returns the flattened softmax-pair representation (model/TwDH.py:9-21
    softmax_hash with return_vector=True).

    ``mask`` ([B] bool): restrict the train-mode BatchNorm statistics to
    the flagged rows.  Eval loaders wrap-pad the final partial batch to a
    fixed compile shape (data/dataset.py), but the reference's DataLoader
    yields a smaller ragged batch there — without the mask, TwDH's
    batch-statistics eval (see train/methods/twdh.py) would normalize
    real items with statistics polluted by the duplicated pad rows.
    """
    h = x @ p["v_w"] + p["v_b"]
    h = h @ p["out_w"] + p["out_b"]
    new_state = bn_state
    if "ln" in p:
        h = layer_norm(h, p["ln"]["scale"], p["ln"]["bias"])
    else:
        if train:
            if mask is not None:
                m = mask.astype(h.dtype)[:, None]                # [B, 1]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(h * m, axis=0) / n
                var = jnp.sum(m * (h - mean) ** 2, axis=0) / n
            else:
                n = float(h.shape[0])
                mean = jnp.mean(h, axis=0)
                var = jnp.var(h, axis=0)
            if bn_state is not None:
                unbiased = var * n / jnp.maximum(n - 1, 1)
                new_state = {
                    "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
                    "var": (1 - momentum) * bn_state["var"] + momentum * unbiased,
                    "count": bn_state["count"] + 1,
                }
        else:
            mean = bn_state["mean"] if bn_state is not None else jnp.zeros(h.shape[-1])
            var = bn_state["var"] if bn_state is not None else jnp.ones(h.shape[-1])
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * p["bn"]["scale"] + p["bn"]["bias"]
    h = jax.nn.relu(h @ p["fc2_w"] + p["fc2_b"])
    pairs = jax.nn.softmax(h.reshape(h.shape[0], -1, 2), axis=-1)
    return pairs.reshape(h.shape[0], -1), new_state


def softmax_pair_quantize(code_flat: jax.Array) -> jax.Array:
    """[B, 2K] (or [B, K, 2]) continuous -> re-softmaxed pairs, flattened
    (model/TwDH.py:9-21 applied to long_hash @ trans)."""
    b = code_flat.shape[0]
    pairs = code_flat.reshape(b, -1, 2)
    return jax.nn.softmax(pairs, axis=-1).reshape(b, -1)


def pair_code(code_flat: jax.Array) -> jax.Array:
    """[B, 2K] softmax pairs -> [B, K] ±1 (train/TwDH/hash_train.py:165-177)."""
    b = code_flat.shape[0]
    pairs = code_flat.reshape(b, -1, 2)
    return (2 * jnp.argmax(pairs, axis=-1) - 1).astype(jnp.int8)


# ---------------------------------------------------------------------------
# DPBE L2-normalized linear head
# ---------------------------------------------------------------------------

def init_l2norm_hash(key, in_dim: int, out_dim: int) -> Params:
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def l2norm_hash(p: Params, x: jax.Array) -> jax.Array:
    h = x @ p["w"] + p["b"]
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
