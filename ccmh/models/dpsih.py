"""DPSIH DSIE module (AAAI'26) — token-sequence semantic information
extraction producing multi-embed codes.

Re-expression of model/DPSIH.py:13-63 in batch-first jnp:
MultiHeadSelfAttention = w2(tanh(w1(x))) attention logits over tokens,
softmax over the token axis, E pooled token summaries; DSIE adds a
sigmoid-fc residual to the (broadcast) hash code and LayerNorms, yielding
[B, E, K] embeddings (E = num_embeds).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ccmh.clip.model import layer_norm

Params = Dict[str, Any]


def _xavier(key, shape):
    bound = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_dsie(key, n_embeds: int, d_in: int, d_out: int, d_h: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": _xavier(k1, (d_in, d_h)),
        "w2": _xavier(k2, (d_h, n_embeds)),
        "fc": {"w": _xavier(k3, (d_in, d_out)), "b": jnp.zeros((d_out,))},
        "ln": {"scale": jnp.ones((d_out,)), "bias": jnp.zeros((d_out,))},
    }


def dsie(
    p: Params, out: jax.Array, x: jax.Array,
    pad_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """out: [B, K] hash code, x: [B, L, D] token states ->
    ([B, E, K] embeddings, [B, L, E] attention, [B, E, K] residual)."""
    attn = jnp.tanh(x @ p["w1"]) @ p["w2"]                 # [B, L, E]
    if pad_mask is not None:
        attn = jnp.where(pad_mask[:, :, None], -jnp.inf, attn)
    attn = jax.nn.softmax(attn, axis=1)
    pooled = jnp.einsum("ble,bld->bed", attn, x)           # [B, E, D]
    residual = jax.nn.sigmoid(pooled @ p["fc"]["w"] + p["fc"]["b"])  # [B, E, K]
    n_embeds = residual.shape[1]
    out_b = jnp.broadcast_to(out[:, None, :], residual.shape) if n_embeds > 1 else out[:, None, :]
    merged = layer_norm(out_b + residual, p["ln"]["scale"], p["ln"]["bias"])
    return merged, attn, residual


def l2norm(x: jax.Array) -> jax.Array:
    """model/DPSIH.py:8-10 (no epsilon, like the reference)."""
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
