"""MITH hashing model (MM'23) — token-level multi-granularity interaction.

Functional re-design of model/MITH.py:249-455 in batch-first layout
(the reference's LND layout is a torch-MHA artefact):

* GlobalConceptLearning — ResidualMLPs + bias-free concept embedding with
  tanh (:296-314); gcl weights are SHARED between modalities (:413-414);
* LocalizedTokenAggregation — per-token top-k concept selection over the
  detached concept logits, masked softmax over the token axis, token->
  concept pooling (:317-376);
* PositionalEncoding — sin-cos / sqrt(d), max_len = k_bits (:249-273);
* a small pre-LN transformer over the K concept tokens (reuses the CLIP
  block/scan machinery — identical architecture, torch-default init);
* BitwiseHashing — K per-bit Linear(d -> 1) + tanh (:276-293).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccmh.clip.model import layer_norm, transformer
from ccmh.config import MITHConfig
from ccmh.ops.similarity import l2_normalize

Params = Dict[str, Any]
NEG_INF = float("-inf")


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _init_torch_linear(key, in_dim, out_dim, bias=True) -> Params:
    """torch nn.Linear default init (kaiming_uniform a=√5 + bias U(±1/√in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound)
    return p


def _init_torch_block(key, width: int) -> Params:
    """Residual attention block with torch-default module inits (the MITH
    concept transformer is built from default-initialized torch modules,
    unlike the CLIP-initialized towers)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xav = math.sqrt(6.0 / (width + 3 * width))
    return {
        "ln_1": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "attn": {
            "qkv_w": _uniform(k1, (width, 3 * width), xav),
            "qkv_b": jnp.zeros((3 * width,)),
            "out_w": _init_torch_linear(k2, width, width)["w"],
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "mlp": {
            "fc_w": _init_torch_linear(k3, width, 4 * width)["w"],
            "fc_b": _uniform(jax.random.fold_in(k3, 1), (4 * width,), 1.0 / math.sqrt(width)),
            "proj_w": _init_torch_linear(k4, 4 * width, width)["w"],
            "proj_b": _uniform(jax.random.fold_in(k4, 1), (width,), 1.0 / math.sqrt(4 * width)),
        },
    }


def sincos_position(max_len: int, d_model: int) -> jnp.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe / math.sqrt(d_model))


# ---------------------------------------------------------------------------
# sub-modules
# ---------------------------------------------------------------------------

def init_residual_mlps(key, dim: int, n_layers: int) -> Params:
    layers = []
    for k in jax.random.split(key, n_layers):
        k1, k2 = jax.random.split(k)
        layers.append({
            "ln": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "fc1": _init_torch_linear(k1, dim, 4 * dim),
            "fc2": _init_torch_linear(k2, 4 * dim, dim),
        })
    return {"layers": layers}


def residual_mlps(p: Params, x: jax.Array, activation: str = "gelu") -> jax.Array:
    # torch nn.GELU is the exact erf form; jax defaults to tanh-approximate
    act = (lambda x: jax.nn.gelu(x, approximate=False)) if activation == "gelu" else jax.nn.relu
    for layer in p["layers"]:
        h = layer_norm(x, layer["ln"]["scale"], layer["ln"]["bias"])
        h = act(h @ layer["fc1"]["w"] + layer["fc1"]["b"])
        x = x + (h @ layer["fc2"]["w"] + layer["fc2"]["b"])
    return x


def init_gcl(key, k_concept: int, dim: int, res_mlp_layers: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "mlp": init_residual_mlps(k1, dim, res_mlp_layers),
        "concept": _init_torch_linear(k2, dim, k_concept, bias=False),
    }


def gcl(p: Params, x: jax.Array, activation: str = "gelu"):
    """GlobalConceptLearning: -> (mlp features, tanh concept logits)."""
    h = residual_mlps(p["mlp"], x, activation)
    return h, jnp.tanh(h @ p["concept"]["w"])


def localized_token_aggregation(
    tokens: jax.Array,              # [B, L, D]
    concept: jax.Array,             # [B, L, K] (detached by caller)
    top_k: int,
    key_padding_mask: Optional[jax.Array] = None,   # [B, L] True = pad
):
    """-> ([B, K, D] merged concept tokens, [B, L, K] pseudo labels)."""
    sim = concept
    if key_padding_mask is not None:
        sim = sim + jnp.where(key_padding_mask, NEG_INF, 0.0)[:, :, None]
    sim = jnp.where(sim > 0, sim, NEG_INF)

    # keep only each token's top-k concepts (model/MITH.py:321-331)
    val = jax.lax.top_k(sim, top_k)[0]                  # [B, L, top_k]
    val_min = val[..., -1][..., None]
    keep = sim >= val_min
    sim = jnp.where(keep, sim, NEG_INF)
    pseudo_label = (sim > 0).astype(tokens.dtype)

    # softmax over the token axis per concept; all -inf columns -> 0
    w = jax.nn.softmax(sim, axis=1)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    merged = jnp.einsum("blk,bld->bkd", w, tokens)
    return merged, pseudo_label


def init_lct(key, dim: int, k_bits: int, n_layers: int) -> Params:
    k1, k2 = jax.random.split(key)
    blocks = [_init_torch_block(k, dim) for k in jax.random.split(k1, n_layers)]
    return {
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "hashing": {
            "w": jnp.stack([
                _init_torch_linear(k, dim, 1)["w"][:, 0]
                for k in jax.random.split(k2, k_bits)
            ]),                                          # [K, D]
            "b": jnp.zeros((k_bits,)),
        },
    }


def lct(
    p: Params, tokens: jax.Array, concept: jax.Array, top_k: int, n_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
):
    """LocalConceptTransforming -> (bit codes [B, K], pseudo, trans tokens)."""
    x, pseudo = localized_token_aggregation(tokens, concept, top_k, key_padding_mask)
    # sinusoidal PE is a CONSTANT (a registered buffer in the reference,
    # model/MITH.py:267 — NOT a parameter): computed here so it can never
    # leak into the optimizer; XLA folds it at compile time.
    x = x + sincos_position(x.shape[1], x.shape[2])[None, :, :]
    x, _ = transformer(x, p["blocks"], n_heads)
    bits = jnp.einsum("bkd,kd->bk", x, p["hashing"]["w"]) + p["hashing"]["b"]
    return jnp.tanh(bits), pseudo, x


# ---------------------------------------------------------------------------
# full hashing model
# ---------------------------------------------------------------------------

class MithOutputs(NamedTuple):
    img_cls_hash: jax.Array
    txt_cls_hash: jax.Array
    res_img_cls: jax.Array
    res_txt_cls: jax.Array
    img_tokens_hash: jax.Array
    txt_tokens_hash: jax.Array
    trans_tokens_i: jax.Array
    trans_tokens_t: jax.Array


def init_hashing_model(key, dim: int, k_bits: int, mcfg: MITHConfig) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "gcl": init_gcl(k1, k_bits, dim, mcfg.res_mlp_layers),  # shared i/t
        "lct_i": init_lct(k2, dim, k_bits, mcfg.transformer_layers),
        "lct_t": init_lct(k3, dim, k_bits, mcfg.transformer_layers),
        "img_concept_proj": _init_torch_linear(k4, dim, dim),
        "txt_concept_proj": _init_torch_linear(k5, dim, dim),
    }


def hashing_model(
    p: Params,
    img_tokens: jax.Array,   # [B, P, D] projected patch tokens
    txt_tokens: jax.Array,   # [B, L, D] projected text tokens
    img_cls: jax.Array,      # [B, D]
    txt_eos: jax.Array,      # [B, D]
    key_padding_mask: jax.Array,
    top_k: int = 8,
) -> MithOutputs:
    n_heads = img_tokens.shape[-1] // 64

    res_img_cls, img_cls_hash = gcl(p["gcl"], img_cls)
    res_txt_cls, txt_cls_hash = gcl(p["gcl"], txt_eos)

    concept_i = jax.lax.stop_gradient(gcl(p["gcl"], img_tokens)[1])
    concept_t = jax.lax.stop_gradient(gcl(p["gcl"], txt_tokens)[1])

    tokens_hash_i, _, trans_i = lct(p["lct_i"], img_tokens, concept_i,
                                    top_k=top_k, n_heads=n_heads)
    tokens_hash_t, _, trans_t = lct(p["lct_t"], txt_tokens, concept_t,
                                    top_k=top_k, n_heads=n_heads,
                                    key_padding_mask=key_padding_mask)

    return MithOutputs(
        img_cls_hash=img_cls_hash,
        txt_cls_hash=txt_cls_hash,
        res_img_cls=l2_normalize(res_img_cls),
        res_txt_cls=l2_normalize(res_txt_cls),
        img_tokens_hash=tokens_hash_i,
        txt_tokens_hash=tokens_hash_t,
        trans_tokens_i=l2_normalize(trans_i @ p["img_concept_proj"]["w"] + p["img_concept_proj"]["b"]),
        trans_tokens_t=l2_normalize(trans_t @ p["txt_concept_proj"]["w"] + p["txt_concept_proj"]["b"]),
    )
