"""ModifiedResNet CLIP vision tower (RN50-family checkpoints).

TPU-native re-expression of the reference ModifiedResNet
(model/base/model.py:10-150): 3-conv stem with avgpool, anti-aliased
strided bottlenecks (avgpool before the strided conv), and QKV attention
pooling instead of global average pooling.

Design notes (not a translation):

* NHWC activations + HWIO kernels — XLA's native TPU conv layout; the
  MXU executes the convs directly.
* functional param pytree like the ViT tower; BatchNorm runs in
  *inference* mode against the checkpoint's running statistics.  The
  reference fine-tunes CLIP without ever calling ``model.eval()`` so its
  BN uses batch statistics during training; frozen-BN fine-tuning is the
  standard practice for small-LR backbone tuning and is the documented
  deviation here (no method in the suite ships an RN checkpoint — every
  trainer loads ViT-B-32, argsbase.py:16).
* attention pooling computes only the query row that is actually used
  (the mean token, reference model/base/model.py:92: ``return x[0]``)
  instead of full [L, L] attention.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_BN_EPS = 1e-5


def _conv(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x: jax.Array, p: Params) -> jax.Array:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + _BN_EPS)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
            ).astype(x.dtype)
    return x * scale + bias


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    if k <= 1:
        return x
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID")
    return summed / float(k * k)


def _bottleneck(x: jax.Array, p: Params, stride: int) -> jax.Array:
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = _bn(_conv(_avg_pool(x, stride), p["downsample"]["conv"]),
                       p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attn_pool(x: jax.Array, p: Params, n_head: int) -> jax.Array:
    """[B, H, W, C] -> [B, out_dim] via mean-query attention
    (model/base/model.py:57-92)."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    tokens = jnp.concatenate([jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1)
    tokens = tokens + p["positional_embedding"].astype(x.dtype)

    head_dim = C // n_head
    q = tokens[:, :1] @ p["q_w"] + p["q_b"]                  # only the mean row
    k = tokens @ p["k_w"] + p["k_b"]
    v = tokens @ p["v_w"] + p["v_b"]
    sh = lambda t: t.reshape(B, -1, n_head, head_dim).transpose(0, 2, 1, 3)
    q, k, v = sh(q), sh(k), sh(v)                            # [B, h, {1|L}, d]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(head_dim))
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, C)
    out = ctx @ p["c_w"] + p["c_b"]
    return out[:, 0]


def resnet_forward(p: Params, cfg, images: jax.Array, *,
                   dtype=jnp.float32) -> jax.Array:
    """ModifiedResNet forward: NHWC [B, R, R, 3] -> [B, embed_dim]."""
    x = images.astype(dtype)
    cast = lambda t: jax.tree.map(lambda a: a.astype(dtype), t)
    stem = cast(p["stem"])
    for i in (1, 2, 3):
        x = jax.nn.relu(_bn(_conv(x, stem[f"conv{i}"],
                                  stride=2 if i == 1 else 1, padding=1),
                            stem[f"bn{i}"]))
    x = _avg_pool(x, 2)
    for li, n_blocks in enumerate(cfg.vision_layers, start=1):
        layer = cast(p[f"layer{li}"])
        for bi in range(n_blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _bottleneck(x, layer[str(bi)], stride)
    n_head = (cfg.vision_width * 32) // 64
    return _attn_pool(x, cast(p["attnpool"]), n_head)


# ---------------------------------------------------------------------------
# torch state_dict conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_w(sd, key) -> jnp.ndarray:
    # torch OIHW -> HWIO
    return jnp.asarray(_np(sd[key]).transpose(2, 3, 1, 0))


def _bn_p(sd, prefix) -> Params:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }


def convert_resnet_visual(sd: Dict[str, Any],
                          vision_layers: Sequence[int]) -> Params:
    """``visual.*`` entries of an RN-family CLIP state_dict -> param tree."""
    v: Params = {"stem": {}}
    for i in (1, 2, 3):
        v["stem"][f"conv{i}"] = _conv_w(sd, f"visual.conv{i}.weight")
        v["stem"][f"bn{i}"] = _bn_p(sd, f"visual.bn{i}")
    for li, n_blocks in enumerate(vision_layers, start=1):
        layer: Params = {}
        for bi in range(n_blocks):
            pre = f"visual.layer{li}.{bi}"
            blk: Params = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = _conv_w(sd, f"{pre}.conv{ci}.weight")
                blk[f"bn{ci}"] = _bn_p(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv_w(sd, f"{pre}.downsample.0.weight"),
                    "bn": _bn_p(sd, f"{pre}.downsample.1"),
                }
            layer[str(bi)] = blk
        v[f"layer{li}"] = layer
    v["attnpool"] = {
        "positional_embedding": jnp.asarray(_np(sd["visual.attnpool.positional_embedding"])),
        "q_w": jnp.asarray(_np(sd["visual.attnpool.q_proj.weight"]).T),
        "q_b": jnp.asarray(_np(sd["visual.attnpool.q_proj.bias"])),
        "k_w": jnp.asarray(_np(sd["visual.attnpool.k_proj.weight"]).T),
        "k_b": jnp.asarray(_np(sd["visual.attnpool.k_proj.bias"])),
        "v_w": jnp.asarray(_np(sd["visual.attnpool.v_proj.weight"]).T),
        "v_b": jnp.asarray(_np(sd["visual.attnpool.v_proj.bias"])),
        "c_w": jnp.asarray(_np(sd["visual.attnpool.c_proj.weight"]).T),
        "c_b": jnp.asarray(_np(sd["visual.attnpool.c_proj.bias"])),
    }
    return v


# ---------------------------------------------------------------------------
# from-scratch init (distributional parity with model/base/model.py:315-325
# + torch Conv2d/Linear defaults)
# ---------------------------------------------------------------------------

def _kaiming_conv(key, h, w, cin, cout):
    fan_in = h * w * cin
    bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))   # kaiming_uniform(a=sqrt(5))
    return jax.random.uniform(key, (h, w, cin, cout), minval=-bound, maxval=bound)


def _bn_init(c, zero_scale=False):
    return {
        "scale": jnp.zeros((c,)) if zero_scale else jnp.ones((c,)),
        "bias": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def init_resnet_visual(key: jax.Array, cfg) -> Params:
    width = cfg.vision_width
    keys = iter(jax.random.split(key, 256))
    v: Params = {"stem": {
        "conv1": _kaiming_conv(next(keys), 3, 3, 3, width // 2),
        "bn1": _bn_init(width // 2),
        "conv2": _kaiming_conv(next(keys), 3, 3, width // 2, width // 2),
        "bn2": _bn_init(width // 2),
        "conv3": _kaiming_conv(next(keys), 3, 3, width // 2, width),
        "bn3": _bn_init(width),
    }}
    inplanes = width
    for li, n_blocks in enumerate(cfg.vision_layers, start=1):
        planes = width * (2 ** (li - 1))
        layer: Params = {}
        for bi in range(n_blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            blk = {
                "conv1": _kaiming_conv(next(keys), 1, 1, inplanes, planes),
                "bn1": _bn_init(planes),
                "conv2": _kaiming_conv(next(keys), 3, 3, planes, planes),
                "bn2": _bn_init(planes),
                "conv3": _kaiming_conv(next(keys), 1, 1, planes, planes * 4),
                # bn3.weight zeroed (model/base/model.py:322-325)
                "bn3": _bn_init(planes * 4, zero_scale=True),
            }
            if stride > 1 or inplanes != planes * 4:
                blk["downsample"] = {
                    "conv": _kaiming_conv(next(keys), 1, 1, inplanes, planes * 4),
                    "bn": _bn_init(planes * 4),
                }
            layer[str(bi)] = blk
            inplanes = planes * 4
        v[f"layer{li}"] = layer

    embed = width * 32
    std = embed ** -0.5
    spacial = cfg.image_resolution // 32
    lin_bound = 1.0 / math.sqrt(embed)
    def lin_b(k):
        return jax.random.uniform(k, (embed,), minval=-lin_bound, maxval=lin_bound)
    v["attnpool"] = {
        "positional_embedding": std * jax.random.normal(
            next(keys), (spacial ** 2 + 1, embed)),
        "q_w": std * jax.random.normal(next(keys), (embed, embed)),
        "q_b": lin_b(next(keys)),
        "k_w": std * jax.random.normal(next(keys), (embed, embed)),
        "k_b": lin_b(next(keys)),
        "v_w": std * jax.random.normal(next(keys), (embed, embed)),
        "v_b": lin_b(next(keys)),
        "c_w": std * jax.random.normal(next(keys), (embed, cfg.embed_dim)),
        "c_b": jax.random.uniform(next(keys), (cfg.embed_dim,),
                                  minval=-lin_bound, maxval=lin_bound),
    }
    return v
