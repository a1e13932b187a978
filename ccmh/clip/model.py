"""Functional JAX CLIP (ViT vision tower + causal text transformer).

TPU-first re-design of the reference CLIP runtime
(reference: model/base/model.py:153-388 — LayerNorm/QuickGELU/
ResidualAttentionBlock/VisionTransformer/CLIP), not a translation:

* parameters are a plain pytree (nested dicts) so sharding annotations,
  optimizer masking and checkpoint conversion are trivial;
* the 12 transformer blocks run under a single ``lax.scan`` over stacked
  per-layer parameters — one compiled block body instead of 12 unrolled
  copies (faster compiles, identical math);
* the patchify "conv" is a reshape + one big matmul that maps straight onto
  the MXU (a stride-32 conv and this matmul are the same computation);
* batch-first [B, L, D] layout everywhere (the reference's LND layout is a
  torch nn.MultiheadAttention artefact);
* LayerNorm and softmax always compute in float32 regardless of the compute
  dtype, mirroring the fp16-safe LayerNorm of the reference
  (model/base/model.py:153-159) for bfloat16 runs.

Token-sequence outputs needed by MITH (model/MITH.py:56-144) and DPSIH
(model/DPSIH.py:88-101) are first-class: every forward can return projected
token sequences, pre-projection hidden states and last-layer attention rows.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """Architecture hyperparameters (ViT-B/32 defaults).

    ``vision_layers`` as a tuple (e.g. ``(3, 4, 6, 3)`` for RN50) selects
    the ModifiedResNet vision tower (ccmh/clip/resnet.py), mirroring the
    reference's build_model inference (model/base/model.py:415-431);
    ``vision_patch_size`` is None in that case."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: Any = 12
    vision_width: int = 768
    vision_patch_size: Optional[int] = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # qkv weight column order of the TOWER attention params: "packed" =
    # [q(all heads) | k | v] (the canonical/checkpoint layout, matching the
    # torch in_proj_weight), "head_major" = [h0(q k v) | h1(q k v) | ...] —
    # the tensor-parallel layout whose fused-qkv output axis shards cleanly
    # by attention head over a ("data", "model") mesh (parallel/tp.py).
    # Checkpoints on disk are ALWAYS packed; the Trainer relayouts live
    # state at the TP boundary.
    qkv_layout: str = "packed"

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, (tuple, list))

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def grid(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def n_patches(self) -> int:
        return self.grid * self.grid

    @classmethod
    def tiny(cls) -> "ClipConfig":
        """Small config for tests: full architecture, toy sizes."""
        return cls(
            embed_dim=64, image_resolution=32, vision_layers=2, vision_width=128,
            vision_patch_size=16, context_length=77, vocab_size=49408,
            transformer_width=128, transformer_heads=2, transformer_layers=2,
        )

    @classmethod
    def vit_l14(cls, resolution: int = 224) -> "ClipConfig":
        """ViT-L/14 architecture (the largest official ViT release; pass
        ``resolution=336`` for the @336px variant).  Converted checkpoints
        infer this shape automatically — the preset exists for
        weight-free construction (benchmarks, TP sizing: 16 vision /
        12 text heads shard at tp ∈ {2, 4})."""
        return cls(
            embed_dim=768, image_resolution=resolution, vision_layers=24,
            vision_width=1024, vision_patch_size=14, context_length=77,
            vocab_size=49408, transformer_width=768, transformer_heads=12,
            transformer_layers=12,
        )


class VisionOutput(NamedTuple):
    pooled: jax.Array                      # [B, E] standard CLIP embedding
    tokens_pre: Optional[jax.Array] = None   # [B, 1+P, W] post-transformer hidden
    tokens_proj: Optional[jax.Array] = None  # [B, 1+P, E] ln_post(all) @ proj
    cls_attn: Optional[jax.Array] = None     # [B, P] last-layer cls->patch attention


class TextOutput(NamedTuple):
    pooled: jax.Array                      # [B, E] EOT-pooled embedding
    tokens_pre: Optional[jax.Array] = None   # [B, L, W] post-transformer hidden
    tokens_proj: Optional[jax.Array] = None  # [B, L, E] ln_final(all) @ projection
    eos_attn: Optional[jax.Array] = None     # [B, L] last-layer EOS attention row
    key_padding_mask: Optional[jax.Array] = None  # [B, L] pads *and* EOT masked


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """fp32-stable LayerNorm; casts back to the input dtype."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


# Attention implementation: "fused" = Pallas VMEM-resident kernel
# (ops/attention.py — ~2x tower speedup on v5e for the 50/32-token CLIP
# sequences), "xla" = plain dot_general formulation.  Both are numerically
# equivalent (fp32 logits+softmax); per-example key-padding biases and
# need_weights fall back to "xla" automatically.
ATTN_IMPL = "fused"

# LayerNorm implementation for the transformer blocks: "fused" = one-pass
# Pallas kernels (ops/layernorm.py — single HBM read per LN, and the
# residual-add + pre-LN pair collapses to one pass), "xla" = the plain
# formulation.  Parity within 1-2 bf16 ulps (tests/test_layernorm.py).
# MEASURED on v5e (B=256, bf16, ViT-B/32): fused LN is a NET LOSS on the
# encode path — 10.3k pairs/s vs 11.8k for XLA (the standalone Pallas
# calls between the matmuls break XLA's elementwise fusion/pipelining,
# costing more than the saved LN reads) — and a wash on the train step
# (107.2 vs 108.8 ms).  Default is therefore "xla"; the kernels stay as a
# validated option (and only engage on TPU — interpreter mode on CPU
# would be pure overhead).
LN_IMPL = "xla"


def _use_fused_ln() -> bool:
    return LN_IMPL == "fused" and jax.default_backend() == "tpu"


def _ln(x: jax.Array, p: Params) -> jax.Array:
    if _use_fused_ln():
        from ccmh.ops.layernorm import fused_layer_norm

        return fused_layer_norm(x, p["scale"], p["bias"])
    return layer_norm(x, p["scale"], p["bias"])


def set_attn_impl(impl: str) -> None:
    global ATTN_IMPL
    assert impl in ("fused", "xla"), impl
    ATTN_IMPL = impl


def multi_head_attention(
    x: jax.Array,
    p: Params,
    n_head: int,
    attn_bias: Optional[jax.Array] = None,
    need_weights: bool = False,
    head_major: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Self-attention over [B, L, D] with a fused qkv projection.

    ``attn_bias`` is an additive [B, 1, L, L] or [L, L] mask (0 / -inf).
    Returned weights are the softmax probabilities averaged over heads (the
    convention of torch MHA that MITH consumes).

    ``head_major`` declares that ``qkv_w``/``qkv_b`` columns are in the
    tensor-parallel [h0(q k v) | h1(q k v) | ...] order (parallel/tp.py)
    instead of the canonical [q | k | v] packing.  The head-major path keeps
    every reshape representable under a head-sharded GSPMD annotation (the
    merged qkv output axis factors as (H, 3, Dh) with H major, so sharding
    by head needs no all-to-all) and therefore always uses the XLA
    formulation — the Pallas kernel is a single-device program.
    """
    B, L, D = x.shape
    head_dim = D // n_head

    if (
        ATTN_IMPL == "fused"
        and not head_major
        and not need_weights
        and (attn_bias is None or attn_bias.ndim == 2)
    ):
        from ccmh.ops.attention import fused_attention

        # feed the RAW x @ qkv_w product; the kernel folds qkv_b into its
        # VMEM read, saving the [B, L, 3D] HBM round trip of a standalone
        # bias add (pallas_call is an XLA fusion boundary).
        ctx = fused_attention(x @ p["qkv_w"], attn_bias, n_head,
                              qkv_b=p["qkv_b"])             # [B, L, D]
        return ctx @ p["out_w"] + p["out_b"], None

    qkv_flat = x @ p["qkv_w"] + p["qkv_b"]                 # [B, L, 3D]

    if head_major:
        qkv = qkv_flat.reshape(B, L, n_head, 3, head_dim)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
    else:
        qkv = qkv_flat.reshape(B, L, 3, n_head, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, L, H, Dh]

    # Transpose-free attention: q/k/v stay in the qkv matmul's natural
    # [B, L, H, Dh] layout and all reordering lives in dot_general
    # dimension_numbers, so XLA folds the relayouts into the MXU operand
    # reads instead of materialising [B, H, L, Dh] copies (measured ~10%
    # faster on the ViT-B/32 tower, bitwise-identical outputs).
    logits = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32)                # [B, H, L, L]
    logits = logits * (1.0 / math.sqrt(head_dim))
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jax.lax.dot_general(
        probs, v, (((3,), (1,)), ((0, 1), (0, 2))))        # [B, H, L, Dh]
    # fold the output projection over (H, Dh): no transpose of ctx back
    out = jax.lax.dot_general(
        ctx, p["out_w"].reshape(n_head, head_dim, D),
        (((1, 3), (0, 1)), ((), ())))                      # [B, L, D]
    out = out + p["out_b"]
    if need_weights:
        return out, jnp.mean(probs, axis=1)                # [B, L, L]
    return out, None


def _block(
    x: jax.Array,
    p: Params,
    n_head: int,
    attn_bias: Optional[jax.Array],
    need_weights: bool = False,
    head_major: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Pre-LN residual attention block (attention + QuickGELU MLP)."""
    h = _ln(x, p["ln_1"])
    attn_out, w = multi_head_attention(h, p["attn"], n_head, attn_bias,
                                       need_weights, head_major=head_major)
    if _use_fused_ln():
        # residual add + pre-MLP LN in ONE VMEM pass (ops/layernorm.py)
        from ccmh.ops.layernorm import fused_add_layer_norm

        h, x = fused_add_layer_norm(x, attn_out, p["ln_2"]["scale"], p["ln_2"]["bias"])
    else:
        x = x + attn_out
        h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"])
    x = x + (quick_gelu(h @ p["mlp"]["fc_w"] + p["mlp"]["fc_b"]) @ p["mlp"]["proj_w"] + p["mlp"]["proj_b"])
    return x, w


def transformer(
    x: jax.Array,
    stacked: Params,
    n_head: int,
    attn_bias: Optional[jax.Array] = None,
    need_last_attn: bool = False,
    remat: bool = False,
    unroll: int = 0,
    head_major: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Run all blocks via lax.scan over the stacked layer parameters.

    ``remat=True`` (or ``"full"``) wraps each block in ``jax.checkpoint``:
    the backward pass recomputes block activations instead of holding all
    L layers' [B, L, 4W] intermediates in HBM — ~1 extra forward of FLOPs
    for ~L x less activation memory.  ``remat="dots"`` uses the
    ``dots_with_no_batch_dims_saveable`` policy instead: matmul outputs
    stay saved (no MXU recompute in bwd), only elementwise/norm/attention
    internals recompute — a middle point that costs ~2x the activation
    memory of full remat but removes most of its recompute time.  Off by
    default (the plain towers fit comfortably); methods whose step carries
    large extra state (MITH's token pipeline at B=256 overflows a 16 GB
    chip without it) enable it via ``cfg.remat`` (+ ``cfg.remat_policy``).

    ``unroll``: lax.scan unroll factor; -1/0 or >= n_layers unrolls fully,
    eliminating the while-loop and the dynamic_update_slice stacking of
    per-layer activation saves under grad (profiled at ~11 ms/step of pure
    HBM copies in the B=256 train step — tools/profile_step.py)."""
    if stacked["ln_1"]["scale"].dtype != x.dtype:
        # bf16 compute: cast weights once here; layer_norm still reduces in
        # fp32 internally (fp16-safe LayerNorm parity).
        stacked = jax.tree.map(lambda t: t.astype(x.dtype), stacked)
    n_layers = stacked["ln_1"]["scale"].shape[0]

    def block_fn(carry, layer_params):
        return _block(carry, layer_params, n_head, attn_bias,
                      head_major=head_major)[0]

    if remat == "dots":
        block_fn = jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat:
        block_fn = jax.checkpoint(block_fn)

    def body(carry, layer_params):
        return block_fn(carry, layer_params), None

    # any value <= 0 means "full" (0 is the documented default, -1 the
    # legacy spelling); clamping here keeps --set scan_unroll=-2 from
    # reaching lax.scan as a nonsense unroll factor
    u = n_layers if (unroll <= 0 or unroll >= n_layers) else unroll

    if not need_last_attn:
        x, _ = jax.lax.scan(body, x, stacked, unroll=u)
        return x, None

    if n_layers > 1:
        head_layers = jax.tree.map(lambda t: t[:-1], stacked)
        x, _ = jax.lax.scan(body, x, head_layers, unroll=min(u, n_layers - 1))
    last = jax.tree.map(lambda t: t[-1], stacked)
    return _block(x, last, n_head, attn_bias, need_weights=True,
                  head_major=head_major)


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

# CLIP pixel normalization constants (dataset/base.py:39); live here as well
# as in the host pipeline because uint8 batches normalize on-device.
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_pixels(images: jax.Array) -> jax.Array:
    """uint8 [B, H, W, 3] -> CLIP-normalized float32.

    Same op order as the host pipeline (data/dataset.py _transform:
    /255, -mean, /std, all in float32) so a cached-uint8 batch normalized
    on-device is bit-identical to the host float path.  Keeping batches
    uint8 until this point cuts host->device transfer 4x and removes the
    per-batch normalize from the host entirely (the input-pipeline path,
    data/cache.py)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_PIXEL_STD, jnp.float32)
    return (x - mean) / std


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3] non-overlapping patches.

    Flattening order is (ph, pw, channel), matching the converted conv
    kernel layout so conv(x, w) == patchify(x) @ flat(w).
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)                      # [B, gh, gw, p, p, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def vision_forward(
    p: Params,
    cfg: ClipConfig,
    images: jax.Array,
    *,
    dtype: jnp.dtype = jnp.float32,
    features: str = "pooled",
    remat: bool = False,
    unroll: int = 0,
) -> VisionOutput:
    """ViT forward.  ``features``: "pooled" | "tokens" | "mith".

    "pooled": standard CLIP (reference model/base/model.py:228-252).
    "tokens": pooled + pre-projection token sequence (DPSIH,
              model/DPSIH.py:88-95 expects width-768 token states).
    "mith":   ln_post applied to *all* tokens, all projected, plus the
              last-layer cls->patch attention row (model/MITH.py:57-83).
    """
    if images.dtype == jnp.uint8:
        images = normalize_pixels(images)
    if cfg.is_resnet:
        if features != "pooled":
            raise ValueError(
                "token-level features require the ViT tower (MITH/DPSIH are "
                "ViT-only in the reference too, model/MITH.py:56-83)")
        from ccmh.clip.resnet import resnet_forward

        return VisionOutput(pooled=resnet_forward(p, cfg, images, dtype=dtype))
    x = patchify(images.astype(dtype), cfg.vision_patch_size)
    x = x @ p["patch_w"].astype(dtype)                     # [B, P, W]
    B = x.shape[0]
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype), (B, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    x = layer_norm(x, p["ln_pre"]["scale"], p["ln_pre"]["bias"])

    need_attn = features == "mith"
    x, attn = transformer(x, p["blocks"], cfg.vision_heads, None,
                          need_last_attn=need_attn, remat=remat, unroll=unroll,
                          head_major=cfg.qkv_layout == "head_major")

    if features == "mith":
        h = layer_norm(x, p["ln_post"]["scale"], p["ln_post"]["bias"])
        tokens_proj = h @ p["proj"].astype(dtype)          # [B, 1+P, E]
        return VisionOutput(
            pooled=tokens_proj[:, 0, :],
            tokens_pre=x,
            tokens_proj=tokens_proj,
            cls_attn=attn[:, 0, 1:],                       # cls row, patch columns
        )

    pooled = layer_norm(x[:, 0, :], p["ln_post"]["scale"], p["ln_post"]["bias"])
    pooled = pooled @ p["proj"].astype(dtype)
    if features == "tokens":
        return VisionOutput(pooled=pooled, tokens_pre=x)
    return VisionOutput(pooled=pooled)


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def causal_mask(length: int) -> jax.Array:
    """Additive [L, L] causal bias (0 on/below diagonal, -inf above)."""
    return jnp.where(
        jnp.tril(jnp.ones((length, length), dtype=bool)), 0.0, -jnp.inf
    ).astype(jnp.float32)


def text_forward(
    p: Params,
    cfg: ClipConfig,
    ids: jax.Array,
    *,
    dtype: jnp.dtype = jnp.float32,
    features: str = "pooled",
    key_padding_mask: Optional[jax.Array] = None,
    remat: bool = False,
    unroll: int = 0,
) -> TextOutput:
    """Causal text transformer with EOT pooling.

    ``ids``: int32 [B, L] (L <= context_length; positional embedding is
    sliced to L, reference model/base/model.py:362).  EOT position is
    ``argmax(ids)`` — the EOT id is the largest in the vocab.
    ``features``: "pooled" | "tokens" | "mith" (all projected tokens, EOS
    attention row and the extended key-padding mask, model/MITH.py:120-144).
    """
    B, L = ids.shape
    x = p["token_embedding"].astype(dtype)[ids]            # [B, L, W]
    x = x + p["positional_embedding"].astype(dtype)[:L]

    bias = causal_mask(L)
    if key_padding_mask is not None:
        # torch semantics: True = masked-out key.
        kp = jnp.where(key_padding_mask, -jnp.inf, 0.0).astype(jnp.float32)
        bias = bias[None, None, :, :] + kp[:, None, None, :]

    need_attn = features == "mith"
    x, attn = transformer(x, p["blocks"], cfg.transformer_heads, bias,
                          need_last_attn=need_attn, remat=remat, unroll=unroll,
                          head_major=cfg.qkv_layout == "head_major")

    eos_pos = jnp.argmax(ids, axis=-1)                     # [B]
    h = layer_norm(x, p["ln_final"]["scale"], p["ln_final"]["bias"])

    if features == "mith":
        tokens_proj = h @ p["text_projection"].astype(dtype)   # [B, L, E]
        pooled = jnp.take_along_axis(tokens_proj, eos_pos[:, None, None], axis=1)[:, 0, :]
        # EOS attention row with the EOS column zeroed (model/MITH.py:131-133).
        eos_attn = jnp.take_along_axis(attn, eos_pos[:, None, None], axis=1)[:, 0, :]
        eos_attn = eos_attn * (1.0 - jax.nn.one_hot(eos_pos, L, dtype=eos_attn.dtype))
        kpm = key_padding_mask if key_padding_mask is not None else jnp.zeros((B, L), bool)
        new_kpm = jnp.logical_or(kpm, ids == cfg.vocab_size - 1)
        return TextOutput(
            pooled=pooled, tokens_pre=x, tokens_proj=tokens_proj,
            eos_attn=eos_attn, key_padding_mask=new_kpm,
        )

    pooled = jnp.take_along_axis(h, eos_pos[:, None, None], axis=1)[:, 0, :]
    pooled = pooled @ p["text_projection"].astype(dtype)
    if features == "tokens":
        return TextOutput(pooled=pooled, tokens_pre=x)
    return TextOutput(pooled=pooled)


def encode_image(params: Params, cfg: ClipConfig, images: jax.Array, **kw) -> jax.Array:
    return vision_forward(params["visual"], cfg, images, **kw).pooled


def encode_text(params: Params, cfg: ClipConfig, ids: jax.Array, **kw) -> jax.Array:
    return text_forward(params["text"], cfg, ids, **kw).pooled


def clip_forward(
    params: Params, cfg: ClipConfig, images: jax.Array, ids: jax.Array,
    *, dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """CLIP contrastive logits (reference model/base/model.py:374-388)."""
    img = encode_image(params, cfg, images, dtype=dtype)
    txt = encode_text(params, cfg, ids, dtype=dtype)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# initialization (distributional parity with model/base/model.py:311-338)
# ---------------------------------------------------------------------------

def _init_ln(width: int) -> Params:
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def _init_block(key, width: int, attn_std: float, proj_std: float, fc_std: float) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "ln_1": _init_ln(width),
        "attn": {
            "qkv_w": attn_std * jax.random.normal(k1, (width, 3 * width)),
            "qkv_b": jnp.zeros((3 * width,)),
            "out_w": proj_std * jax.random.normal(k2, (width, width)),
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": _init_ln(width),
        "mlp": {
            "fc_w": fc_std * jax.random.normal(k3, (width, 4 * width)),
            "fc_b": jnp.zeros((4 * width,)),
            "proj_w": proj_std * jax.random.normal(k4, (4 * width, width)),
            "proj_b": jnp.zeros((width,)),
        },
    }


def _stack_blocks(blocks) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_clip_params(key: jax.Array, cfg: ClipConfig = ClipConfig()) -> Params:
    keys = jax.random.split(key, 8)
    vw, tw = cfg.vision_width, cfg.transformer_width
    v_scale = vw ** -0.5

    if cfg.is_resnet:
        from ccmh.clip.resnet import init_resnet_visual

        visual = init_resnet_visual(keys[2], cfg)
    else:
        patch_fan_in = 3 * cfg.vision_patch_size ** 2
        patch_bound = (1.0 / patch_fan_in) ** 0.5 * math.sqrt(3.0)
        v_proj_std = (vw ** -0.5) * ((2 * cfg.vision_layers) ** -0.5)
        v_blocks = [
            _init_block(k, vw, vw ** -0.5, v_proj_std, (2 * vw) ** -0.5)
            for k in jax.random.split(keys[0], cfg.vision_layers)
        ]
        visual = {
            "patch_w": jax.random.uniform(
                keys[2], (patch_fan_in, vw), minval=-patch_bound, maxval=patch_bound
            ),
            "class_embedding": v_scale * jax.random.normal(keys[3], (vw,)),
            "positional_embedding": v_scale
            * jax.random.normal(keys[4], (cfg.n_patches + 1, vw)),
            "ln_pre": _init_ln(vw),
            "blocks": _stack_blocks(v_blocks),
            "ln_post": _init_ln(vw),
            "proj": v_scale * jax.random.normal(keys[5], (vw, cfg.embed_dim)),
        }

    t_proj_std = (tw ** -0.5) * ((2 * cfg.transformer_layers) ** -0.5)
    t_blocks = [
        _init_block(k, tw, tw ** -0.5, t_proj_std, (2 * tw) ** -0.5)
        for k in jax.random.split(keys[1], cfg.transformer_layers)
    ]

    return {
        "visual": visual,
        "text": {
            "token_embedding": 0.02 * jax.random.normal(keys[6], (cfg.vocab_size, tw)),
            "positional_embedding": 0.01
            * jax.random.normal(keys[7], (cfg.context_length, tw)),
            "blocks": _stack_blocks(t_blocks),
            "ln_final": _init_ln(tw),
            "text_projection": (tw ** -0.5)
            * jax.random.normal(jax.random.fold_in(key, 99), (tw, cfg.embed_dim)),
        },
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), dtype=jnp.float32),
    }
