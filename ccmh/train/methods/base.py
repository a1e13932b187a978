"""Method protocol shared by all 14 methods.

A Method bundles everything the generic trainer needs:

* ``init``   — build head/extra/aux parameter trees;
* ``loss``   — pure fused loss (CLIP fwd + heads + method loss) used by the
               jitted train step;
* ``encode`` — batch -> (±1 image codes, ±1 text codes) for evaluation,
               replicating the per-method get_code variants
               (train/base.py:130-223);
* ``extra_tx`` — optional optax transform for loss-side trainables.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ccmh.clip.model import ClipConfig, vision_forward, text_forward
from ccmh.config import Config

Params = Dict[str, Any]


@dataclasses.dataclass
class Method:
    name: str
    # (rng, cfg, clip_cfg) -> (heads, extra | None, aux)
    init: Callable[[jax.Array, Config, ClipConfig], Tuple[Params, Optional[Params], Params]]
    # (params, extra, aux, batch, rng, cfg, clip_cfg) -> (loss, (new_aux, metrics))
    loss: Callable[..., Tuple[jax.Array, Tuple[Params, Dict[str, jax.Array]]]]
    # (params, aux, batch, cfg, clip_cfg) -> (img ±1 [B,K], txt ±1 [B,K])
    encode: Callable[..., Tuple[jax.Array, jax.Array]]
    extra_tx: Optional[Callable[[Config], optax.GradientTransformation]] = None
    features: str = "pooled"       # clip output mode the method needs
    needs_mask: bool = False       # MITH-style key_padding_mask batches
    # optional: batch -> {name: (img ±1, txt ±1)} for multi-length eval (TwDH)
    multi_encode: Optional[Callable[..., Dict[str, Tuple[jax.Array, jax.Array]]]] = None
    # optional: cfg -> (q, r) -> int32 distances, replacing plain Hamming in
    # evaluation (DPSIH's multi-embed max-similarity ranking)
    dist_fn: Optional[Callable[[Config], Callable]] = None
    # optional global grad-norm clip applied before BertAdam's per-tensor
    # clip (DPSIH: train/DPSIH/hash_train.py:70-71, clip at 2.0)
    grad_clip: float = 0.0
    # optional (cfg, clip_cfg, tx, extra_tx) -> raw step_fn | None replacing
    # the generic fused train step (DGHDGH's reference-faithful three-phase
    # sequencing; returning None keeps the generic step)
    custom_step: Optional[Callable] = None

    def make_loss_fn(self, cfg: Config, clip_cfg: ClipConfig):
        def loss_fn(params, extra, aux, batch, rng):
            return self.loss(params, extra, aux, batch, rng, cfg, clip_cfg)
        return loss_fn

    def make_encode_fn(self, cfg: Config, clip_cfg: ClipConfig):
        def encode_fn(params, aux, batch):
            return self.encode(params, aux, batch, cfg, clip_cfg)
        return jax.jit(encode_fn)


def make_linear_hash_method(
    name: str,
    loss_body: Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]],
    *,
    init_extra: Optional[Callable[[jax.Array, Config, ClipConfig], Params]] = None,
    extra_tx: Optional[Callable[[Config], optax.GradientTransformation]] = None,
    init_aux: Optional[Callable[[Config, ClipConfig], Params]] = None,
) -> Method:
    """Factory for the seven plain-LinearHash methods (SURVEY §2.4): only
    the loss differs; heads, encode (torch.sign parity) and the optimizer
    wiring are shared.

    ``loss_body(hash_img, hash_txt, label, extra, aux, rng, cfg)``
    -> (loss, metrics) or (loss, (new_aux, metrics)).
    """
    from ccmh.models.heads import init_linear_hash, linear_hash
    from ccmh.ops.packing import sign_codes

    def _init(rng, cfg: Config, clip_cfg: ClipConfig):
        k1, k2, k3 = jax.random.split(rng, 3)
        heads = {
            "img_head": init_linear_hash(k1, clip_cfg.embed_dim, cfg.output_dim),
            "txt_head": init_linear_hash(k2, clip_cfg.embed_dim, cfg.output_dim),
        }
        extra = init_extra(k3, cfg, clip_cfg) if init_extra else None
        aux = init_aux(cfg, clip_cfg) if init_aux else {}
        return heads, extra, aux

    def _hashes(params, batch, clip_cfg, cfg, rng=None, train=False):
        img, txt = clip_embeds(params, clip_cfg, batch, cfg)
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        hi = linear_hash(params["img_head"], img.pooled, train=train, rng=r1)
        ht = linear_hash(params["txt_head"], txt.pooled, train=train, rng=r2)
        return hi, ht

    def _loss(params, extra, aux, batch, rng, cfg: Config, clip_cfg: ClipConfig):
        rng, body_rng = jax.random.split(rng)
        hi, ht = _hashes(params, batch, clip_cfg, cfg, rng, train=True)
        out = loss_body(hi, ht, batch["label"], extra, aux, body_rng, cfg)
        loss, rest = out
        if isinstance(rest, tuple):
            new_aux, metrics = rest
        else:
            new_aux, metrics = aux, rest
        return loss, (new_aux, metrics)

    def _encode(params, aux, batch, cfg: Config, clip_cfg: ClipConfig):
        hi, ht = _hashes(params, batch, clip_cfg, cfg)
        return sign_codes(hi), sign_codes(ht)

    return Method(name=name, init=_init, loss=_loss, encode=_encode, extra_tx=extra_tx)


def resolve_compute_dtype(cfg: Optional[Config]):
    """The tower compute dtype for a run: ``--compute-dtype bfloat16`` runs
    both CLIP towers in bf16 (fp32 LayerNorm/softmax inside, fp32 embeds
    out); ``float32`` is the default.  Unknown values raise instead of
    silently running fp32 (fp16 is a GPU format — TPUs use bf16)."""
    if cfg is None:
        return jnp.float32
    name = str(cfg.compute_dtype)
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "fp32", "f32"):
        return jnp.float32
    raise ValueError(
        f"unsupported compute_dtype {name!r}; use 'float32' or 'bfloat16'")


def _cast_floats_f32(out):
    return type(out)(*[
        t.astype(jnp.float32)
        if (t is not None and jnp.issubdtype(t.dtype, jnp.floating)) else t
        for t in out
    ])


def clip_embeds(
    params: Params, clip_cfg: ClipConfig, batch: Dict[str, jax.Array],
    cfg: Optional[Config] = None,
    *, features: str = "pooled", dtype=None,
):
    """Shared forward through both towers (model/modelbase.py:69-96).

    ``dtype`` defaults to the run's ``cfg.compute_dtype``; under bf16 the
    towers run in bf16 and every floating output is cast back to fp32 so
    heads and losses keep reference numerics."""
    if dtype is None:
        dtype = resolve_compute_dtype(cfg)
    remat = bool(getattr(cfg, "remat", False))
    if remat:
        # "full" (default) or "dots" (keep matmul outputs, recompute the rest)
        remat = getattr(cfg, "remat_policy", "full")
    unroll = int(getattr(cfg, "scan_unroll", 0))
    img = vision_forward(params["clip"]["visual"], clip_cfg, batch["image"],
                         dtype=dtype, features=features, remat=remat,
                         unroll=unroll)
    txt = text_forward(params["clip"]["text"], clip_cfg, batch["text"],
                       dtype=dtype, features=features, remat=remat,
                       key_padding_mask=batch.get("key_padding_mask"),
                       unroll=unroll)
    if dtype != jnp.float32:
        img, txt = _cast_floats_f32(img), _cast_floats_f32(txt)
    return img, txt
