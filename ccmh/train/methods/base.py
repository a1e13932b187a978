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

    def make_loss_fn(self, cfg: Config, clip_cfg: ClipConfig):
        def loss_fn(params, extra, aux, batch, rng):
            return self.loss(params, extra, aux, batch, rng, cfg, clip_cfg)
        return loss_fn

    def make_encode_fn(self, cfg: Config, clip_cfg: ClipConfig):
        def encode_fn(params, aux, batch):
            return self.encode(params, aux, batch, cfg, clip_cfg)
        return jax.jit(encode_fn)


def clip_embeds(
    params: Params, clip_cfg: ClipConfig, batch: Dict[str, jax.Array],
    *, features: str = "pooled", dtype=jnp.float32,
):
    """Shared forward through both towers (model/modelbase.py:69-96)."""
    img = vision_forward(params["clip"]["visual"], clip_cfg, batch["image"],
                         dtype=dtype, features=features)
    txt = text_forward(params["clip"]["text"], clip_cfg, batch["text"],
                       dtype=dtype, features=features,
                       key_padding_mask=batch.get("key_padding_mask"))
    return img, txt
