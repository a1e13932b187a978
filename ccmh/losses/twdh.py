"""TwDH losses (TOMM'24): hash-center BCE + soft-argmax quantization.

Re-expression of train/TwDH/hash_train.py:93-163:

* per-sample hash-center targets: sign of the mean of the sample's class
  centers, zeros broken by one random ±1 vector shared across the batch
  (hash_center_multilables, :103-122 — vectorized here, the reference
  loops samples);
* hash_convert (:84-101): ±1 center -> one-hot softmax-pair target [B, 2K];
* BCE between the softmax-pair code and the pair target;
* soft_argmax_hash_loss (:124-129): 1 - mean((2c - 1)²).

Center/trans assets are vendored as npz (converted from the reference's
~90 torch pickles under train/TwDH/center/).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccmh.config import TwDHConfig

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "twdh")


def load_twdh_assets(dataset: str, long_dim: int, path: str = "") -> Dict:
    """-> {"long_center": [C, K], "short_center": {k: [C, k]},
    "trans": {k: [2K, 2k]}} for the given long code length."""
    name = {"flickr": "mirflickr", "mirflickr": "mirflickr"}.get(dataset, dataset)
    npz_path = path or os.path.join(_ASSET_DIR, f"{name}.npz")
    with np.load(npz_path) as data:
        keys = data.files
        out = {
            "long_center": jnp.asarray(data[f"long/{long_dim}"]),
            "short_center": {}, "trans": {},
        }
        for key in keys:
            parts = key.split("/")
            if parts[0] == "trans" and int(parts[1]) == long_dim:
                out["trans"][int(parts[2])] = jnp.asarray(data[key])
            elif parts[0] == "short":
                out["short_center"][int(parts[1])] = jnp.asarray(data[key])
    return out


def hash_center_targets(rng: jax.Array, labels: jax.Array, centers: jax.Array) -> jax.Array:
    """[B, C] labels + [C, K] ±1 centers -> [B, 2K] one-hot pair targets."""
    mean = (labels @ centers) / jnp.maximum(jnp.sum(labels, 1, keepdims=True), 1.0)
    sign = jnp.sign(mean)                                   # -1 / 0 / +1
    random_center = 2.0 * jax.random.randint(rng, (centers.shape[1],), 0, 2) - 1.0
    center = jnp.where(sign == 0, random_center[None, :], sign)
    bit = (center > 0).astype(jnp.int32)                    # 0 -> (1,0), 1 -> (0,1)
    pairs = jax.nn.one_hot(bit, 2)                          # [B, K, 2]
    return pairs.reshape(labels.shape[0], -1)


# smallest NORMAL float32: a flush-to-zero-safe floor inside the log.
# torch.nn.BCELoss clamps the log terms at -100; log(min_normal) = -87.3 is
# the closest TPU-safe equivalent (denormals like exp(-100) may flush to 0).
_MIN_NORMAL = 1.1754944e-38


def bce(p: jax.Array, t: jax.Array) -> jax.Array:
    """torch.nn.BCELoss semantics: bounded log terms for saturated inputs.

    An eps-clip of ``p`` does not work in float32 — ``1.0 - 1e-12`` rounds
    back to exactly 1.0, so saturated softmax pairs (p == 1.0, common once
    the 2K-dim pair logits sharpen) produced ``0 * log(0) = NaN`` in the
    forward, and a plain ``maximum(log(p), -100)`` still produced NaN in
    the BACKWARD (0 cotangent x inf d(log)/dp).  Flooring p inside the log
    keeps forward AND gradient finite: the matched side contributes exactly
    0 and the mismatched saturated side a bounded ~-87 penalty (torch
    clamps at -100; indistinguishable in practice).  Caught by the TwDH
    trajectory golden."""
    log_p = jnp.log(jnp.maximum(p, _MIN_NORMAL))
    log_1p = jnp.log(jnp.maximum(1.0 - p, _MIN_NORMAL))
    return -jnp.mean(t * log_p + (1.0 - t) * log_1p)


def soft_argmax_hash_loss(code_flat: jax.Array) -> jax.Array:
    return 1.0 - jnp.mean((2.0 * code_flat - 1.0) ** 2)


def twdh_loss(
    rng: jax.Array,
    img_long: jax.Array, txt_long: jax.Array,
    img_short: Dict[int, jax.Array], txt_short: Dict[int, jax.Array],
    labels: jax.Array, assets: Dict,
    quan_alpha: float = 0.5, low_rate: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    k_long, k_short = jax.random.split(rng)
    long_target = hash_center_targets(k_long, labels, assets["long_center"])
    long_nce = (bce(img_long, long_target) + bce(txt_long, long_target)) / 2.0
    long_quan = (soft_argmax_hash_loss(img_long) + soft_argmax_hash_loss(txt_long)) / 2.0

    loss = long_nce + quan_alpha * long_quan
    metrics = {"long_nce": long_nce, "long_quan": long_quan}
    for i, (k, center) in enumerate(sorted(assets["short_center"].items())):
        target = hash_center_targets(jax.random.fold_in(k_short, i), labels, center)
        s_nce = (bce(img_short[k], target) + bce(txt_short[k], target)) / 2.0
        s_quan = (soft_argmax_hash_loss(img_short[k]) + soft_argmax_hash_loss(txt_short[k])) / 2.0
        loss = loss + low_rate * (s_nce + s_quan)
        metrics[f"short{k}_nce"] = s_nce
    return loss, metrics
