"""Binary code packing: float/±1 codes <-> packed uint32 lanes.

The reference keeps codes as float32 [N, K] and computes Hamming distance
with a float matmul (utils/calc_utils.py:8-14).  On TPU we keep two
representations:

* ±1 int8 [N, K]   — MXU-native; Hamming ranking is one int8 matmul.
* packed uint32 [N, ceil(K/32)] — 32 bits/lane for HBM-light storage of
  million-item galleries and the XOR+popcount Pallas kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sign_codes(x: jax.Array) -> jax.Array:
    """Binarize relaxed codes to ±1 (0 maps to +1).

    The reference uses torch.sign (0 -> 0, train/base.py:140-144); tanh
    outputs are never exactly 0 in practice, and mapping 0 to +1 keeps the
    packed representation total.
    """
    return jnp.where(x >= 0, 1, -1).astype(jnp.int8)


def pack_codes(codes: jax.Array) -> jax.Array:
    """[N, K] ±1 (or float-signed) -> [N, ceil(K/32)] uint32, bit b of lane
    w set iff code[:, 32*w + b] is positive.  K is zero-padded to a multiple
    of 32; padded bits are 0 on both sides of a XOR so they never affect
    Hamming distances.
    """
    n, k = codes.shape
    w = -(-k // 32)
    bits = (codes > 0).astype(jnp.uint32)
    bits = jnp.pad(bits, ((0, 0), (0, w * 32 - k)))
    bits = bits.reshape(n, w, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)


def pack_codes_np(codes) -> "jnp.ndarray":
    """Host-side numpy mirror of pack_codes (bit-identical output).

    For host-resident matrices (e.g. the 1M x 291 fp32 gallery labels mAP
    eval packs), packing BEFORE any device_put transfers only the 32x
    smaller packed form — on-device packing would first ship the full fp32
    matrix (~1.1 GB) and materialize a larger uint32 bit tensor in HBM,
    exactly the cost pack_labels exists to avoid."""
    import numpy as np

    n, k = codes.shape
    w = -(-k // 32)
    bits = (np.asarray(codes) > 0).astype(np.uint32)
    bits = np.pad(bits, ((0, 0), (0, w * 32 - k)))
    shifts = np.arange(32, dtype=np.uint32)
    return (bits.reshape(n, w, 32) << shifts).sum(axis=-1, dtype=np.uint32)


def unpack_codes(packed: jax.Array, k: int) -> jax.Array:
    """[N, W] uint32 -> [N, K] ±1 int8 (inverse of pack_codes)."""
    n, w = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(n, w * 32)[:, :k]
    return (2 * bits.astype(jnp.int8) - 1).astype(jnp.int8)


def popcount32(x: jax.Array) -> jax.Array:
    """Vectorized 32-bit population count (SWAR bit tricks)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
