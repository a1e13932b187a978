"""Fused LayerNorm (and residual-add + LayerNorm) Pallas kernels.

XLA splits a LayerNorm into a stats pass and a normalize pass — two HBM
reads of the [B, L, W] activation — and materializes the residual add as a
third round trip before the next block's LN reads it again.  At the CLIP
towers' shapes the encode path is HBM-bound between its matmuls
(ROADMAP: ~5 ms/iter of LN/residual/elementwise traffic above the matmul
floor), so these kernels do the whole thing in one VMEM pass per row
block:

  fused_layer_norm(x, scale, bias)          -> y            (1 read, 1 write)
  fused_add_layer_norm(x, delta, scale, b)  -> (y, s=x+delta) (2 reads, 2 writes
                                                vs 3 reads + 2 writes in XLA)

Numerics match clip/model.py layer_norm exactly in structure: the residual
add happens in the input dtype (bf16 under bf16 compute), statistics and
the affine transform in fp32, output cast back.  Backward passes use the
closed-form LayerNorm VJP in plain XLA on the saved summed input — the
backward is matmul-adjacent and fuses fine there.

On non-TPU backends the kernels run in interpreter mode (CPU tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _pick_rows(rows: int, target: int = 256) -> int:
    rb = min(target, rows)
    while rb > 1 and rows % rb:
        rb -= 1
    return rb


def _stats_normalize(s32: jax.Array, scale_ref, bias_ref) -> jax.Array:
    mean = jnp.mean(s32, axis=-1, keepdims=True)
    var = jnp.var(s32, axis=-1, keepdims=True)  # same op as model layer_norm
    y = (s32 - mean) * jax.lax.rsqrt(var + EPS)
    return y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)


def _ln_kernel(x_ref, scale_ref, bias_ref, y_ref):
    y = _stats_normalize(x_ref[:].astype(jnp.float32), scale_ref, bias_ref)
    y_ref[:] = y.astype(y_ref.dtype)


def _add_ln_kernel(x_ref, d_ref, scale_ref, bias_ref, y_ref, s_ref):
    s = x_ref[:] + d_ref[:]              # residual add in the input dtype
    s_ref[:] = s
    y = _stats_normalize(s.astype(jnp.float32), scale_ref, bias_ref)
    y_ref[:] = y.astype(y_ref.dtype)


def _ln_forward(x2d: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    rows, w = x2d.shape
    rb = _pick_rows(rows)
    return pl.pallas_call(
        _ln_kernel,
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, w), x2d.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x2d, scale, bias)


def _add_ln_forward(x2d, d2d, scale, bias) -> Tuple[jax.Array, jax.Array]:
    rows, w = x2d.shape
    rb = _pick_rows(rows)
    spec = pl.BlockSpec((rb, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _add_ln_kernel,
        grid=(rows // rb,),
        in_specs=[spec, spec, vec, vec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, w), x2d.dtype),
                   jax.ShapeDtypeStruct((rows, w), x2d.dtype)),
        interpret=jax.default_backend() != "tpu",
    )(x2d, d2d, scale, bias)


def _ln_vjp(s: jax.Array, scale: jax.Array, g: jax.Array):
    """Closed-form LayerNorm backward on the (saved) normalized input."""
    s32 = s.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(s32, axis=-1, keepdims=True)
    var = jnp.mean((s32 - mean) ** 2, axis=-1, keepdims=True)
    invstd = jax.lax.rsqrt(var + EPS)
    xhat = (s32 - mean) * invstd
    dscale = jnp.sum(g32 * xhat, axis=0)
    dbias = jnp.sum(g32, axis=0)
    dxhat = g32 * scale.astype(jnp.float32)
    dx = invstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx.astype(s.dtype), dscale.astype(scale.dtype), dbias


@jax.custom_vjp
def _fused_ln2d(x2d, scale, bias):
    return _ln_forward(x2d, scale, bias)


def _fused_ln2d_fwd(x2d, scale, bias):
    return _ln_forward(x2d, scale, bias), (x2d, scale, bias)


def _fused_ln2d_bwd(res, g):
    x2d, scale, bias = res
    dx, dscale, dbias = _ln_vjp(x2d, scale, g)
    return dx, dscale, dbias.astype(bias.dtype)


_fused_ln2d.defvjp(_fused_ln2d_fwd, _fused_ln2d_bwd)


@jax.custom_vjp
def _fused_add_ln2d(x2d, d2d, scale, bias):
    return _add_ln_forward(x2d, d2d, scale, bias)


def _fused_add_ln2d_fwd(x2d, d2d, scale, bias):
    y, s = _add_ln_forward(x2d, d2d, scale, bias)
    return (y, s), (s, scale, bias)


def _fused_add_ln2d_bwd(res, gs):
    s, scale, bias = res
    gy, gsum = gs                        # cotangents of (y, s)
    dx, dscale, dbias = _ln_vjp(s, scale, gy)
    dx = dx + gsum.astype(dx.dtype)      # s = x + delta feeds both outputs
    return dx, dx, dscale, dbias.astype(bias.dtype)


_fused_add_ln2d.defvjp(_fused_add_ln2d_fwd, _fused_add_ln2d_bwd)


def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """One-pass LayerNorm over the last axis (any leading shape)."""
    shape = x.shape
    y = _fused_ln2d(x.reshape(-1, shape[-1]), scale, bias)
    return y.reshape(shape)


def fused_add_layer_norm(
    x: jax.Array, delta: jax.Array, scale: jax.Array, bias: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(LayerNorm(x + delta), x + delta) in one pass — the residual-add +
    pre-LN pattern of every transformer block."""
    shape = x.shape
    y, s = _fused_add_ln2d(
        x.reshape(-1, shape[-1]), delta.reshape(-1, shape[-1]), scale, bias)
    return y.reshape(shape), s.reshape(shape)
