"""Microbench: attention-backward Pallas kernel variants at the CLIP tower shapes.

profile_step.py attributes ~9.4 ms of the 77 ms DSPH step to the
attention-backward kernels vs a ~4.1 ms HBM roofline — the single biggest
above-floor item.  This script times candidate formulations in isolation:

  v0[bb]   the shipped per-head-loop kernel (ops/attention.py) at forced
           batch-block sizes
  v1[bb]   merged-rows block-diagonal: flatten (bb, L) -> R rows, add a
           [R, R] block-diagonal -1e9 mask, so all five per-head dots
           become plain 2-D matmuls of MXU-friendly size (R ~ 200-400)
           at a bb-fold FLOP inflation
  v2[bb]   head-pair 2-D grid: grid (B/bb, H/2), 128-lane blocks via a
           [B, L, 3, H, Dh] reshape view — more programs, smaller ones
  xla      jax.vjp of the reference XLA formulation (context)

Timing: loops of 4 and 24 chained calls (g fed from the previous dqkv to
defeat loop-invariant hoisting), (t24 - t4) / 20 per call.  Run on the
real chip:  python tools/bench_attn_bwd.py
"""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from ccmh.ops.attention import _pallas_backward, _xla_attention  # noqa: E402

HBM_GBPS = 819e9


# -------------------------------------------------- parametric ablation kernel
def _bwd_kernel_x(qkv_ref, g_ref, dqkv_ref, *, n_head: int, head_dim: int,
                  has_bias: bool, bias_ref=None, mode: str = "full"):
    """Copy of the shipped bwd kernel with ablation/variant switches:

    mode = "full"       shipped math
           "nosoftmax"  probs = logits * 0.01 (skip max/exp/sum/div passes)
           "novjp"      dlogits = dprobs (skip the softmax-vjp elementwise)
           "fewstores"  emit only dq's store (12 stores instead of 36)
           "bf16vjp"    softmax-vjp chain in bf16 instead of f32
           "pair"       process heads in 128-lane-aligned PAIRS (all slices
                        and stores at even-128 lane offsets; dots batched
                        over (bb, 2))
    """
    D = n_head * head_dim
    qkv = qkv_ref[:]
    g = g_ref[:]
    scale = 1.0 / math.sqrt(head_dim)
    bias = bias_ref[:].astype(jnp.float32) if has_bias else None

    if mode == "pair":
        BB, L, _ = qkv.shape
        for hp in range(n_head // 2):
            sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)
            q = qkv[:, :, sl].reshape(BB, L, 2, head_dim)
            k = qkv[:, :, D + hp * 2 * head_dim : D + (hp + 1) * 2 * head_dim
                    ].reshape(BB, L, 2, head_dim)
            v = qkv[:, :, 2 * D + hp * 2 * head_dim : 2 * D + (hp + 1) * 2 * head_dim
                    ].reshape(BB, L, 2, head_dim)
            g_h = g[:, :, sl].reshape(BB, L, 2, head_dim)
            logits = jax.lax.dot_general(
                q, k, (((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32) * scale    # [BB, 2, L, L]
            if bias is not None:
                logits = logits + bias[None, None, :, :]
            probs = jax.nn.softmax(logits, axis=-1)
            probs_c = probs.astype(qkv.dtype)
            dv = jax.lax.dot_general(
                probs_c, g_h, (((2,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32)            # [BB, 2, L, Dh]
            dprobs = jax.lax.dot_general(
                g_h, v, (((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32)            # [BB, 2, L, L]
            dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                                keepdims=True))
            dlogits_c = (dlogits * scale).astype(qkv.dtype)
            dq = jax.lax.dot_general(
                dlogits_c, k, (((3,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32)            # [BB, 2, L, Dh]
            dk = jax.lax.dot_general(
                dlogits_c, q, (((2,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32)
            # [BB, 2, L, Dh] -> [BB, L, 2*Dh] stores at 128-aligned offsets
            dqkv_ref[:, :, sl] = dq.transpose(0, 2, 1, 3).reshape(
                BB, L, 2 * head_dim).astype(qkv.dtype)
            dqkv_ref[:, :, D + hp * 2 * head_dim : D + (hp + 1) * 2 * head_dim] = (
                dk.transpose(0, 2, 1, 3).reshape(BB, L, 2 * head_dim)
                .astype(qkv.dtype))
            dqkv_ref[:, :, 2 * D + hp * 2 * head_dim : 2 * D + (hp + 1) * 2 * head_dim] = (
                dv.transpose(0, 2, 1, 3).reshape(BB, L, 2 * head_dim)
                .astype(qkv.dtype))
        return

    if mode == "stacked":
        # phase 1: ALL heads' logits + dprobs dots (MXU), stacked; phase 2:
        # ONE softmax + softmax-vjp elementwise/reduce chain over the whole
        # [BB, H, L, L] stack; phase 3: all output dots + stores.  Replaces
        # 12 short serial VPU chains (each fencing the MXU) with one long one.
        BB, L, _ = qkv.shape
        logits_l, dprobs_l = [], []
        for h in range(n_head):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = qkv[:, :, sl]
            k = qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim]
            v = qkv[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
            g_h = g[:, :, sl]
            logits_l.append(jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
            dprobs_l.append(jax.lax.dot_general(
                g_h, v, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        logits = jnp.stack(logits_l, axis=1) * scale       # [BB, H, L, L] f32
        if bias is not None:
            logits = logits + bias[None, None, :, :]
        dprobs = jnp.stack(dprobs_l, axis=1)
        probs = jax.nn.softmax(logits, axis=-1)
        dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                            keepdims=True))
        probs_c = probs.astype(qkv.dtype)
        dlogits_c = (dlogits * scale).astype(qkv.dtype)
        for h in range(n_head):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = qkv[:, :, sl]
            k = qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim]
            g_h = g[:, :, sl]
            dqkv_ref[:, :, sl] = jax.lax.dot_general(
                dlogits_c[:, h], k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(qkv.dtype)
            dqkv_ref[:, :, D + h * head_dim : D + (h + 1) * head_dim] = (
                jax.lax.dot_general(
                    dlogits_c[:, h], q, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(qkv.dtype))
            dqkv_ref[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim] = (
                jax.lax.dot_general(
                    probs_c[:, h], g_h, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(qkv.dtype))
        return

    for h in range(n_head):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv[:, :, sl]
        k = qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim]
        v = qkv[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
        g_h = g[:, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias[None, :, :]
        if mode == "nomax":
            e = jnp.exp(logits)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
        elif mode == "nosoftmax":
            probs = logits * 0.01
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        probs_c = probs.astype(qkv.dtype)
        dv = jax.lax.dot_general(
            probs_c, g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dprobs = jax.lax.dot_general(
            g_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if mode == "novjp":
            dlogits = dprobs
        elif mode == "bf16vjp":
            p16, dp16 = probs_c, dprobs.astype(qkv.dtype)
            dlogits = p16 * (dp16 - jnp.sum(dp16 * p16, axis=-1,
                                            keepdims=True).astype(qkv.dtype))
        else:
            dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                                keepdims=True))
        dlogits_c = (dlogits * scale).astype(qkv.dtype)
        dq = jax.lax.dot_general(
            dlogits_c, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if mode == "fewstores":
            dqkv_ref[:, :, D + h * head_dim : D + (h + 1) * head_dim] = (
                dq.astype(qkv.dtype))
            continue
        dk = jax.lax.dot_general(
            dlogits_c, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, sl] = dq.astype(qkv.dtype)
        dqkv_ref[:, :, D + h * head_dim : D + (h + 1) * head_dim] = dk.astype(qkv.dtype)
        dqkv_ref[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim] = (
            dv.astype(qkv.dtype))


def backward_x(qkv, bias, g, n_head, bb, mode):
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    g = g.astype(qkv.dtype)
    in_specs = [
        pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qkv, g]
    if bias is not None:
        in_specs.append(pl.BlockSpec((L, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))

    def kernel(*refs):
        bias_ref = refs[2] if bias is not None else None
        _bwd_kernel_x(refs[0], refs[1], refs[-1], n_head=n_head,
                      head_dim=head_dim, has_bias=bias is not None,
                      bias_ref=bias_ref, mode=mode)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D3), qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)


# -------------------------------------------------- stacked FORWARD kernel
def _fwd_kernel_stacked(qkv_ref, bias_ref, out_ref, *, n_head: int,
                        head_dim: int, has_bias: bool):
    D = n_head * head_dim
    qkv = qkv_ref[:]
    scale = 1.0 / math.sqrt(head_dim)
    logits_l = []
    for h in range(n_head):
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim]
        logits_l.append(jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    logits = jnp.stack(logits_l, axis=1) * scale           # [BB, H, L, L]
    if has_bias:
        logits = logits + bias_ref[:].astype(jnp.float32)[None, None, :, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    for h in range(n_head):
        v = qkv[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = jax.lax.dot_general(
            probs[:, h], v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(qkv.dtype)


def forward_stacked(qkv, bias, n_head, bb):
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    in_specs = [pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if bias is not None:
        in_specs.append(pl.BlockSpec((L, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))

    def kernel(*refs):
        bias_ref = refs[1] if bias is not None else None
        _fwd_kernel_stacked(refs[0], bias_ref, refs[-1], n_head=n_head,
                            head_dim=head_dim, has_bias=bias is not None)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)


# -------------------------------------------------- saved-probs (no recompute)
def _bwd_kernel_savedp(qkv_ref, g_ref, probs_ref, dqkv_ref, *, n_head: int,
                       head_dim: int):
    D = n_head * head_dim
    qkv = qkv_ref[:]
    g = g_ref[:]
    scale = 1.0 / math.sqrt(head_dim)
    for h in range(n_head):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv[:, :, sl]
        k = qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim]
        v = qkv[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
        g_h = g[:, :, sl]
        probs_c = probs_ref[:, h]                          # [BB, L, L] bf16
        probs = probs_c.astype(jnp.float32)
        dv = jax.lax.dot_general(
            probs_c, g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dprobs = jax.lax.dot_general(
            g_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                            keepdims=True))
        dlogits_c = (dlogits * scale).astype(qkv.dtype)
        dq = jax.lax.dot_general(
            dlogits_c, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            dlogits_c, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, sl] = dq.astype(qkv.dtype)
        dqkv_ref[:, :, D + h * head_dim : D + (h + 1) * head_dim] = dk.astype(qkv.dtype)
        dqkv_ref[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim] = (
            dv.astype(qkv.dtype))


def backward_savedp(qkv, bias, g, n_head, bb):
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    g = g.astype(qkv.dtype)
    # recompute probs OUTSIDE the timed kernel path would be cheating for
    # end-to-end adoption (fwd would have to write them), but for this
    # microbench the probs input is a constant of the chained loop -> only
    # its HBM read is timed, which is exactly the adoption cost model.
    x = qkv.reshape(B, L, 3, n_head, head_dim)
    q, k = x[:, :, 0], x[:, :, 1]
    logits = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32) * (1.0 / math.sqrt(head_dim))
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)  # [B, H, L, L]

    def kernel(qkv_ref, g_ref, probs_ref, out_ref):
        _bwd_kernel_savedp(qkv_ref, g_ref, probs_ref, out_ref,
                           n_head=n_head, head_dim=head_dim)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n_head, L, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D3), qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qkv, g, probs)


# ---------------------------------------------------------------- v1: merged rows
def _bwd_kernel_merged(qkv_ref, g_ref, mask_ref, dqkv_ref, *, n_head: int,
                       head_dim: int, bb: int, L: int):
    D = n_head * head_dim
    R = bb * L
    qkv = qkv_ref[:].reshape(R, 3 * D)
    g = g_ref[:].reshape(R, D)
    mask = mask_ref[:]                                     # [R, R] f32
    scale = 1.0 / math.sqrt(head_dim)
    for h in range(n_head):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv[:, sl]
        k = qkv[:, D + h * head_dim : D + (h + 1) * head_dim]
        v = qkv[:, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
        g_h = g[:, sl]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + mask   # [R, R]
        probs = jax.nn.softmax(logits, axis=-1)            # off-block -> 0
        probs_c = probs.astype(qkv.dtype)

        dv = jax.lax.dot_general(
            probs_c, g_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [R, Dh]
        dprobs = jax.lax.dot_general(
            g_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [R, R] (garbage off-block)
        dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                            keepdims=True))
        dlogits_c = (dlogits * scale).astype(qkv.dtype)    # off-block exactly 0
        dq = jax.lax.dot_general(
            dlogits_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            dlogits_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, sl] = dq.reshape(bb, L, head_dim).astype(qkv.dtype)
        dqkv_ref[:, :, D + h * head_dim : D + (h + 1) * head_dim] = (
            dk.reshape(bb, L, head_dim).astype(qkv.dtype))
        dqkv_ref[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim] = (
            dv.reshape(bb, L, head_dim).astype(qkv.dtype))


def backward_merged(qkv, bias, g, n_head, bb):
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    R = bb * L
    # block-diagonal mask: in-block = bias (or 0), off-block = -1e9
    blk = np.zeros((L, L), np.float32) if bias is None else np.asarray(bias, np.float32)
    mask = np.full((R, R), -1e9, np.float32)
    for i in range(bb):
        mask[i * L:(i + 1) * L, i * L:(i + 1) * L] = blk
    mask = jnp.asarray(mask)
    g = g.astype(qkv.dtype)

    kernel = functools.partial(_bwd_kernel_merged, n_head=n_head,
                               head_dim=head_dim, bb=bb, L=L)
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D3), qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qkv, g, mask)


# ---------------------------------------------------------------- v2: head-pair grid
def _bwd_kernel_headpair(qkv_ref, g_ref, bias_ref, dqkv_ref, *, head_dim: int,
                         has_bias: bool):
    # blocks: qkv [bb, L, 3, 2, Dh], g [bb, L, 2, Dh] -> two heads per program
    scale = 1.0 / math.sqrt(head_dim)
    bias = bias_ref[:].astype(jnp.float32) if has_bias else None
    for hh in range(2):
        q = qkv_ref[:, :, 0, hh, :]
        k = qkv_ref[:, :, 1, hh, :]
        v = qkv_ref[:, :, 2, hh, :]
        g_h = g_ref[:, :, hh, :]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias[None, :, :]
        probs = jax.nn.softmax(logits, axis=-1)
        probs_c = probs.astype(q.dtype)
        dv = jax.lax.dot_general(
            probs_c, g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dprobs = jax.lax.dot_general(
            g_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                            keepdims=True))
        dlogits_c = (dlogits * scale).astype(q.dtype)
        dqkv_ref[:, :, 0, hh, :] = jax.lax.dot_general(
            dlogits_c, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(q.dtype)
        dqkv_ref[:, :, 1, hh, :] = jax.lax.dot_general(
            dlogits_c, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(q.dtype)
        dqkv_ref[:, :, 2, hh, :] = dv.astype(q.dtype)


def backward_headpair(qkv, bias, g, n_head, bb):
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    qkv5 = qkv.reshape(B, L, 3, n_head, head_dim)
    g4 = g.astype(qkv.dtype).reshape(B, L, n_head, head_dim)
    args = [qkv5, g4]
    in_specs = [
        pl.BlockSpec((bb, L, 3, 2, head_dim), lambda i, h: (i, 0, 0, h, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, L, 2, head_dim), lambda i, h: (i, 0, h, 0),
                     memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        in_specs.append(pl.BlockSpec((L, L), lambda i, h: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))

    def kernel(*refs):
        qkv_ref, g_ref = refs[0], refs[1]
        bias_ref = refs[2] if bias is not None else None
        _bwd_kernel_headpair(qkv_ref, g_ref, bias_ref, refs[-1],
                             head_dim=head_dim, has_bias=bias is not None)

    out = pl.pallas_call(
        kernel,
        grid=(B // bb, n_head // 2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, L, 3, 2, head_dim),
                               lambda i, h: (i, 0, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, 3, n_head, head_dim), qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out.reshape(B, L, D3)


# ---------------------------------------------------------------- timing
def time_variant(name, fn, qkv, bias, n_head, check_against=None, chain=None):
    """fn(qkv, bias, g) -> dqkv.  Chain g from the previous dqkv slice.

    Sync point is a float() fetch of a scalar (block_until_ready is
    unreliable on the relay); per-call = min over repeats of
    (t24 - t4) / 20 to cancel constant dispatch overhead.
    """
    B, L, D3 = qkv.shape
    D = D3 // 3
    if chain is None:
        chain = lambda d: d[:, :, D:2 * D]  # feed dk as next g: defeats hoisting

    def loop(qkv, g0, n):
        def body(_, g):
            return chain(fn(qkv, bias, g))
        g = jax.lax.fori_loop(0, n, body, g0)
        return g, jnp.sum(g[0, 0].astype(jnp.float32))

    g0 = jnp.ones((B, L, D), qkv.dtype) * 0.01
    # iteration counts sized so the (large - small) delta is >= ~100 ms of
    # device time: the relay's host round trip is ~200 ms with +/-20% jitter,
    # so small deltas are pure noise (a 24-vs-4 loop measured NEGATIVE times)
    N_SMALL, N_LARGE = 40, 240
    try:
        f_chk = jax.jit(functools.partial(loop, n=4))
        f_s = jax.jit(functools.partial(loop, n=N_SMALL))
        f_l = jax.jit(functools.partial(loop, n=N_LARGE))
        r, s = f_chk(qkv, g0)
        float(s)
        if check_against is not None:
            err = float(jnp.max(jnp.abs(r.astype(jnp.float32)
                                        - check_against.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(check_against.astype(jnp.float32)))) + 1e-9
            assert err / scale < 3e-2, f"{name}: rel err {err/scale:.3e}"
        float(f_s(qkv, g0)[1]); float(f_l(qkv, g0)[1])
        best = None
        for _ in range(3):
            t0 = time.perf_counter(); float(f_s(qkv, g0)[1])
            t1 = time.perf_counter(); float(f_l(qkv, g0)[1])
            t2 = time.perf_counter()
            per_call = ((t2 - t1) - (t1 - t0)) / (N_LARGE - N_SMALL)
            best = per_call if best is None else min(best, per_call)
        print(f"  {name:34s} {best*1e6:8.1f} us/call", flush=True)
        return best, r
    except Exception as e:  # noqa: BLE001 — report and move on (VMEM OOM etc.)
        print(f"  {name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None, None


def run_shape(tag, B, L, D, H, with_bias):
    D3 = 3 * D
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, L, D3) * 0.05, jnp.bfloat16)
    bias = None
    if with_bias:
        m = np.triu(np.full((L, L), -1e9, np.float32), 1)
        bias = jnp.asarray(m)
    traffic = (B * L * D3 * 2) * 2 + B * L * D * 2   # read qkv + write dqkv + read g
    print(f"[{tag}] B={B} L={L} D={D} H={H} bias={with_bias}  "
          f"HBM floor {traffic/HBM_GBPS*1e6:.0f} us/call")

    # forward-kernel reference point (known ~133 us on vision from the
    # encode profile: validates the harness).  g-dependence injected through
    # the tiny [L, L] bias input (vanishing magnitude) so the call cannot be
    # hoisted out of the loop without a full-size elementwise pass.
    from ccmh.ops.attention import _pallas_forward

    def fwd_fn(q, b, g):
        b2 = g[0, :, :L].astype(jnp.float32) * 1e-30
        if b is not None:
            b2 = b2 + b
        return _pallas_forward(q, b2, None, H, 16)

    time_variant("fwd kernel (harness check)", fwd_fn, qkv, bias, H,
                 chain=lambda d: d)

    def fwd_stacked_fn(q, b, g):
        b2 = g[0, :, :L].astype(jnp.float32) * 1e-30
        if b is not None:
            b2 = b2 + b
        return forward_stacked(q, b2, H, 16)

    time_variant("fwd stacked bb=16", fwd_stacked_fn, qkv, bias, H,
                 chain=lambda d: d)

    _, ref = time_variant("v0 shipped (auto bb)",
                          lambda q, b, g: _pallas_backward(q, b, None, g, H, 16),
                          qkv, bias, H)
    for bb in (4, 8):
        time_variant(f"stacked bb={bb}",
                     lambda q, b, g, bb=bb: backward_x(q, b, g, H, bb, "stacked"),
                     qkv, bias, H, check_against=ref)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    run_shape("vision ViT-B/32", 256, 50, 768, 12, False)
    run_shape("text", 256, 32, 512, 8, True)


if __name__ == "__main__":
    main()
