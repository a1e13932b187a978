"""Fused multi-head self-attention Pallas kernel for short sequences.

The CLIP towers run attention over tiny sequences (50 vision tokens, 32
text tokens — reference model/base/model.py:228-252, 359-372).  At those
sizes XLA's generic path is dominated not by FLOPs but by relayouts and
latency-bound [B*H, L, Dh] batched matmuls: on a v5e the 12-block ViT-B/32
tower spends ~half its time in per-head attention that is ~1% of its FLOPs.

The forward kernel keeps one batch-block of qkv entirely in VMEM and runs
every head's (QK^T -> masked fp32 softmax -> PV) without touching HBM in
between; the only HBM traffic is the natural-layout qkv read and the
[B, L, D] context write.  The backward is a flash-style Pallas kernel of
the same shape: it recomputes logits+softmax in VMEM and emits dq/dk/dv
in one pass (``jax.custom_vjp``), with a head-STACKED schedule — all
heads' logit/dprobs dots first, then ONE softmax+vjp elementwise chain
over the [BB, H, L, L] stack, then all output dots (measured 582 -> 343
us/call on the ViT-B/32 tower, 200 -> 136 on the text tower; the per-head
interleaving spent ~230 us in EACH of the two short VPU chains fencing
the MXU — ablations in tools/bench_attn_bwd.py).  Numerics match the XLA
formulation (fp32 logits/softmax, bf16 elsewhere; grad-parity test).

A head-pair 2-D grid variant (128-lane blocks via index maps) benches
~20% faster in isolation but ~2% slower end-to-end inside the scan —
the 1-D grid pipelines better between the surrounding matmuls, so it
stays.  Stacking the FORWARD's softmax the same way measured a wash on
the vision tower (176 vs 171 us — the fwd is at ~72% of its HBM roofline
already) and is not adopted.

Roofline (v5e, ViT-B/32 encode, B=256): each forward call must read the
59 MB qkv block and write the 20 MB context -> ~96 us of mandatory HBM
traffic at ~819 GB/s, vs ~133 us measured — the kernel runs at ~72% of
its HBM roofline and attention is ~1% of the tower FLOPs, so further
micro-optimization of this kernel is bounded at ~0.8 ms/iter (~3% of
encode).  See ROADMAP "whole-block megakernel" for the measured
speed-of-light argument for the full encode path.

On non-TPU backends (the CPU test mesh) the kernel runs in interpreter
mode automatically.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Per-core VMEM is 16 MiB on v5e; leave headroom for the pipeline's double
# buffers and the compiler's own scratch.  Block sizes are chosen so the
# blocks + softmax temporaries fit: at the CLIP towers' bf16/L=50 shapes the
# preferred block_b=16 passes untouched, while larger-L or fp32 callers
# (MITH's 64-token token-interaction stack runs fp32) scale down instead of
# dying with a scoped-vmem OOM at compile time.
_VMEM_BUDGET = 14 * 2**20

def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_b(batch: int, target: int, L: int, D3: int, itemsize: int,
                  *, backward: bool, n_head: int = 1) -> int:
    """VMEM-budget block sizing.

    The fp32 [.., L, L] softmax temporaries are PADDED in VMEM to (8, 128)
    tiles — at L=32 that is a 4x inflation — and the backward's
    head-stacked schedule (see _bwd_kernel) keeps ~5 stacked temps live at
    once (logits pieces / stacked logits / dprobs / vjp chain / casts).
    This model reproduces the compiler's scoped-vmem accounting: the text
    tower at bb=16 is reported as 7.3 MB of double-buffered blocks + 10.5 MB
    of stacked temps = 17.8 MB (OOM, measured 17.77M), while bb=8 and the
    vision tower at bb=4 fit and are the measured-fastest sizes anyway
    (tools/bench_attn_bwd.py).
    """
    D = D3 // 3
    # double-buffered in/out blocks per batch element...
    per_elem = 2 * (L * D3 + L * D + (L * D3 if backward else 0)) * itemsize
    # ...plus the tile-padded fp32 softmax temps: the backward keeps ~5
    # head-stacked [bb, H, L, L] temps live, the forward holds 2 for one
    # head at a time
    padded_ll = _ru(L, 8) * _ru(L, 128) * 4
    temp_per_elem = (5 * n_head if backward else 2) * padded_ll
    bb = max(1, min(target, batch, _VMEM_BUDGET // (per_elem + temp_per_elem)))
    while bb > 1 and batch % bb:
        bb -= 1
    return bb


def _kernel(qkv_ref, out_ref, *, n_head: int, head_dim: int, has_bias: bool,
            bias_ref=None, qkv_b_ref=None):
    D = n_head * head_dim
    qkv = qkv_ref[:]                                       # [BB, L, 3D]
    if qkv_b_ref is not None:
        # fold the qkv projection bias into the VMEM read: the caller feeds
        # the RAW x @ qkv_w product, saving the [B, L, 3D] HBM round trip a
        # standalone bias add would cost (pallas_call is an opaque fusion
        # boundary, so XLA cannot fuse the add into this kernel's input).
        qkv = qkv + qkv_b_ref[:].reshape(1, 1, 3 * D).astype(qkv.dtype)
    scale = 1.0 / math.sqrt(head_dim)
    bias = bias_ref[:].astype(jnp.float32) if has_bias else None
    for h in range(n_head):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv[:, :, sl]                                  # [BB, L, Dh]
        k = qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim]
        v = qkv[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [BB, L, L]
        logits = logits * scale
        if bias is not None:
            logits = logits + bias[None, :, :]
        probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [BB, L, Dh]
        out_ref[:, :, sl] = ctx.astype(qkv.dtype)


def _pallas_forward(qkv: jax.Array, bias: Optional[jax.Array],
                    qkv_b: Optional[jax.Array], n_head: int,
                    block_b: int) -> jax.Array:
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    bb = _pick_block_b(B, block_b, L, D3, qkv.dtype.itemsize, backward=False)
    interpret = jax.default_backend() != "tpu"

    in_specs = [pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if bias is not None:
        in_specs.append(pl.BlockSpec((L, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))
    if qkv_b is not None:
        in_specs.append(pl.BlockSpec((D3,), lambda i: (0,),
                                     memory_space=pltpu.VMEM))
        args.append(qkv_b)

    def kernel(*refs):
        qkv_ref, rest = refs[0], list(refs[1:-1])
        out_ref = refs[-1]
        bias_ref = rest.pop(0) if bias is not None else None
        qkv_b_ref = rest.pop(0) if qkv_b is not None else None
        _kernel(qkv_ref, out_ref, n_head=n_head, head_dim=head_dim,
                has_bias=bias is not None, bias_ref=bias_ref,
                qkv_b_ref=qkv_b_ref)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=interpret,
    )(*args)


def _bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, n_head: int, head_dim: int,
                has_bias: bool, bias_ref=None, qkv_b_ref=None):
    """Flash-style backward: recompute logits+softmax in VMEM, emit dq/dk/dv
    — no [B, H, L, L] HBM traffic and none of the latency-bound XLA
    relayouts of the naive vjp.

    Head-STACKED schedule: phase 1 runs every head's logits + dprobs dots
    (MXU), phase 2 runs ONE softmax + softmax-vjp elementwise/reduce chain
    over the whole [BB, H, L, L] stack (VPU), phase 3 runs the dq/dk/dv
    dots + stores.  A per-head loop interleaves 12 short VPU chains between
    the dots and each chain fences the MXU: ablations attribute ~230 us of
    the ViT-B/32 call to EACH of the two chains, and stacking them measured
    582 -> 343 us/call (text tower 200 -> 136); see tools/bench_attn_bwd.py.
    """
    D = n_head * head_dim
    qkv = qkv_ref[:]                                       # [BB, L, 3D]
    if qkv_b_ref is not None:
        # recompute with the folded projection bias (matches the forward);
        # d(raw qkv) == d(qkv + b), so dqkv_ref needs no adjustment and the
        # bias cotangent is a cheap XLA reduction outside the kernel.
        qkv = qkv + qkv_b_ref[:].reshape(1, 1, 3 * D).astype(qkv.dtype)
    g = g_ref[:]                                           # [BB, L, D]
    scale = 1.0 / math.sqrt(head_dim)
    bias = bias_ref[:].astype(jnp.float32) if has_bias else None

    def head_slices(h):
        return (qkv[:, :, h * head_dim:(h + 1) * head_dim],
                qkv[:, :, D + h * head_dim : D + (h + 1) * head_dim],
                qkv[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim],
                g[:, :, h * head_dim:(h + 1) * head_dim])

    # phase 1: all heads' logits and dprobs = g @ v^T (MXU only)
    logits_l, dprobs_l = [], []
    for h in range(n_head):
        q, k, v, g_h = head_slices(h)
        logits_l.append(jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))           # [BB, Lq, Lk]
        dprobs_l.append(jax.lax.dot_general(
            g_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))           # [BB, Lq, Lk]
    logits = jnp.stack(logits_l, axis=1) * scale           # [BB, H, Lq, Lk]
    if bias is not None:
        logits = logits + bias[None, None, :, :]
    dprobs = jnp.stack(dprobs_l, axis=1)

    # phase 2: one softmax + softmax-vjp chain over the whole stack (VPU)
    probs = jax.nn.softmax(logits, axis=-1)                # f32
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    probs_c = probs.astype(qkv.dtype)
    dlogits_c = (dlogits * scale).astype(qkv.dtype)

    # phase 3: output dots + stores (MXU)
    for h in range(n_head):
        q, k, v, g_h = head_slices(h)
        dq = jax.lax.dot_general(
            dlogits_c[:, h], k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [BB, Lq, Dh]
        dk = jax.lax.dot_general(
            dlogits_c[:, h], q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [BB, Lk, Dh]
        # dv = probs^T @ g  (contract over the query axis)
        dv = jax.lax.dot_general(
            probs_c[:, h], g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [BB, Lk, Dh]
        dqkv_ref[:, :, h * head_dim:(h + 1) * head_dim] = dq.astype(qkv.dtype)
        dqkv_ref[:, :, D + h * head_dim : D + (h + 1) * head_dim] = dk.astype(qkv.dtype)
        dqkv_ref[:, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim] = dv.astype(qkv.dtype)


def _pallas_backward(qkv: jax.Array, bias: Optional[jax.Array],
                     qkv_b: Optional[jax.Array], g: jax.Array,
                     n_head: int, block_b: int) -> jax.Array:
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    bb = _pick_block_b(B, block_b, L, D3, qkv.dtype.itemsize, backward=True,
                       n_head=n_head)
    interpret = jax.default_backend() != "tpu"
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
    if qkv_b is not None:
        in_specs.append(pl.BlockSpec((D3,), lambda i: (0,),
                                     memory_space=pltpu.VMEM))
        args.append(qkv_b)

    def kernel(*refs):
        qkv_ref, g_ref, rest = refs[0], refs[1], list(refs[2:-1])
        dqkv_ref = refs[-1]
        bias_ref = rest.pop(0) if bias is not None else None
        qkv_b_ref = rest.pop(0) if qkv_b is not None else None
        _bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_head=n_head,
                    head_dim=head_dim, has_bias=bias is not None,
                    bias_ref=bias_ref, qkv_b_ref=qkv_b_ref)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, L, D3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D3), qkv.dtype),
        interpret=interpret,
    )(*args)


def _xla_attention(qkv: jax.Array, bias: Optional[jax.Array], n_head: int) -> jax.Array:
    """Reference formulation (identical math, used for the backward pass)."""
    B, L, D3 = qkv.shape
    D = D3 // 3
    head_dim = D // n_head
    x = qkv.reshape(B, L, 3, n_head, head_dim)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]           # [B, L, H, Dh]
    logits = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32)                # [B, H, L, L]
    logits = logits * (1.0 / math.sqrt(head_dim))
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    ctx = jax.lax.dot_general(
        probs, v, (((3,), (1,)), ((0, 1), (0, 2))))        # [B, H, L, Dh]
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(qkv, bias, qkv_b, n_head, block_b):
    return _pallas_forward(qkv, bias, qkv_b, n_head, block_b)


def _fwd(qkv, bias, qkv_b, n_head, block_b):
    return _pallas_forward(qkv, bias, qkv_b, n_head, block_b), (qkv, bias, qkv_b)


def _bwd(n_head, block_b, res, g):
    qkv, bias, qkv_b = res
    d_qkv = _pallas_backward(qkv, bias, qkv_b, g, n_head, block_b)
    # the folded projection bias enters as qkv + b, so its cotangent is the
    # (B, L) reduction of d_qkv — one cheap XLA reduce, no extra kernel.
    d_qkv_b = (None if qkv_b is None
               else jnp.sum(d_qkv, axis=(0, 1)).astype(qkv_b.dtype))
    # attention-mask bias enters through the public wrapper's stop_gradient,
    # so no real tangent can reach this cotangent — the zero is exact.
    d_bias = None if bias is None else jnp.zeros_like(bias)
    return d_qkv, d_bias, d_qkv_b


_fused_attention.defvjp(_fwd, _bwd)


def fused_attention(
    qkv: jax.Array,                  # [B, L, 3D] packed q|k|v (post qkv matmul)
    bias: Optional[jax.Array],       # [L, L] additive fp32 mask or None
    n_head: int,
    block_b: int = 16,               # batch elems per program.  MEASURED on
                                     # v5e (bf16 ViT-B/32 encode): 16 ->
                                     # 11.9k pairs/s, 8 -> 11.5k, 32 ->
                                     # 0.47k (VMEM spill); keep 16.
    qkv_b: Optional[jax.Array] = None,  # [3D] qkv projection bias, folded
                                     # into the VMEM read (pass the RAW
                                     # x @ qkv_w product as ``qkv`` then) —
                                     # saves the [B, L, 3D] HBM round trip
                                     # of a standalone bias add.  Fully
                                     # differentiable (reduce-sum cotangent).
) -> jax.Array:                      # [B, L, D] heads concatenated
    """Fused multi-head attention (Pallas fwd + bwd kernels).

    ``bias`` is NON-DIFFERENTIABLE by contract: it is an attention *mask*
    (causal / key-padding), and the backward kernel does not compute a bias
    cotangent.  ``stop_gradient`` here makes that explicit — a future
    trainable 2-D bias routed into this path gets its gradient severed at
    this visible boundary instead of silently receiving a fabricated zero
    from the VJP; route trainable biases through the XLA path instead
    (clip/model.py multi_head_attention, need_weights=True form).
    """
    if bias is not None:
        bias = jax.lax.stop_gradient(bias)
    return _fused_attention(qkv, bias, qkv_b, n_head, block_b)
