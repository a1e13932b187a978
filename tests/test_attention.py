"""Fused Pallas attention vs the XLA formulation: forward + grad parity.

On the CPU test mesh the kernel runs in interpreter mode; the same code
path compiles with Mosaic on TPU (bench.py exercises that).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.ops.attention import _xla_attention, fused_attention
from ccmh.clip.model import causal_mask


@pytest.mark.parametrize("B,L,D,H", [(4, 50, 96, 12), (6, 32, 64, 8), (3, 5, 32, 2)])
def test_forward_parity(B, L, D, H):
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, L, 3 * D), jnp.float32)
    out = fused_attention(qkv, None, H)
    ref = _xla_attention(qkv, None, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_parity_causal_bias():
    rng = np.random.RandomState(1)
    B, L, D, H = 4, 32, 64, 8
    qkv = jnp.asarray(rng.randn(B, L, 3 * D), jnp.float32)
    bias = causal_mask(L)
    out = fused_attention(qkv, bias, H)
    ref = _xla_attention(qkv, bias, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_parity_bf16():
    rng = np.random.RandomState(2)
    B, L, D, H = 4, 50, 96, 12
    qkv = jnp.asarray(rng.randn(B, L, 3 * D), jnp.bfloat16)
    out = fused_attention(qkv, None, H)
    ref = _xla_attention(qkv, None, H)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_folded_qkv_bias_parity_and_grads():
    """qkv_b folded into the kernel == adding it before the call, for the
    forward AND both cotangents (d_qkv and the reduce-sum d_qkv_b)."""
    rng = np.random.RandomState(7)
    B, L, D, H = 3, 18, 48, 4
    qkv = jnp.asarray(rng.randn(B, L, 3 * D), jnp.float32)
    b = jnp.asarray(rng.randn(3 * D), jnp.float32)
    bias = causal_mask(L)

    out = fused_attention(qkv, bias, H, qkv_b=b)
    ref = _xla_attention(qkv + b, bias, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def f_fold(a, bb):
        return jnp.sum(jnp.tanh(fused_attention(a, bias, H, qkv_b=bb)))

    def f_ref(a, bb):
        return jnp.sum(jnp.tanh(_xla_attention(a + bb, bias, H)))

    g1 = jax.grad(f_fold, argnums=(0, 1))(qkv, b)
    g2 = jax.grad(f_ref, argnums=(0, 1))(qkv, b)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("B,L,D,H", [
    (2, 10, 32, 4),    # baseline tiny
    (3, 7, 48, 3),     # odd L, odd head count, head_dim 16
    (2, 77, 512, 8),   # max text context length at production width
])
def test_grad_matches_xla(B, L, D, H):
    """custom_vjp backward == differentiating the XLA reference directly."""
    rng = np.random.RandomState(3)
    qkv = jnp.asarray(rng.randn(B, L, 3 * D), jnp.float32)
    bias = causal_mask(L)

    g1 = jax.grad(lambda a: jnp.sum(jnp.tanh(fused_attention(a, bias, H))))(qkv)
    g2 = jax.grad(lambda a: jnp.sum(jnp.tanh(_xla_attention(a, bias, H))))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "B,L,D,H,use_bias",
    [(2, 50, 768, 12, False),   # ViT-B/32 vision tower layout
     (2, 32, 512, 8, True)])    # text tower layout (causal bias)
def test_grad_matches_xla_tower_layouts(B, L, D, H, use_bias):
    """Backward parity at the PRODUCTION tower head-counts/widths: the
    head-stacked bwd schedule's three phases scale with n_head, so the tiny
    H=4 case alone doesn't pin the stacking/unstacking index arithmetic."""
    rng = np.random.RandomState(5)
    qkv = jnp.asarray(rng.randn(B, L, 3 * D) * 0.3, jnp.float32)
    bias = causal_mask(L) if use_bias else None

    g1 = jax.grad(lambda a: jnp.sum(jnp.tanh(fused_attention(a, bias, H))))(qkv)
    g2 = jax.grad(lambda a: jnp.sum(jnp.tanh(_xla_attention(a, bias, H))))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5, rtol=1e-4)


def test_pick_block_b_vmem_model():
    """The block-sizing model must (a) reproduce the measured compile-time
    fits on v5e — text-tower backward OOMs at bb=16 (compiler reported
    17.77 MiB) and lands on 8, vision backward lands on 4 — and (b) never
    model past the budget or pick a non-divisor block."""
    from ccmh.ops.attention import _VMEM_BUDGET, _pick_block_b, _ru

    # measured anchors (bf16 towers, batch 256, preferred target 16)
    assert _pick_block_b(256, 16, 50, 3 * 768, 2, backward=True, n_head=12) == 4
    assert _pick_block_b(256, 16, 32, 3 * 512, 2, backward=True, n_head=8) == 8
    # forward keeps the preferred block at tower shapes
    assert _pick_block_b(256, 16, 50, 3 * 768, 2, backward=False) == 16

    for batch in (7, 64, 256, 300):
        for L in (5, 32, 50, 64, 77):
            for D in (64, 512, 768):
                for itemsize, backward, H in ((2, True, 8), (4, True, 12),
                                              (4, False, 1), (2, False, 1)):
                    bb = _pick_block_b(batch, 16, L, 3 * D, itemsize,
                                       backward=backward, n_head=H)
                    assert 1 <= bb <= batch and batch % bb == 0
                    per_elem = 2 * (L * 3 * D + L * D
                                    + (L * 3 * D if backward else 0)) * itemsize
                    temps = (5 * H if backward else 2) * _ru(L, 8) * _ru(L, 128) * 4
                    assert bb == 1 or bb * (per_elem + temps) <= _VMEM_BUDGET


def test_model_fused_equals_xla_tower():
    """Full tiny-CLIP forward: fused vs xla attention implementations."""
    from ccmh.clip import model as M

    cfg = M.ClipConfig.tiny()
    params = M.init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.randn(2, cfg.image_resolution, cfg.image_resolution, 3),
                         jnp.float32)
    ids = np.zeros((2, 16), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:8] = rng.randint(320, 40000, (2, 7))
    ids[:, 8] = 49407
    ids = jnp.asarray(ids)

    M.set_attn_impl("xla")
    img_ref = M.encode_image(params, cfg, images)
    txt_ref = M.encode_text(params, cfg, ids)
    M.set_attn_impl("fused")
    try:
        img = M.encode_image(params, cfg, images)
        txt = M.encode_text(params, cfg, ids)
    finally:
        M.set_attn_impl("fused")
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(txt), np.asarray(txt_ref), atol=2e-5, rtol=1e-4)
