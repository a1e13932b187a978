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


def test_grad_matches_xla():
    """custom_vjp backward == differentiating the XLA reference directly."""
    rng = np.random.RandomState(3)
    B, L, D, H = 2, 10, 32, 4
    qkv = jnp.asarray(rng.randn(B, L, 3 * D), jnp.float32)
    bias = causal_mask(L)

    g1 = jax.grad(lambda a: jnp.sum(jnp.tanh(fused_attention(a, bias, H))))(qkv)
    g2 = jax.grad(lambda a: jnp.sum(jnp.tanh(_xla_attention(a, bias, H))))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-4)


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
