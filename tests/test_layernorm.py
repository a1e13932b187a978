"""Fused LayerNorm Pallas kernels (ops/layernorm.py): forward + VJP parity
against the plain XLA formulation (clip/model.py layer_norm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.clip.model import layer_norm
from ccmh.ops.layernorm import fused_add_layer_norm, fused_layer_norm

rng = np.random.RandomState(0)
B, L, W = 4, 6, 128


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_parity(dtype):
    x = jnp.asarray(rng.randn(B, L, W), dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(W), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(W), jnp.float32)
    got = fused_layer_norm(x, scale, bias)
    want = layer_norm(x, scale, bias)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-6 if dtype == jnp.float32 else 2e-2)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_add_forward_parity(dtype):
    x = jnp.asarray(rng.randn(B, L, W), dtype)
    d = jnp.asarray(rng.randn(B, L, W), dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(W), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(W), jnp.float32)
    y, s = fused_add_layer_norm(x, d, scale, bias)
    np.testing.assert_array_equal(np.asarray(s, np.float32),
                                  np.asarray(x + d, np.float32))
    want = layer_norm(x + d, scale, bias)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-6 if dtype == jnp.float32 else 2e-2)


def test_grad_parity():
    x = jnp.asarray(rng.randn(B, L, W), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(W), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(W), jnp.float32)
    t = jnp.asarray(rng.randn(B, L, W), jnp.float32)

    def loss_ref(x, scale, bias):
        return jnp.sum(layer_norm(x, scale, bias) * t)

    def loss_fused(x, scale, bias):
        return jnp.sum(fused_layer_norm(x, scale, bias) * t)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=1e-5)


def test_add_grad_parity():
    """Both outputs carry cotangents — the residual stream continues through
    s while y feeds the block body (exactly the transformer pattern)."""
    x = jnp.asarray(rng.randn(B, L, W), jnp.float32)
    d = jnp.asarray(rng.randn(B, L, W), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(W), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(W), jnp.float32)
    t1 = jnp.asarray(rng.randn(B, L, W), jnp.float32)
    t2 = jnp.asarray(rng.randn(B, L, W), jnp.float32)

    def loss_ref(x, d, scale, bias):
        s = x + d
        return jnp.sum(layer_norm(s, scale, bias) * t1) + jnp.sum(s * s * t2)

    def loss_fused(x, d, scale, bias):
        y, s = fused_add_layer_norm(x, d, scale, bias)
        return jnp.sum(y * t1) + jnp.sum(s * s * t2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, d, scale, bias)
    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, d, scale, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=1e-5)


def test_ragged_row_blocks():
    """Row counts with poor divisors still work (block picker)."""
    x = jnp.asarray(rng.randn(7, 13, W), jnp.float32)  # 91 rows -> rb=91? 13? 7
    scale = jnp.ones((W,), jnp.float32)
    bias = jnp.zeros((W,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused_layer_norm(x, scale, bias)),
        np.asarray(layer_norm(x, scale, bias)), atol=1e-6)


def test_model_integration_fused_equals_xla(monkeypatch):
    """The _block wiring with fused LN (forced on, interpret mode) matches
    the XLA path: forward and grads on a tiny vision tower."""
    import ccmh.clip.model as model

    cfg = model.ClipConfig.tiny()
    params = model.init_clip_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        rng.randn(2, cfg.image_resolution, cfg.image_resolution, 3),
        jnp.float32)

    def loss(p):
        return jnp.sum(model.vision_forward(p["visual"], cfg, x).pooled ** 2)

    monkeypatch.setattr(model, "_use_fused_ln", lambda: False)
    v0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(model, "_use_fused_ln", lambda: True)
    v1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
