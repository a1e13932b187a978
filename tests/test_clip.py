"""CLIP forward parity: ccmh functional JAX CLIP vs the reference torch CLIP.

A tiny randomly-initialized reference model's state_dict is converted with
ccmh.clip.convert and both implementations are compared on identical inputs.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.clip.model import (
    ClipConfig, init_clip_params, vision_forward, text_forward, encode_image,
    encode_text, clip_forward,
)
from ccmh.clip.convert import convert_state_dict, save_params_npz, load_params_npz
from tests.conftest import REFERENCE_ROOT, load_reference_module

torch = pytest.importorskip("torch")

TINY = ClipConfig.tiny()


def build_ref_clip():
    mod = load_reference_module("model/base/model.py")
    torch.manual_seed(0)
    model = mod.CLIP(
        embed_dim=TINY.embed_dim,
        image_resolution=TINY.image_resolution,
        vision_layers=TINY.vision_layers,
        vision_width=TINY.vision_width,
        vision_patch_size=TINY.vision_patch_size,
        context_length=TINY.context_length,
        vocab_size=TINY.vocab_size,
        transformer_width=TINY.transformer_width,
        transformer_heads=TINY.transformer_heads,
        transformer_layers=TINY.transformer_layers,
    ).float().eval()
    return model


@pytest.fixture(scope="module")
def pair():
    ref = build_ref_clip()
    params, cfg = convert_state_dict(ref.state_dict())
    assert cfg == TINY
    return ref, params


def make_inputs(batch=3, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(batch, TINY.image_resolution, TINY.image_resolution, 3).astype(np.float32)
    ids = np.zeros((batch, 32), dtype=np.int64)
    for row in range(batch):
        n = 5 + row * 7
        ids[row, 0] = 49406
        ids[row, 1 : 1 + n] = rng.randint(1, 49000, size=n)
        ids[row, 1 + n] = 49407
    return images, ids


def test_encode_image_parity(pair):
    ref, params = pair
    images, _ = make_inputs()
    with torch.no_grad():
        expected = ref.encode_image(torch.from_numpy(images).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(encode_image(params, TINY, jnp.asarray(images)))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_encode_text_parity(pair):
    ref, params = pair
    _, ids = make_inputs()
    with torch.no_grad():
        expected = ref.encode_text(torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(params, TINY, jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_clip_forward_logits_parity(pair):
    ref, params = pair
    images, ids = make_inputs()
    with torch.no_grad():
        li, lt = ref(torch.from_numpy(images).permute(0, 3, 1, 2), torch.from_numpy(ids))
    gi, gt = clip_forward(params, TINY, jnp.asarray(images), jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(gi), li.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), lt.numpy(), atol=1e-4, rtol=1e-4)


def test_mith_vision_parity(pair):
    """MITH token-level vision outputs vs reference CLIP1 ViT (model/MITH.py:57-83)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    mith_mod = pytest.importorskip("model.MITH")
    ref, params = pair

    vit = mith_mod.ViT(
        input_resolution=TINY.image_resolution, patch_size=TINY.vision_patch_size,
        width=TINY.vision_width, layers=TINY.vision_layers,
        heads=TINY.vision_heads, output_dim=TINY.embed_dim,
    ).float().eval()
    vit.load_state_dict(ref.visual.state_dict())

    images, _ = make_inputs()
    with torch.no_grad():
        seq_tokens, attn_weight, cls_token = vit(torch.from_numpy(images).permute(0, 3, 1, 2))

    out = vision_forward(params["visual"], TINY, jnp.asarray(images), features="mith")
    # reference returns seq tokens length-first [P, B, E]
    np.testing.assert_allclose(
        np.asarray(out.tokens_proj[:, 1:, :]).transpose(1, 0, 2),
        seq_tokens.numpy(), atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(out.pooled), cls_token.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.cls_attn), attn_weight.numpy(), atol=2e-5, rtol=1e-4)


def test_mith_text_parity(pair):
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    mith_mod = pytest.importorskip("model.MITH")
    ref, params = pair

    clip1 = mith_mod.CLIP1(
        embed_dim=TINY.embed_dim, image_resolution=TINY.image_resolution,
        vision_layers=TINY.vision_layers, vision_width=TINY.vision_width,
        vision_patch_size=TINY.vision_patch_size, context_length=TINY.context_length,
        vocab_size=TINY.vocab_size, transformer_width=TINY.transformer_width,
        transformer_heads=TINY.transformer_heads, transformer_layers=TINY.transformer_layers,
    ).float().eval()
    clip1.load_state_dict(ref.state_dict(), strict=False)

    _, ids = make_inputs()
    kpm = ids == 0
    with torch.no_grad():
        seq_tokens, attn_weight, new_kpm, eos_token = clip1.encode_text(
            torch.from_numpy(ids), torch.from_numpy(kpm)
        )

    out = text_forward(
        params["text"], TINY, jnp.asarray(ids.astype(np.int32)),
        features="mith", key_padding_mask=jnp.asarray(kpm),
    )
    # reference seq tokens are length-first [L, B, E]
    np.testing.assert_allclose(
        np.asarray(out.tokens_proj).transpose(1, 0, 2), seq_tokens.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(out.pooled), eos_token.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.eos_attn), attn_weight.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.key_padding_mask), new_kpm.numpy().astype(bool))


def test_npz_roundtrip(tmp_path, pair):
    _, params = pair
    path = str(tmp_path / "clip.npz")
    save_params_npz(path, params)
    loaded, cfg = load_params_npz(path)
    assert cfg == TINY
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_init_shapes_match_converted(pair):
    _, converted = pair
    initialized = init_clip_params(jax.random.PRNGKey(0), TINY)
    s1 = jax.tree.map(lambda t: t.shape, converted)
    s2 = jax.tree.map(lambda t: t.shape, initialized)
    assert s1 == s2


def test_jit_compiles():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    images, ids = make_inputs(batch=2)
    fn = jax.jit(lambda p, im, t: (
        encode_image(p, TINY, im), encode_text(p, TINY, t)
    ))
    i, t = fn(params, jnp.asarray(images), jnp.asarray(ids.astype(np.int32)))
    assert i.shape == (2, TINY.embed_dim)
    assert t.shape == (2, TINY.embed_dim)


def test_zoo_surface(tmp_path):
    """Model zoo helpers: names, cached-checksum path, unknown-name error
    (network download itself is exercised only where egress exists)."""
    from ccmh.clip import zoo

    assert "ViT-B/32" in zoo.available_models()
    assert "RN50" in zoo.available_models()
    with pytest.raises(KeyError, match="unknown model"):
        zoo.download("ViT-Z/99", root=str(tmp_path))
    # cached file with wrong bytes is NOT accepted silently
    import os
    target = tmp_path / "ViT-B-32.pt"
    target.write_bytes(b"junk")
    sha = zoo._sha256(str(target))
    assert sha != zoo._MODELS["ViT-B/32"][0]


@pytest.mark.slow
@pytest.mark.parametrize("mode", [True, "dots"])
def test_remat_is_numerically_transparent(mode):
    """remat=True ("full" jax.checkpoint over the scanned blocks) and
    remat="dots" (dots_with_no_batch_dims_saveable policy: matmul outputs
    stay saved, only elementwise/attention internals recompute — measured
    117 -> 105 ms on the MITH B=256 step) change memory/recompute
    behaviour only: the forward value is bit-identical, and parameter
    gradients agree to a couple of ULPs.  (Exact gradient equality is not
    guaranteed: remat recomputes activations inside the *backward* XLA
    program, where different fusion decisions can reorder fp32 reductions
    in the activation^T @ cotangent weight-gradient products — measured
    ~2e-7 on out_w/proj_w leaves.)"""
    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import init_clip_params, text_forward, vision_forward

    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randn(2, TINY.image_resolution, TINY.image_resolution, 3)
        .astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 100, (2, 16)), jnp.int32)

    def loss(p, remat):
        a = vision_forward(p["visual"], TINY, images, remat=remat).pooled
        b = text_forward(p["text"], TINY, ids, remat=remat).pooled
        return jnp.sum(a * a) + jnp.sum(b * b)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, mode))(params)
    assert float(v0) == float(v1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6)
