"""ModifiedResNet CLIP tower: forward parity vs the reference torch model.

Builds the reference CLIP with a tuple vision_layers (which selects
ModifiedResNet, model/base/model.py:269-276), converts its random-init
state_dict, and checks encode_image parity (BN in eval mode — running
stats — on both sides).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_module

from ccmh.clip.convert import convert_state_dict, save_params_npz, load_params_npz
from ccmh.clip.model import encode_image, encode_text, init_clip_params, ClipConfig

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_pair():
    ref = load_reference_module("model/base/model.py")
    torch.manual_seed(0)
    model = ref.CLIP(
        64,              # embed_dim
        64,              # image_resolution -> 2x2 attnpool grid
        (1, 1, 1, 1),    # vision_layers tuple -> ModifiedResNet
        8,               # vision_width -> 256-d visual features, 4 heads
        None,            # vision_patch_size unused for RN
        77, 49408, 128, 2, 2,
    ).float().eval()
    params, cfg = convert_state_dict(
        {k: v for k, v in model.state_dict().items()})
    return model, params, cfg


def test_config_inference(ref_pair):
    _, _, cfg = ref_pair
    assert cfg.is_resnet
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.vision_width == 8
    assert cfg.vision_patch_size is None
    assert cfg.image_resolution == 64


def test_encode_image_parity(ref_pair):
    model, params, cfg = ref_pair
    rng = np.random.RandomState(1)
    images = rng.randn(3, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = model.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(encode_image(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


def test_encode_text_still_matches(ref_pair):
    model, params, cfg = ref_pair
    ids = np.zeros((2, 16), np.int64)
    ids[:, 0] = 49406
    ids[:, 1:5] = np.random.RandomState(2).randint(320, 40000, (2, 4))
    ids[:, 5] = 49407
    with torch.no_grad():
        ref_out = model.encode_text(torch.from_numpy(ids)).numpy()
    out = np.asarray(encode_text(params, cfg, jnp.asarray(ids, jnp.int32)[:, :16]))
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


def test_npz_roundtrip(ref_pair, tmp_path):
    _, params, cfg = ref_pair
    path = str(tmp_path / "rn.npz")
    save_params_npz(path, jax.tree.map(np.asarray, params))
    params2, cfg2 = load_params_npz(path)
    assert cfg2.is_resnet and cfg2.vision_layers == cfg.vision_layers
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(encode_image(params, cfg, images)),
        np.asarray(encode_image(params2, cfg2, images)), atol=1e-6)


@pytest.mark.slow
def test_from_scratch_init_runs():
    cfg = ClipConfig(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, transformer_width=64,
        transformer_heads=2, transformer_layers=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    out = encode_image(params, cfg, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_token_features_rejected():
    cfg = ClipConfig(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, transformer_width=64,
        transformer_heads=2, transformer_layers=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    from ccmh.clip.model import vision_forward

    with pytest.raises(ValueError, match="ViT"):
        vision_forward(params["visual"], cfg, jnp.zeros((1, 64, 64, 3)),
                       features="mith")
