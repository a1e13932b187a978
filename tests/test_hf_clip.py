"""HuggingFace CLIPModel interop parity (ccmh/clip/hf.py).

A tiny randomly-initialized ``transformers.CLIPModel`` is converted to ccmh
params and both are compared on identical inputs; the export direction is
verified by a strict-load round trip back into transformers.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ccmh.clip.model import ClipConfig, encode_image, encode_text

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = ClipConfig.tiny()


@pytest.fixture(scope="module")
def hf_model():
    from ccmh.clip.hf import make_hf_config

    torch.manual_seed(7)
    model = transformers.CLIPModel(make_hf_config(TINY)).float().eval()
    # non-degenerate weights: HF inits projections ~N(0, small); keep as-is
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    from ccmh.clip.hf import load_hf_clip

    params, cfg = load_hf_clip(hf_model)
    assert cfg == TINY
    return params


def make_inputs(batch=3, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(batch, TINY.image_resolution, TINY.image_resolution, 3)
    images = images.astype(np.float32)
    ids = np.zeros((batch, 32), dtype=np.int64)
    for row in range(batch):
        n = 4 + row * 6
        ids[row, 0] = TINY.vocab_size - 2          # BOS
        ids[row, 1:1 + n] = rng.randint(1, TINY.vocab_size - 10, size=n)
        ids[row, 1 + n] = TINY.vocab_size - 1      # EOT (unique max id)
    return images, ids


def test_image_features_parity(hf_model, converted):
    images, _ = make_inputs()
    with torch.no_grad():
        want = hf_model.get_image_features(
            pixel_values=torch.from_numpy(images).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(encode_image(converted, TINY, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_text_features_parity(hf_model, converted):
    _, ids = make_inputs()
    with torch.no_grad():
        want = hf_model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(converted, TINY, jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_export_round_trip(hf_model, converted):
    """ccmh params -> HF state dict -> strict load -> identical weights."""
    from ccmh.clip.hf import load_hf_clip, to_hf_model

    model2 = to_hf_model(converted, TINY)
    sd1, sd2 = hf_model.state_dict(), model2.state_dict()
    assert set(sd1) == set(sd2)
    for key in sd1:
        np.testing.assert_allclose(
            sd2[key].numpy(), sd1[key].numpy(), atol=1e-6, err_msg=key)
    # and converting the exported model back is bit-identical to the params
    params2, cfg2 = load_hf_clip(model2)
    assert cfg2 == TINY
    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        converted, params2)


def test_directory_dispatch(hf_model, tmp_path):
    """save_pretrained dir feeds straight into load_clip_params."""
    from ccmh.clip.convert import load_clip_params

    d = tmp_path / "hf_ckpt"
    hf_model.save_pretrained(d)
    params, cfg = load_clip_params(str(d))
    assert cfg == TINY
    images, ids = make_inputs(batch=2, seed=1)
    with torch.no_grad():
        want = hf_model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(params, TINY, jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_cli_to_npz(hf_model, tmp_path):
    from ccmh.clip.convert import load_params_npz
    from ccmh.clip.hf import main

    d = tmp_path / "hf_ckpt"
    hf_model.save_pretrained(d)
    out = tmp_path / "clip.npz"
    main(["to-npz", str(d), str(out)])
    params, cfg = load_params_npz(str(out))
    assert cfg == TINY


def test_nonstandard_text_heads_respected():
    """Shape inference assumes head_dim 64; the HF config is authoritative.
    A 128-wide / 4-head text tower must convert with 4 heads (not the
    inferred 2) and still match transformers feature-for-feature."""
    from ccmh.clip.hf import load_hf_clip, make_hf_config

    cfg4 = make_hf_config(TINY)
    cfg4.text_config.num_attention_heads = 4
    torch.manual_seed(3)
    model = transformers.CLIPModel(cfg4).float().eval()
    params, cc = load_hf_clip(model)
    assert cc.transformer_heads == 4
    _, ids = make_inputs(batch=2, seed=2)
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(params, cc, jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_nonstandard_vision_heads_rejected():
    """ClipConfig derives vision heads as width // 64; an HF vision tower
    with a different head count cannot be represented and must raise, not
    silently produce wrong features."""
    from ccmh.clip.hf import load_hf_clip, make_hf_config

    cfg4 = make_hf_config(TINY)
    cfg4.vision_config.num_attention_heads = 4
    torch.manual_seed(4)
    model = transformers.CLIPModel(cfg4).float().eval()
    with pytest.raises(ValueError, match="attention heads"):
        load_hf_clip(model)


def test_resnet_rejected():
    from ccmh.clip.hf import to_hf_state_dict

    rn = ClipConfig(vision_layers=(2, 2, 2, 2), vision_patch_size=None)
    with pytest.raises(ValueError, match="ModifiedResNet"):
        to_hf_state_dict({}, rn)
