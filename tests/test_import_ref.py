"""Reference .pth checkpoint import (clip/import_ref.py).

The reference trainer dumps ``model.state_dict()`` per epoch
(train/base.py:225-227).  These tests build REAL reference models (tiny
torch CLIP), save their state dicts, import them, and assert the ccmh
encode path reproduces the torch eval path on identical inputs — the
round-trip that lets a reference-trained model be evaluated here.
"""

import logging
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT
from ccmh.clip.import_ref import import_reference_pth, import_reference_state_dict
from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.train.methods import get_method

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
# model/DPBE.py imports the vendored stochman (train/DPBE/stochman)
_STOCHMAN_ROOT = f"{REFERENCE_ROOT}/train/DPBE/stochman"
if _STOCHMAN_ROOT not in sys.path:
    sys.path.insert(0, _STOCHMAN_ROOT)

TINY = ClipConfig.tiny()
B, K, C = 4, 16, 8


class _DummyWriter:
    def add_scalar(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def tiny_clip_pt(tmp_path_factory):
    from tests.test_clip import build_ref_clip

    path = tmp_path_factory.mktemp("clip") / "tiny.pt"
    torch.save(build_ref_clip().state_dict(), str(path))
    return str(path)


def build_ref_model(module: str, cls_name: str, clip_pt, tmp_path, **kw):
    import importlib

    if module == "DPBE":
        # upstream bug: model/DPBE.py:5 imports Pre_Layer from modelbase,
        # where it does not exist (it lives in model/DNPH_TOMM.py:7); inject
        # the real class so the module imports — MDPBE never instantiates it
        import model.modelbase as modelbase

        if not hasattr(modelbase, "Pre_Layer"):
            modelbase.Pre_Layer = importlib.import_module(
                "model.DNPH_TOMM").Pre_Layer
    mod = importlib.import_module(f"model.{module}")
    torch.manual_seed(3)
    model = getattr(mod, cls_name)(
        outputDim=K, clipPath=clip_pt, writer=_DummyWriter(),
        saveDir=str(tmp_path / "ref"), logger=logging.getLogger("import_ref"),
        **kw)
    model.float()
    model.eval()  # Baseclip overrides eval() to return None — no chaining
    return model


def make_inputs(seed=11):
    rng = np.random.RandomState(seed)
    images = (rng.randn(B, TINY.image_resolution, TINY.image_resolution, 3)
              * 0.5).astype(np.float32)
    ids = np.zeros((B, 32), np.int64)
    for r in range(B):
        n = rng.randint(3, 20)
        ids[r, 0] = 49406
        ids[r, 1:1 + n] = rng.randint(1, 49000, n)
        ids[r, 1 + n] = 49407
    return images, ids


def ccmh_batch(images, ids):
    return {"image": jnp.asarray(images), "text": jnp.asarray(ids, jnp.int32)}


def torch_inputs(images, ids):
    return (torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(ids))


@pytest.mark.parametrize("module,cls,method", [
    ("DSPH", "MDSPH", "DSPH"),
    ("DPBE", "MDPBE", "DPBE"),
])
def test_import_encode_parity(module, cls, method, tiny_clip_pt, tmp_path):
    """Imported params reproduce the torch model's eval embeddings and
    the resulting ±1 codes (reference get_code, train/base.py:130-148)."""
    model = build_ref_model(module, cls, tiny_clip_pt, tmp_path)
    pth = str(tmp_path / "model-0.pth")
    torch.save(model.state_dict(), pth)

    params, ccfg, _aux = import_reference_pth(pth, method)
    assert ccfg == TINY

    images, ids = make_inputs()
    t_img, t_ids = torch_inputs(images, ids)
    with torch.no_grad():
        ref_i = model.encode_image(t_img)
        ref_t = model.encode_text(t_ids)
        if isinstance(ref_i, tuple):  # DNPH returns (embed, pre)
            ref_i, ref_t = ref_i[0], ref_t[0]

    m = get_method(method)
    cfg = Config(method=method, output_dim=K, nclass=C, train_num=B)
    if method == "DPBE":
        # import carries no Hessian state: a fresh-model posterior (the
        # init value, stochman/laplace.py:63-66) is the defined semantics
        _, _, aux = m.init(jax.random.PRNGKey(0), cfg, TINY)
    else:
        aux = {}
    img_codes, txt_codes = m.make_encode_fn(cfg, TINY)(params, aux,
                                                       ccmh_batch(images, ids))

    if method == "DPBE":
        # posterior sampling uses different PRNGs; compare the deterministic
        # head mean instead of the sampled codes
        from ccmh.models.heads import l2norm_hash
        from ccmh.train.methods.base import clip_embeds

        img_e, txt_e = clip_embeds(params, TINY, ccmh_batch(images, ids), cfg)
        got_i = np.asarray(l2norm_hash(params["img_head"], img_e.pooled))
        got_t = np.asarray(l2norm_hash(params["txt_head"], txt_e.pooled))
    else:
        from ccmh.models.heads import linear_hash
        from ccmh.train.methods.base import clip_embeds

        img_e, txt_e = clip_embeds(params, TINY, ccmh_batch(images, ids), cfg)
        got_i = np.asarray(linear_hash(params["img_head"], img_e.pooled))
        got_t = np.asarray(linear_hash(params["txt_head"], txt_e.pooled))
        np.testing.assert_array_equal(
            np.asarray(img_codes), np.sign(ref_i.numpy()).astype(np.int8))
        np.testing.assert_array_equal(
            np.asarray(txt_codes), np.sign(ref_t.numpy()).astype(np.int8))
    np.testing.assert_allclose(got_i, ref_i.numpy(), atol=2e-5, rtol=0)
    np.testing.assert_allclose(got_t, ref_t.numpy(), atol=2e-5, rtol=0)


def test_import_dchmt_select_pairs(tiny_clip_pt, tmp_path):
    """DCHMT HashLayer (fc + K Linear(128,2) softmax pairs, model/DCHMT.py:
    8-28) maps onto the fused select-hash params: pair distributions and the
    argmax ±1 codes (train/base.py:150-158) agree."""
    model = build_ref_model("DCHMT", "MDCMHT", tiny_clip_pt, tmp_path)
    pth = str(tmp_path / "model-0.pth")
    torch.save(model.state_dict(), pth)
    params, _, _ = import_reference_pth(pth, "DCHMT")

    images, ids = make_inputs()
    t_img, _ = torch_inputs(images, ids)
    with torch.no_grad():
        emb = model.clip.encode_image(t_img)
        ref_pairs = torch.stack(model.image_hash(emb), dim=1).numpy()  # [B,K,2]

    from ccmh.models.heads import select_hash
    from ccmh.clip.model import encode_image

    img_e = encode_image(params["clip"], TINY, jnp.asarray(images))
    got_pairs = np.asarray(select_hash(params["img_head"], img_e))
    np.testing.assert_allclose(got_pairs, ref_pairs, atol=2e-5, rtol=0)


def test_import_dnph_pre_layers(tiny_clip_pt, tmp_path):
    model = build_ref_model("DNPH_TOMM", "MDNPH", tiny_clip_pt, tmp_path,
                            num_classes=C)
    pth = str(tmp_path / "model-0.pth")
    torch.save(model.state_dict(), pth)
    params, _, _ = import_reference_pth(pth, "DNPH")
    assert set(params) == {"clip", "img_head", "txt_head", "img_pre", "txt_pre"}

    images, ids = make_inputs()
    t_img, _ = torch_inputs(images, ids)
    with torch.no_grad():
        ref_embed, ref_pre = model.encode_image(t_img)

    from ccmh.models.heads import linear_hash, pre_layer
    from ccmh.clip.model import encode_image

    img_e = encode_image(params["clip"], TINY, jnp.asarray(images))
    np.testing.assert_allclose(
        np.asarray(linear_hash(params["img_head"], img_e)),
        ref_embed.numpy(), atol=2e-5, rtol=0)
    np.testing.assert_allclose(
        np.asarray(pre_layer(params["img_pre"], img_e)),
        ref_pre.numpy(), atol=2e-5, rtol=0)


def test_import_unsupported_method_raises(tiny_clip_pt, tmp_path):
    model = build_ref_model("DSPH", "MDSPH", tiny_clip_pt, tmp_path)
    sd = model.state_dict()
    with pytest.raises(NotImplementedError, match="DPSIH"):
        import_reference_state_dict(sd, "DPSIH")
    with pytest.raises(ValueError, match="clip"):
        import_reference_state_dict(
            {k: v for k, v in sd.items() if not k.startswith("clip.")}, "DSPH")


def test_trainer_pretrained_pth(tiny_clip_pt, tmp_path):
    """--pretrained model-<epoch>.pth end-to-end: the Trainer imports the
    reference checkpoint and its encode codes match the torch eval path."""
    from ccmh.data.split import split_data
    from ccmh.data.synthetic import synthetic_arrays
    from ccmh.train.trainer import Trainer

    model = build_ref_model("DSPH", "MDSPH", tiny_clip_pt, tmp_path)
    pth = str(tmp_path / "model-3.pth")
    torch.save(model.state_dict(), pth)

    raw = synthetic_arrays(n=24, n_class=C, resolution=TINY.image_resolution)
    splits = split_data(raw, query_num=8, train_num=12, seed=1814)
    cfg = Config(method="DSPH", dataset="synthetic", output_dim=K,
                 save_dir=str(tmp_path / "out"), epochs=1, batch_size=8,
                 query_num=8, train_num=12, seed=1814,
                 resolution=TINY.image_resolution, eval_batch=8,
                 nclass=C, pretrained=pth, is_train=False)
    tr = Trainer(cfg, splits=splits, clip_cfg=TINY)
    maps = tr.test()
    for v in maps:
        assert 0.0 <= v <= 1.0


def test_import_twdh_modality_heads(tiny_clip_pt, tmp_path):
    """TwDH import: ModalityHash heads (value-path MHA + norm + pair fc)
    AND the image-side BatchNorm running stats (state-dict buffers that
    live in ccmh's state.aux).  Eval-path parity: torch encode_image pair
    codes == ccmh modality_hash on imported params."""
    import importlib

    mdl = importlib.import_module("model.TwDH")
    root = f"{REFERENCE_ROOT}/train/TwDH/center/mirflickr"
    torch.manual_seed(4)
    model = mdl.MTwDH(outputDim=512, clipPath=tiny_clip_pt,
                      writer=_DummyWriter(), saveDir=str(tmp_path / "ref"),
                      logger=logging.getLogger("import_ref"),
                      long_center=f"{root}/long", short_center=f"{root}/short",
                      trans=f"{root}/trans")
    model.float()
    # Baseclip's train()/eval() overrides reference self.image_hash, which
    # MTwDH does not have (its heads are img_hash/txt_hash) — set the head
    # modes explicitly
    model.img_hash.train()
    model.img_hash(torch.randn(8, TINY.embed_dim))  # advance running stats
    model.img_hash.eval()
    model.txt_hash.eval()

    pth = str(tmp_path / "model-0.pth")
    torch.save(model.state_dict(), pth)
    params, ccfg, aux = import_reference_pth(pth, "TwDH")
    assert ccfg == TINY
    assert set(params) == {"clip", "img_head", "txt_head"}
    np.testing.assert_allclose(
        aux["bn"]["mean"], model.img_hash.norm.running_mean.numpy(), atol=1e-7)
    np.testing.assert_allclose(
        aux["bn"]["var"], model.img_hash.norm.running_var.numpy(), atol=1e-7)

    # eval-path parity on the imported heads (BN in eval mode = running stats)
    from ccmh.models.heads import modality_hash

    x = np.random.RandomState(2).randn(4, TINY.embed_dim).astype(np.float32)
    with torch.no_grad():
        want = model.img_hash(torch.from_numpy(x)).numpy()
    got, _ = modality_hash(params["img_head"], jnp.asarray(x),
                           train=False, bn_state=aux["bn"])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
    with torch.no_grad():
        want_t = model.txt_hash(torch.from_numpy(x)).numpy()
    got_t, _ = modality_hash(params["txt_head"], jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=2e-5, rtol=1e-4)


def test_import_mith_hashing_model(tiny_clip_pt, tmp_path):
    """MITH import: the full MITH trainer model (CLIP1 tower + HashingModel
    with shared GCL, scan-stacked LCT blocks, fused bitwise hashing) maps
    onto ccmh params; forward parity on the hashing model's six outputs.
    The hardcoded clip_embed_dim=512 (model/MITH.py:461) is dependency-
    injected at the tiny width, as in the trajectory golden."""
    import importlib

    from tests.test_trajectory import make_ref_args

    mm = importlib.import_module("model.MITH")
    args = make_ref_args("MITH", "MITH", tiny_clip_pt)
    args.output_dim = K

    torch.manual_seed(3)
    model = mm.MITH.__new__(mm.MITH)
    torch.nn.Module.__init__(model)
    model.args = args
    model.clip = mm.load_download_clip(args.clip_path)
    model.hash = mm.HashingModel(clip_embed_dim=TINY.embed_dim, args=args)
    model.float()
    model.eval()

    pth = str(tmp_path / "model-0.pth")
    torch.save(model.state_dict(), pth)
    params, ccfg, aux = import_reference_pth(pth, "MITH")
    assert ccfg == TINY
    assert set(params) == {"clip", "hash"}
    assert aux == {}

    import ccmh.models.mith as jmith

    rng = np.random.RandomState(6)
    L_IMG, L_TXT = 10, 7
    img_tokens = rng.randn(L_IMG, B, TINY.embed_dim).astype(np.float32)
    txt_tokens = rng.randn(L_TXT, B, TINY.embed_dim).astype(np.float32)
    img_cls = rng.randn(B, TINY.embed_dim).astype(np.float32)
    txt_eos = rng.randn(B, TINY.embed_dim).astype(np.float32)
    kpm = np.zeros((B, L_TXT), bool)
    kpm[:, -2:] = True

    with torch.no_grad():
        want = model.hash(
            torch.from_numpy(img_tokens), torch.from_numpy(txt_tokens),
            torch.from_numpy(img_cls), torch.from_numpy(txt_eos),
            torch.from_numpy(kpm))
    got = jmith.hashing_model(
        params["hash"],
        jnp.asarray(img_tokens.transpose(1, 0, 2)),
        jnp.asarray(txt_tokens.transpose(1, 0, 2)),
        jnp.asarray(img_cls), jnp.asarray(txt_eos), jnp.asarray(kpm),
        top_k=args.top_k_label)
    for name in ("img_cls_hash", "txt_cls_hash", "img_tokens_hash",
                 "txt_tokens_hash"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), want[name].numpy(),
            atol=3e-5, rtol=1e-4, err_msg=name)
