"""Reference .pth checkpoint EXPORT (clip/export_ref.py).

Two layers of evidence that the export is the exact inverse of import:

1. *Tree round-trip*: ccmh-native init params -> export_reference_state_dict
   -> import_reference_state_dict -> identical trees, for every supported
   head family.
2. *Strict torch load + function parity*: a REAL reference model's state
   dict round-trips reference -> import -> export -> ``load_state_dict(
   strict=True)`` into a freshly constructed reference model, and the two
   torch models produce IDENTICAL eval outputs.  strict=True proves full
   key coverage (nothing missing, nothing unexpected) — the exported .pth
   is loadable by the unmodified reference trainer
   (``--pretrained``, train/DSPH/hash_train.py:30-32).
"""

import logging
import sys

import numpy as np
import pytest

import jax

from tests.conftest import REFERENCE_ROOT
from ccmh.clip.export_ref import (
    export_reference_pth,
    export_reference_state_dict,
)
from ccmh.clip.import_ref import import_reference_state_dict
from ccmh.clip.model import ClipConfig, init_clip_params
from ccmh.config import MITHConfig

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
_STOCHMAN_ROOT = f"{REFERENCE_ROOT}/train/DPBE/stochman"
if _STOCHMAN_ROOT not in sys.path:
    sys.path.insert(0, _STOCHMAN_ROOT)

TINY = ClipConfig.tiny()
B, K, C = 4, 16, 8


def assert_trees_equal(got, want, path=""):
    if isinstance(want, dict):
        assert isinstance(got, dict) and set(got) == set(want), \
            f"{path}: {sorted(got)} != {sorted(want)}"
        for k in want:
            assert_trees_equal(got[k], want[k], f"{path}/{k}")
    elif isinstance(want, (list, tuple)):
        assert len(got) == len(want), path
        for i, (g, w) in enumerate(zip(got, want)):
            assert_trees_equal(g, w, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0, rtol=0, err_msg=path)


def init_heads(method: str, rng):
    """ccmh-native head trees per family (the exact structures
    Trainer.state.params carries)."""
    from ccmh.models import heads as H
    from ccmh.models.mith import init_hashing_model

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    e = TINY.embed_dim
    if method == "DNPH":
        return {"img_head": H.init_linear_hash(k1, e, K),
                "txt_head": H.init_linear_hash(k2, e, K),
                "img_pre": H.init_pre_layer(k3, e, C),
                "txt_pre": H.init_pre_layer(k4, e, C)}
    if method == "DPBE":
        return {"img_head": H.init_l2norm_hash(k1, e, K),
                "txt_head": H.init_l2norm_hash(k2, e, K)}
    if method == "DCHMT":
        return {"img_head": H.init_select_hash(k1, e, K),
                "txt_head": H.init_select_hash(k2, e, K)}
    if method == "TwDH":
        return {"img_head": H.init_modality_hash(k1, e, K, layernorm=False),
                "txt_head": H.init_modality_hash(k2, e, K, layernorm=True)}
    if method == "MITH":
        return {"hash": init_hashing_model(k1, e, K, MITHConfig())}
    return {"img_head": H.init_linear_hash(k1, e, K),
            "txt_head": H.init_linear_hash(k2, e, K)}


@pytest.mark.parametrize("method", [
    "DSPH", "DNpH", "DMsH_LN", "DScPH", "DDWSH", "DDBH", "DHaPH",
    "DNPH", "DPBE", "DCHMT", "TwDH", "MITH",
])
def test_tree_roundtrip(method):
    """export(import) == identity on ccmh-native param trees — every array,
    bit for bit (all mappings are transposes/stackings)."""
    rng = jax.random.PRNGKey(7)
    k_clip, k_heads = jax.random.split(rng)
    params = {"clip": init_clip_params(k_clip, TINY),
              **init_heads(method, k_heads)}
    aux = None
    if method == "TwDH":
        from ccmh.models.heads import init_bn_state

        bn = init_bn_state(TINY.embed_dim)
        bn["mean"] = bn["mean"] + 0.25   # non-trivial stats round-trip too
        bn["var"] = bn["var"] * 1.5
        bn["count"] = bn["count"] + 3
        aux = {"bn": bn}

    sd = export_reference_state_dict(params, method, aux)
    got_params, got_cfg, got_aux = import_reference_state_dict(sd, method)
    assert got_cfg == TINY
    assert_trees_equal(got_params, jax.tree.map(np.asarray, params))
    if method == "TwDH":
        assert_trees_equal(got_aux, jax.tree.map(np.asarray, aux))


def test_export_unsupported_method_raises():
    params = {"clip": init_clip_params(jax.random.PRNGKey(0), TINY)}
    with pytest.raises(NotImplementedError, match="DPSIH"):
        export_reference_state_dict(params, "DPSIH")


def _to_torch(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def roundtrip_into(model_b, model_a, method: str):
    """reference model A -> import -> export -> strict load into model B."""
    params, _, aux = import_reference_state_dict(model_a.state_dict(), method)
    sd = export_reference_state_dict(params, method, aux)
    model_b.load_state_dict(_to_torch(sd), strict=True)
    return model_b


@pytest.mark.parametrize("module,cls,method,kw", [
    ("DSPH", "MDSPH", "DSPH", {}),
    ("DPBE", "MDPBE", "DPBE", {}),
    ("DNPH_TOMM", "MDNPH", "DNPH", {"num_classes": C}),
    ("DCHMT", "MDCMHT", "DCHMT", {}),
])
def test_strict_load_function_parity(module, cls, method, kw, tmp_path):
    """Exported .pth loads into the unmodified reference model with
    strict=True and reproduces its eval outputs exactly."""
    from tests.test_import_ref import build_ref_model, make_inputs, torch_inputs

    from tests.test_import_ref import tiny_clip_pt  # noqa: F401 (fixture dep)
    from tests.test_clip import build_ref_clip

    clip_pt = str(tmp_path / "tiny.pt")
    torch.save(build_ref_clip().state_dict(), clip_pt)

    model_a = build_ref_model(module, cls, clip_pt, tmp_path, **kw)
    torch.manual_seed(99)  # model B starts from DIFFERENT weights
    model_b = build_ref_model(module, cls, clip_pt, tmp_path, **kw)
    roundtrip_into(model_b, model_a, method)

    images, ids = make_inputs()
    t_img, t_ids = torch_inputs(images, ids)
    with torch.no_grad():
        want_i, want_t = model_a.encode_image(t_img), model_a.encode_text(t_ids)
        got_i, got_t = model_b.encode_image(t_img), model_b.encode_text(t_ids)
    def flat(x):  # DNPH -> (embed, logits) tuple; DCHMT -> list of K pairs
        return torch.cat([t.reshape(-1) for t in x]) if isinstance(
            x, (tuple, list)) else x
    np.testing.assert_array_equal(flat(got_i).numpy(), flat(want_i).numpy())
    np.testing.assert_array_equal(flat(got_t).numpy(), flat(want_t).numpy())


def test_strict_load_twdh(tmp_path):
    """TwDH: strict load incl. BatchNorm running stats; the zeroed q/k
    attention rows are function-preserving (softmax over one key == 1.0
    exactly), so eval outputs match bit for bit."""
    import importlib

    from tests.test_clip import build_ref_clip

    clip_pt = str(tmp_path / "tiny.pt")
    torch.save(build_ref_clip().state_dict(), clip_pt)
    mdl = importlib.import_module("model.TwDH")
    root = f"{REFERENCE_ROOT}/train/TwDH/center/mirflickr"

    def build(seed):
        torch.manual_seed(seed)
        m = mdl.MTwDH(outputDim=512, clipPath=clip_pt,
                      writer=None, saveDir=str(tmp_path / "ref"),
                      logger=logging.getLogger("export_ref"),
                      long_center=f"{root}/long", short_center=f"{root}/short",
                      trans=f"{root}/trans")
        m.float()
        return m

    model_a = build(4)
    model_a.img_hash.train()
    model_a.img_hash(torch.randn(8, TINY.embed_dim))  # advance running stats
    for m in (model_a.img_hash, model_a.txt_hash):
        m.eval()
    model_b = build(5)
    for m in (model_b.img_hash, model_b.txt_hash):
        m.eval()
    roundtrip_into(model_b, model_a, "TwDH")

    x = torch.from_numpy(
        np.random.RandomState(2).randn(4, TINY.embed_dim).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_array_equal(model_b.img_hash(x).numpy(),
                                      model_a.img_hash(x).numpy())
        np.testing.assert_array_equal(model_b.txt_hash(x).numpy(),
                                      model_a.txt_hash(x).numpy())


def test_strict_load_mith(tmp_path):
    """MITH: strict load covers the full HashingModel incl. the shared-GCL
    double keys (gcl_i.* == gcl_t.*, model/MITH.py:414) and the registered
    sin-cos ``position.pe`` buffers."""
    import importlib

    from tests.test_clip import build_ref_clip
    from tests.test_trajectory import make_ref_args

    clip_pt = str(tmp_path / "tiny.pt")
    torch.save(build_ref_clip().state_dict(), clip_pt)
    mm = importlib.import_module("model.MITH")
    args = make_ref_args("MITH", "MITH", clip_pt)
    args.output_dim = K

    def build(seed):
        torch.manual_seed(seed)
        m = mm.MITH.__new__(mm.MITH)
        torch.nn.Module.__init__(m)
        m.args = args
        m.clip = mm.load_download_clip(args.clip_path)
        m.hash = mm.HashingModel(clip_embed_dim=TINY.embed_dim, args=args)
        m.float()
        m.eval()
        return m

    model_a, model_b = build(3), build(8)
    roundtrip_into(model_b, model_a, "MITH")

    rng = np.random.RandomState(6)
    L_IMG, L_TXT = 10, 7
    t = lambda a: torch.from_numpy(a.astype(np.float32))
    img_tokens = t(rng.randn(L_IMG, B, TINY.embed_dim))
    txt_tokens = t(rng.randn(L_TXT, B, TINY.embed_dim))
    img_cls, txt_eos = t(rng.randn(B, TINY.embed_dim)), t(rng.randn(B, TINY.embed_dim))
    kpm = np.zeros((B, L_TXT), bool)
    kpm[:, -2:] = True
    with torch.no_grad():
        want = model_a.hash(img_tokens, txt_tokens, img_cls, txt_eos,
                            torch.from_numpy(kpm))
        got = model_b.hash(img_tokens, txt_tokens, img_cls, txt_eos,
                           torch.from_numpy(kpm))
    for name in want:
        # not array_equal: the position.pe buffer is recomputed from numpy
        # sin/cos (export_ref._sincos_pe) and differs from torch's at ulp
        # level (~2e-7), which propagates through the LCT transformer
        np.testing.assert_allclose(got[name].numpy(), want[name].numpy(),
                                   atol=2e-6, rtol=1e-5, err_msg=name)


def test_export_cli_roundtrip(tmp_path):
    """`python -m ccmh.clip.export_ref`: an .npz interchange checkpoint
    exports to a .pth that imports back to the same params."""
    from ccmh.clip.convert import save_params_npz
    from ccmh.clip.export_ref import _main
    from ccmh.clip.import_ref import import_reference_pth
    from tests.test_clip import build_ref_clip

    clip_pt = str(tmp_path / "tiny.pt")
    torch.save(build_ref_clip().state_dict(), clip_pt)

    rng = jax.random.PRNGKey(3)
    k_clip, k_heads = jax.random.split(rng)
    from ccmh.clip.convert import convert_torch_checkpoint

    clip_params, _ = convert_torch_checkpoint(clip_pt)
    params = {"clip": clip_params, **init_heads("DSPH", k_heads)}
    ckpt = str(tmp_path / "ckpt.npz")
    save_params_npz(ckpt, jax.tree.map(np.asarray, {
        "params": params, "extra": {}, "aux": {}, "step": np.asarray(0)}))

    out = str(tmp_path / "model-export.pth")
    assert _main([ckpt, "--method", "DSPH", "--output-dim", str(K),
                  "--nclass", str(C), "--clip-path", clip_pt, "-o", out]) == 0
    got, cfg, _ = import_reference_pth(out, "DSPH")
    assert cfg == TINY
    assert_trees_equal(got, jax.tree.map(np.asarray, params))
