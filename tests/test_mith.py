"""MITH parity: hashing model forward vs reference (converted weights) and
loss-component golden values."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT
from ccmh.config import MITHConfig
from ccmh.models import mith as jmith

torch = pytest.importorskip("torch")

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

DIM, KBITS, B, L_IMG, L_TXT = 64, 16, 4, 9, 12
rng = np.random.RandomState(0)


class Args:
    output_dim = KBITS
    dropout = 0.0
    transformer_layers = 2
    activation = "gelu"
    top_k_label = 8
    res_mlp_layers = 2


@pytest.fixture(scope="module")
def ref_model():
    mith_mod = pytest.importorskip("model.MITH")
    torch.manual_seed(0)
    return mith_mod.HashingModel(clip_embed_dim=DIM, args=Args()).float().eval()


def convert_hashing_model(ref) -> dict:
    def t(x):
        return jnp.asarray(x.detach().numpy())

    def conv_linear(mod, bias=True):
        p = {"w": t(mod.weight).T}
        if bias:
            p["b"] = t(mod.bias)
        return p

    def conv_res_mlps(mod):
        layers = []
        for mlp, ln in zip(mod.mlps, mod.lns):
            layers.append({
                "ln": {"scale": t(ln.weight), "bias": t(ln.bias)},
                "fc1": conv_linear(mlp[0]),
                "fc2": conv_linear(mlp[3]),
            })
        return {"layers": layers}

    def conv_blocks(transformer):
        blocks = []
        for blk in transformer.resblocks:
            blocks.append({
                "ln_1": {"scale": t(blk.ln_1.weight), "bias": t(blk.ln_1.bias)},
                "attn": {
                    "qkv_w": t(blk.attn.in_proj_weight).T,
                    "qkv_b": t(blk.attn.in_proj_bias),
                    "out_w": t(blk.attn.out_proj.weight).T,
                    "out_b": t(blk.attn.out_proj.bias),
                },
                "ln_2": {"scale": t(blk.ln_2.weight), "bias": t(blk.ln_2.bias)},
                "mlp": {
                    "fc_w": t(blk.mlp.c_fc.weight).T,
                    "fc_b": t(blk.mlp.c_fc.bias),
                    "proj_w": t(blk.mlp.c_proj.weight).T,
                    "proj_b": t(blk.mlp.c_proj.bias),
                },
            })
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    def conv_lct(mod):
        return {
            "blocks": conv_blocks(mod.transformer),
            "hashing": {
                "w": jnp.stack([t(fc.weight)[0] for fc in mod.hashing.fc_list]),
                "b": jnp.stack([t(fc.bias)[0] for fc in mod.hashing.fc_list]),
            },
        }

    return {
        "gcl": {
            "mlp": conv_res_mlps(ref.gcl_i.mlp),
            "concept": conv_linear(ref.gcl_i.common_concept_embedding, bias=False),
        },
        "lct_i": conv_lct(ref.lct_i),
        "lct_t": conv_lct(ref.lct_t),
        "img_concept_proj": conv_linear(ref.img_concept_proj),
        "txt_concept_proj": conv_linear(ref.txt_concept_proj),
    }


def make_inputs():
    img_tokens = rng.randn(L_IMG, B, DIM).astype(np.float32)   # LND (reference)
    txt_tokens = rng.randn(L_TXT, B, DIM).astype(np.float32)
    img_cls = rng.randn(B, DIM).astype(np.float32)
    txt_eos = rng.randn(B, DIM).astype(np.float32)
    kpm = np.zeros((B, L_TXT), bool)
    kpm[:, -3:] = True
    return img_tokens, txt_tokens, img_cls, txt_eos, kpm


def test_hashing_model_forward_parity(ref_model):
    img_tokens, txt_tokens, img_cls, txt_eos, kpm = make_inputs()
    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(img_tokens), torch.from_numpy(txt_tokens),
            torch.from_numpy(img_cls), torch.from_numpy(txt_eos),
            torch.from_numpy(kpm))

    params = convert_hashing_model(ref_model)
    out = jmith.hashing_model(
        params,
        jnp.asarray(img_tokens.transpose(1, 0, 2)),   # -> batch-first
        jnp.asarray(txt_tokens.transpose(1, 0, 2)),
        jnp.asarray(img_cls), jnp.asarray(txt_eos),
        jnp.asarray(kpm), top_k=Args.top_k_label)

    pairs = [
        ("img_cls_hash", out.img_cls_hash, ref_out["img_cls_hash"]),
        ("txt_cls_hash", out.txt_cls_hash, ref_out["txt_cls_hash"]),
        ("res_img_cls", out.res_img_cls, ref_out["res_img_cls"]),
        ("res_txt_cls", out.res_txt_cls, ref_out["res_txt_cls"]),
        ("img_tokens_hash", out.img_tokens_hash, ref_out["img_tokens_hash"]),
        ("txt_tokens_hash", out.txt_tokens_hash, ref_out["txt_tokens_hash"]),
    ]
    for name, got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5,
                                   rtol=1e-4, err_msg=name)
    # trans tokens are KND in the reference
    np.testing.assert_allclose(
        np.asarray(out.trans_tokens_i).transpose(1, 0, 2),
        ref_out["trans_tokens_i"].numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.trans_tokens_t).transpose(1, 0, 2),
        ref_out["trans_tokens_t"].numpy(), atol=3e-5, rtol=1e-4)


def test_loss_components():
    import torch.nn.functional as F
    from einops import rearrange
    from ccmh.losses.mith import bayesian_loss, info_nce_loss, info_nce_loss_bmm

    a = np.tanh(rng.randn(20, KBITS)).astype(np.float32)
    b = np.tanh(rng.randn(B, KBITS)).astype(np.float32)
    sim = (rng.rand(20, B) < 0.4).astype(np.float32)

    ta, tb, ts = map(torch.from_numpy, (a, b, sim))
    s = 0.5 * (ta @ tb.t()).clamp(min=-64, max=64)
    expected = float(-torch.mean(ts * s - torch.log(1 + torch.exp(s))))
    got = float(bayesian_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(sim)))
    assert abs(got - expected) < 1e-6

    x = rng.randn(B, DIM).astype(np.float32)
    y = rng.randn(B, DIM).astype(np.float32)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    scores = tx @ ty.t() / 0.07
    targets = torch.arange(B)
    expected = float(0.5 * (F.cross_entropy(scores, targets)
                            + F.cross_entropy(scores.t(), targets)))
    got = float(info_nce_loss(jnp.asarray(x), jnp.asarray(y), 0.07))
    assert abs(got - expected) < 1e-4

    # bmm variant: inputs LND in the reference, batch-first here
    u = rng.randn(KBITS, B, DIM).astype(np.float32)
    v = rng.randn(KBITS, B, DIM).astype(np.float32)
    tu, tv = torch.from_numpy(u).permute(1, 0, 2), torch.from_numpy(v).permute(1, 0, 2)
    simm = torch.bmm(tu, tv.permute(0, 2, 1)) / 0.07
    word_num = simm.shape[1]
    s1 = rearrange(simm, "b n1 n2 -> (b n1) n2")
    s2 = rearrange(simm, "b n1 n2 -> (b n2) n1")
    tgt = torch.arange(word_num).repeat(B)
    expected = float(0.5 * (F.cross_entropy(s1, tgt) + F.cross_entropy(s2, tgt)))
    got = float(info_nce_loss_bmm(jnp.asarray(u.transpose(1, 0, 2)),
                                  jnp.asarray(v.transpose(1, 0, 2)), 0.07))
    assert abs(got - expected) < 1e-4
