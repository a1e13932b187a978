"""Whole-loop mAP parity: the reference's REAL ``run()``/``valid()`` epoch
loop (train/base.py:232-275 — train_epoch -> 4-way mAP valid -> best-epoch
tracking, torch CPU) vs the ccmh Trainer's production loop (the exact code
path ``python -m ccmh.cli`` drives), on identical on-disk data.

This is the closest achievable stand-in for the BASELINE "±0.3 mAP" target
(VERDICT r2 item 2): where the trajectory goldens stop at N steps of
loss/param agreement, these run BOTH full pipelines end to end — disk .mat
dataset -> split -> PIL transforms -> tokenize -> epochs of training ->
get_code -> mAP -> best-epoch decision — and assert the final best-epoch
mAPs and the extracted codes agree.

Alignment pins (same approach as test_trajectory):
* dropout off on both sides (torch/jax PRNGs cannot be aligned);
* shuffle off on both sides (torch DataLoader's shuffle stream is not
  replayable in numpy) — identical deterministic batch order;
* one caption per item (the reference picks with unseeded random.randint,
  dataset/base.py:66);
* images stored as JPEGs decoded by PIL on both sides (the ccmh native C++
  loader is disabled: its bicubic is parity-tested to <=2/255, not exact).

mAP tolerance absorbs tie-ordering noise: both metrics are exact for the
*definition*, but torch.sort's tie order differs from ccmh's stable-by-
index order, and on a 36-item gallery of 16-bit codes tie groups are large.
The bit-agreement assertion on the extracted codes is the tight one.
"""

import importlib
import logging
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT
from ccmh.clip.convert import convert_state_dict
from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.data.synthetic import write_synthetic_mat_dataset
from ccmh.train.trainer import Trainer

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

from tests.test_trajectory import (  # noqa: E402
    _DummyWriter, conv_dsie, conv_linear_hash, make_patched_mdpsih,
    make_ref_args, no_dropout, tiny_clip_pt, tnp,
)

TINY = ClipConfig.tiny()
N, NCLASS, B, K = 48, 24, 12, 16
QUERY_NUM, TRAIN_NUM, EPOCHS, SEED = 12, 24, 3, 1814
MAP_TOL = 0.05          # tie-permutation noise bound on a 36-item gallery
BIT_AGREE = 0.97        # extracted-code sign agreement (the tight check)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """One on-disk dataset (reference .mat layout, JPEG images) consumed by
    BOTH pipelines."""
    d = tmp_path_factory.mktemp("wl_data") / "data"
    return write_synthetic_mat_dataset(
        str(d), n=N, n_class=NCLASS, resolution=TINY.image_resolution,
        seed=3, jpeg=True, captions_per_item=1)


def make_loop_args(method_dir, method, clip_pt, data_dir, save_dir, **over):
    args = make_ref_args(
        method_dir, method, clip_pt,
        epochs=EPOCHS, batch_size=B, train_num=TRAIN_NUM, query_num=QUERY_NUM,
        resolution=TINY.image_resolution, num_workers=0,
        save_dir=str(save_dir), **over)
    # _init_dataset reads self.args.caption_file etc. (train/base.py:62-79;
    # upstream never defines them — the real runs must have set them on the
    # namespace, exactly as done here)
    args.caption_file = f"{data_dir}/caption.mat"
    args.index_file = f"{data_dir}/index.mat"
    args.label_file = f"{data_dir}/label.mat"
    return args


def build_ref_full(method_dir, cls_name, args):
    """Reference trainer with its REAL dataset init and epoch loop; only the
    train DataLoader is rebuilt shuffle-off for batch-order alignment."""
    from torch.utils.data import DataLoader

    ht = importlib.import_module(f"train.{method_dir}.hash_train")
    cls = getattr(ht, cls_name)
    t = cls.__new__(cls)
    t.args = args
    t.rank = "cpu"
    t.logger = logging.getLogger("ref_whole_loop")
    t.writer = _DummyWriter()
    t.global_step = 0
    t.max_mapi2t = 0
    t.max_mapt2i = 0
    t.best_epoch_i = 0
    t.best_epoch_t = 0
    t._init_dataset()
    t.train_loader = DataLoader(t.train_loader.dataset, batch_size=B,
                                shuffle=False, num_workers=0)
    # eval loaders unshuffled too: get_code scatters by index so ORDER never
    # matters, but batch COMPOSITION does for TwDH's batch-statistics BN
    # eval (its valid never leaves train mode; see ccmh/train/methods/twdh.py)
    t.query_loader = DataLoader(t.query_loader.dataset, batch_size=B,
                                shuffle=False, num_workers=0)
    t.retrieval_loader = DataLoader(t.retrieval_loader.dataset, batch_size=B,
                                    shuffle=False, num_workers=0)
    t._init_model()
    return t, ht


def build_ccmh_trainer(method, data_dir, tmp_path, clip_params, monkeypatch,
                       output_dim=K, **cfg_over):
    # both sides must decode JPEGs with PIL (exactness; see module docstring)
    import ccmh.data.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    cfg = Config(
        method=method, dataset="flickr", output_dim=output_dim, nclass=NCLASS,
        epochs=EPOCHS, batch_size=B, query_num=QUERY_NUM, train_num=TRAIN_NUM,
        eval_batch=B, resolution=TINY.image_resolution, data_dir=str(data_dir),
        save_dir=str(tmp_path / f"ccmh_{method}"), seed=SEED, shuffle=False,
        display_step=1000, num_workers=2, save_mat=False, **cfg_over)
    return Trainer(cfg, clip_cfg=TINY, clip_params=clip_params)


def override_params(trainer, heads, extra=None, aux_updates=None):
    """Start the ccmh run from the torch model's exact initial weights."""
    params = dict(trainer.state.params)
    params.update(heads)
    aux = trainer.state.aux
    if aux_updates:
        aux = {**aux, **aux_updates}
    trainer.state = trainer.state._replace(
        params=params,
        extra=extra if extra is not None else trainer.state.extra,
        aux=aux)


def assert_maps_agree(t_ref, trainer, method):
    ref_i2t, ref_t2i = float(t_ref.max_mapi2t), float(t_ref.max_mapt2i)
    got_i2t, got_t2i = trainer.max_mapi2t, trainer.max_mapt2i
    assert abs(got_i2t - ref_i2t) < MAP_TOL, (method, got_i2t, ref_i2t)
    assert abs(got_t2i - ref_t2i) < MAP_TOL, (method, got_t2i, ref_t2i)


def assert_codes_agree(pairs, method):
    """(name, ref torch codes, ccmh codes): near-total sign agreement."""
    for name, ref_c, got_c in pairs:
        ref_np = np.sign(tnp(ref_c))
        agree = np.mean(ref_np == np.sign(np.asarray(got_c, np.float32)))
        assert agree >= BIT_AGREE, (method, name, agree)


def assert_loops_agree(t_ref, trainer, method):
    """Best-epoch mAPs within tie tolerance + near-total code agreement."""
    assert_maps_agree(t_ref, trainer, method)

    # final-model extracted codes: sign parity query+retrieval, both towers
    with torch.no_grad():
        get = {"MITH": getattr(t_ref, "get_code_MITH", None),
               "DCHMT": getattr(t_ref, "get_code_DCHMT", None),
               "DNPH": getattr(t_ref, "get_code_DNPH", None)}.get(
            method) or t_ref.get_code
        rq_i, rq_t, _ = get(t_ref.query_loader, QUERY_NUM)
        rr_i, rr_t, _ = get(t_ref.retrieval_loader, t_ref.args.retrieval_num)
    cq_i, cq_t, _ = trainer.get_code(trainer.query_loader, QUERY_NUM)
    cr_i, cr_t, _ = trainer.get_code(
        trainer.retrieval_loader, len(trainer.retrieval_data))
    assert_codes_agree(
        [("q_img", rq_i, cq_i), ("q_txt", rq_t, cq_t),
         ("r_img", rr_i, cr_i), ("r_txt", rr_t, cr_t)], method)


# --------------------------------------------------------------- linear family
def test_whole_loop_dsph(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                         data_dir):
    """3 full epochs of the REAL DSPHTrainer loop (train_epoch + valid +
    best-epoch tracking) vs the ccmh Trainer on the same on-disk dataset:
    best-epoch i2t/t2i mAP and final codes agree."""
    loss_mod = importlib.import_module("train.DSPH.loss")
    args = make_loop_args("DSPH", "DSPH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS)
    monkeypatch.setattr(loss_mod, "get_args", lambda *a, **k: args)

    t, _ = build_ref_full("DSPH", "DSPHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash)}
    extra = {"proxies": jnp.asarray(tnp(t.hyp.proxies))}

    trainer = build_ccmh_trainer("DSPH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads, extra=extra)

    # pin the coverage claim: the reference default alpha=0.8 (>0) means
    # this loop exercises the codetable-threshold pairwise REGULARIZER
    # branch (train/DSPH/loss.py:42-62), not just the proxy terms
    assert args.alpha > 0 and trainer.cfg.dsph.alpha == args.alpha

    t.train()          # the real reference loop: 3x (train_epoch+valid+save)
    trainer.train()    # the production ccmh loop (cli.py's Trainer.run path)

    assert_loops_agree(t, trainer, "DSPH")


# --------------------------------------------------------------------- DCHMT
def test_whole_loop_dchmt(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                          data_dir):
    """3 full epochs of the REAL DCHMTTrainer loop against the ccmh Trainer.
    The distinct piece is the EVAL encode: base.valid dispatches DCHMT to
    get_code_DCHMT (train/base.py:160-177), whose codes come from argmax
    over each bit's 2-way soft pair (make_hash_code_DCHMT, :149-157 —
    argmax 0 -> -1) rather than sign().  The other whole-loop tests all
    use sign-style codes; with this and test_whole_loop_dnph every
    get_code/valid variant in the reference runs the full loop."""
    args = make_loop_args("DCHMT", "DCHMT", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS,
                          display_step=10**9)
    assert args.hash_layer == "select"
    t, _ = build_ref_full("DCHMT", "DCHMTTrainer", args)

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY

    def conv_select(mod):
        pairs_w = np.stack(
            [tnp(lin.weight).T for lin in mod.hash_list], axis=1)  # [128,K,2]
        pairs_b = np.stack([tnp(lin.bias) for lin in mod.hash_list])
        return {"fc_w": jnp.asarray(tnp(mod.fc.weight).T),
                "fc_b": jnp.asarray(tnp(mod.fc.bias)),
                "pairs_w": jnp.asarray(pairs_w),
                "pairs_b": jnp.asarray(pairs_b)}

    heads = {"img_head": conv_select(t.model.image_hash),
             "txt_head": conv_select(t.model.text_hash)}

    trainer = build_ccmh_trainer("DCHMT", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DCHMT")


def test_whole_loop_dchmt_cosine(tiny_clip_pt, no_dropout, monkeypatch,
                                 tmp_path, data_dir):
    """DCHMT with ``--similarity-function cosine`` (train/DCHMT/
    get_args.py:12; similarity_loss's cosine branch with the
    clip(threshold)-threshold positive and 1-bounded negative,
    hash_train.py:100-110) — the config branch the default euclidean loop
    never executes.  Same select heads and eval as the default test."""
    from ccmh.config import DCHMTConfig

    args = make_loop_args("DCHMT", "DCHMT", tiny_clip_pt, data_dir,
                          tmp_path / "ref_cos", numclass=NCLASS,
                          display_step=10**9,
                          similarity_function="cosine")
    assert args.hash_layer == "select" and args.similarity_function == "cosine"
    t, _ = build_ref_full("DCHMT", "DCHMTTrainer", args)

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY

    def conv_select(mod):
        pairs_w = np.stack(
            [tnp(lin.weight).T for lin in mod.hash_list], axis=1)
        pairs_b = np.stack([tnp(lin.bias) for lin in mod.hash_list])
        return {"fc_w": jnp.asarray(tnp(mod.fc.weight).T),
                "fc_b": jnp.asarray(tnp(mod.fc.bias)),
                "pairs_w": jnp.asarray(pairs_w),
                "pairs_b": jnp.asarray(pairs_b)}

    heads = {"img_head": conv_select(t.model.image_hash),
             "txt_head": conv_select(t.model.text_hash)}

    trainer = build_ccmh_trainer(
        "DCHMT", data_dir, tmp_path, clip_params, monkeypatch,
        dchmt=DCHMTConfig(similarity_function="cosine"))
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DCHMT")


def test_whole_loop_dchmt_linear(tiny_clip_pt, no_dropout, monkeypatch,
                                 tmp_path, data_dir):
    """DCHMT ``--hash-layer linear`` (get_args.py:11 "linear: sign
    function").  The reference path is UNCONSTRUCTIBLE upstream: MDCMHT
    always builds select HashLayers (model/DCHMT.py:40-42), our_loss then
    calls an undefined ``self.hash_loss`` (hash_train.py:130-131), and
    make_hash_code_DCHMT's permute(1,0,2) crashes on 2-D codes
    (train/base.py:150-157).  As with DDWSH, the loop runs with the three
    evident-intent repairs injected into the REFERENCE, mirroring the
    ccmh repairs (ccmh/losses/dchmt.py:66-71):
      * heads = the codebase's own modelbase.LinearHash (tanh(fc));
      * hash_loss = the DCHMT-paper quantization mean((|h|-1)^2);
      * linear-mode code extraction = sign().
    """
    from ccmh.config import DCHMTConfig
    import model.DCHMT as ref_model_mod
    from model.modelbase import LinearHash as RefLinearHash

    # repair 1: linear heads (same ctor kwargs as HashLayer)
    monkeypatch.setattr(ref_model_mod, "HashLayer", RefLinearHash)

    args = make_loop_args("DCHMT", "DCHMT", tiny_clip_pt, data_dir,
                          tmp_path / "ref_lin", numclass=NCLASS,
                          display_step=10**9, hash_layer="linear")
    t, _ = build_ref_full("DCHMT", "DCHMTTrainer", args)
    assert isinstance(t.model.image_hash, RefLinearHash)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0
    # repair 2: the undefined quantization term
    t.hash_loss = lambda h: torch.pow(torch.abs(h) - 1.0, 2).mean()
    # repair 3: sign extraction for 2-D codes
    t.make_hash_code_DCHMT = torch.sign

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash)}

    trainer = build_ccmh_trainer(
        "DCHMT", data_dir, tmp_path, clip_params, monkeypatch,
        dchmt=DCHMTConfig(hash_layer="linear"))
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DCHMT")


# ---------------------------------------------------------------------- MITH
def test_whole_loop_mith(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                         data_dir):
    """3 full epochs of the REAL MITHTrainer loop (token pipeline, epoch-
    persistent buffers, get_code_MITH eval) vs the ccmh Trainer."""
    import copy

    from tests.test_mith import convert_hashing_model

    mm = importlib.import_module("model.MITH")
    ht = importlib.import_module("train.MITH.hash_train")
    args = make_loop_args("MITH", "MITH", tiny_clip_pt, data_dir,
                          tmp_path / "ref")

    def tiny_mith(args=None):
        m = mm.MITH.__new__(mm.MITH)
        torch.nn.Module.__init__(m)
        m.args = args
        m.clip = mm.load_download_clip(args.clip_path)
        m.hash = mm.HashingModel(clip_embed_dim=TINY.embed_dim, args=args)
        return m

    monkeypatch.setattr(ht, "MITH", tiny_mith)
    torch.manual_seed(3)
    t, _ = build_ref_full("MITH", "MITHTrainer", args)

    # identical starting buffers on both sides (reference: torch.randn,
    # train/MITH/hash_train.py:45-49)
    rng = np.random.RandomState(11)
    buf0 = {name: rng.randn(TRAIN_NUM, K).astype(np.float32)
            for name in ("img_tokens", "img_cls", "txt_tokens", "txt_cls")}
    t.img_buffer_tokens = torch.from_numpy(buf0["img_tokens"].copy())
    t.img_buffer_cls = torch.from_numpy(buf0["img_cls"].copy())
    t.txt_buffer_tokens = torch.from_numpy(buf0["txt_tokens"].copy())
    t.txt_buffer_cls = torch.from_numpy(buf0["txt_cls"].copy())

    frozen = copy.deepcopy(t.model)
    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in frozen.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"hash": convert_hashing_model(frozen.hash)}

    trainer = build_ccmh_trainer("MITH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(
        trainer, heads,
        aux_updates={"buffers": {k: jnp.asarray(v) for k, v in buf0.items()}})

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "MITH")


# ---------------------------------------------------------------- DNPH (TOMM)
def test_whole_loop_dnph(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                         data_dir):
    """3 full epochs of the REAL DNPHTOMMTrainer loop vs the ccmh Trainer,
    through the reference's OWN get_code_DNPH eval (tuple-unpack + sign,
    train/base.py:205-228).

    Upstream landmine documented here: main.py registers the trainer under
    method name 'DNPH' (main.py:23) but base.valid dispatches get_code_DNPH
    only on 'DNPH-TOMM' (train/base.py:253) — with the shipped name the
    else-branch get_code calls torch.sign on the model's (embed, label_pre)
    TUPLE and crashes, so the committed DNPH valid loop is unrunnable.
    This test sets args.method = 'DNPH-TOMM' so the clearly-intended eval
    branch runs; ccmh's DNPH encode implements exactly that branch.

    The ±1 Hungarian-regularizer noise is unalignable RNG (reference: the
    numpy global stream, b_reg.py:5-17; ccmh: jax PRNG), so BOTH sides are
    pinned to one fixed matrix as in test_dnph_trajectory; the per-step
    Hungarian assignment itself still evolves with the codes.  The proxy
    SGD stays at the reference-faithful default (constructed, never
    stepped — config dnph.repair_proxy_sgd=False)."""
    import train.DNPH_TOMM.hash_train as ht_mod

    import ccmh.losses.dnph_tomm as dnph_mod
    import ccmh.train.methods.dnph_tomm as dnph_method_mod
    from tests.test_trajectory import conv_linear_hash as conv_lh  # noqa: F811

    noise0 = (np.random.RandomState(9).randint(0, 2, (B, K)) * 2 - 1)
    monkeypatch.setattr(ht_mod, "rand_unit_rect", lambda b, k: noise0.copy())

    def fixed_noise_reg(rng, hash_img, hash_txt):
        noise = jnp.asarray(noise0, jnp.float32)
        i_noise = dnph_mod.assign_noise(hash_img, noise)
        t_noise = dnph_mod.assign_noise(hash_txt, noise)
        return (jnp.mean(jnp.sum(hash_img * i_noise, axis=-1))
                + jnp.mean(jnp.sum(hash_txt * t_noise, axis=-1)))

    monkeypatch.setattr(dnph_method_mod, "noise_regularizer", fixed_noise_reg)

    args = make_loop_args("DNPH_TOMM", "DNPH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", nclass=NCLASS)
    args.method = "DNPH-TOMM"  # see docstring: the shipped name crashes
    t, _ = build_ref_full("DNPH_TOMM", "DNPHTOMMTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY

    def conv_pre(mod):
        return {"w": jnp.asarray(tnp(mod.fc.weight).T),
                "b": jnp.asarray(tnp(mod.fc.bias))}

    heads = {"img_head": conv_lh(t.model.image_hash),
             "txt_head": conv_lh(t.model.text_hash),
             "img_pre": conv_pre(t.model.image_pre),
             "txt_pre": conv_pre(t.model.text_pre)}
    extra = {"proxies": jnp.asarray(tnp(t.DNPH.proxies))}

    trainer = build_ccmh_trainer("DNPH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads, extra=extra)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DNPH")


# ---------------------------------------------------------------------- TwDH
def test_whole_loop_twdh(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                         data_dir):
    """3 full epochs of the REAL TwDHTrainer loop — its OWN overridden
    valid() (long + per-short-length valid_each, multi-code get_code,
    train/TwDH/hash_train.py:206-253) against the ccmh Trainer's
    valid/valid_multi, using the real mirflickr center/trans assets on both
    sides (ccmh's npz is the converted pkl set).  The live image-side
    BatchNorm makes this the stateful-eval family; the ±1 center tie fill
    is pinned to +1 on both sides as in test_twdh_trajectory."""
    from ccmh.losses.twdh import load_twdh_assets  # noqa: F401 (asset check)

    LONG = 512
    root = f"{REFERENCE_ROOT}/train/TwDH/center/mirflickr"
    monkeypatch.setattr(torch, "randint_like",
                        lambda t, high, **kw: torch.ones_like(t))
    monkeypatch.setattr(
        jax.random, "randint",
        lambda key, shape, minval, maxval, dtype=jnp.int32:
            jnp.ones(shape, jnp.int32))

    args = make_loop_args("TwDH", "TwDH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", output_dim=LONG,
                          long_center=f"{root}/long",
                          short_center=f"{root}/short",
                          trans_matrix=f"{root}/trans")
    t, _ = build_ref_full("TwDH", "TwDHTrainer", args)

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY

    def conv_modality(mod, layernorm):
        e = mod.atten.embed_dim
        ipw, ipb = tnp(mod.atten.in_proj_weight), tnp(mod.atten.in_proj_bias)
        p = {
            "v_w": jnp.asarray(ipw[2 * e:3 * e].T),
            "v_b": jnp.asarray(ipb[2 * e:3 * e]),
            "out_w": jnp.asarray(tnp(mod.atten.out_proj.weight).T),
            "out_b": jnp.asarray(tnp(mod.atten.out_proj.bias)),
            "fc2_w": jnp.asarray(tnp(mod.fc2.weight).T),
            "fc2_b": jnp.asarray(tnp(mod.fc2.bias)),
        }
        key = "ln" if layernorm else "bn"
        p[key] = {"scale": jnp.asarray(tnp(mod.norm.weight)),
                  "bias": jnp.asarray(tnp(mod.norm.bias))}
        return p

    heads = {"img_head": conv_modality(t.model.img_hash, layernorm=False),
             "txt_head": conv_modality(t.model.txt_hash, layernorm=True)}

    trainer = build_ccmh_trainer("TwDH", data_dir, tmp_path, clip_params,
                                 monkeypatch, output_dim=LONG)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    # long-code best-epoch trackers (the reference's max_mapi2t/t2i ARE the
    # long-code maxima, hash_train.py:227-236)
    assert_maps_agree(t, trainer, "TwDH")
    # per-short-length maxima vs ccmh's valid_multi trackers
    for short, best in t.max_short.items():
        got = trainer.max_multi[f"short{short}"]
        assert abs(got["i2t"] - float(best["i2t"])) < MAP_TOL, (short, got, best)
        assert abs(got["t2i"] - float(best["t2i"])) < MAP_TOL, (short, got, best)

    # final codes: long + every short length, all four buffers
    with torch.no_grad():
        rq_li, rq_lt, rq_si, rq_st = t.get_code(t.query_loader, QUERY_NUM)
        rr_li, rr_lt, rr_si, rr_st = t.get_code(
            t.retrieval_loader, t.args.retrieval_num)
    cq = trainer._get_multi_codes(trainer.query_loader, QUERY_NUM)
    cr = trainer._get_multi_codes(
        trainer.retrieval_loader, len(trainer.retrieval_data))
    pairs = [("q_long_img", rq_li, cq["long"][0]),
             ("q_long_txt", rq_lt, cq["long"][1]),
             ("r_long_img", rr_li, cr["long"][0]),
             ("r_long_txt", rr_lt, cr["long"][1])]
    def pick(d, short):
        # the reference buffers key by the raw dict key, which is a STRING
        # (valid_each does short = int(short), hash_train.py:240)
        return d[short] if short in d else d[str(short)]

    for short in t.max_short:
        pairs += [(f"q_short{short}_img", pick(rq_si, short), cq[f"short{short}"][0]),
                  (f"q_short{short}_txt", pick(rq_st, short), cq[f"short{short}"][1]),
                  (f"r_short{short}_img", pick(rr_si, short), cr[f"short{short}"][0]),
                  (f"r_short{short}_txt", pick(rr_st, short), cr[f"short{short}"][1])]
    assert_codes_agree(pairs, "TwDH")


# ---------------------------------------------------------------------- DPBE
def test_whole_loop_dpbe(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                         data_dir):
    """3 full epochs of the REAL DPBETrainer loop — posterior-sampled heads,
    per-step Hessian EMA, its OWN get_code (use_lam: mean of sampled
    normalized codes then sign, train/DPBE/hash_train.py:195-242) — vs the
    ccmh Trainer.  The stateful-Bayesian family the other three whole-loop
    tests don't cover.

    Pins (as in test_dpbe_trajectory): posterior sampling = mu exactly on
    both sides (torch laplace.sample and ccmh sample_head), train_n_samples
    = 1 so the reference's loss-overwrite-then-divide quirk is the mean,
    and the double-hashing bug is repaired (model.forward -> encoding)."""
    import model.modelbase as modelbase

    if not hasattr(modelbase, "Pre_Layer"):  # model/DPBE.py:5 upstream bug
        modelbase.Pre_Layer = importlib.import_module(
            "model.DNPH_TOMM").Pre_Layer
    stochman_root = f"{REFERENCE_ROOT}/train/DPBE/stochman"
    if stochman_root not in sys.path:
        sys.path.insert(0, stochman_root)

    args = make_loop_args("DPBE", "DPBE", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS,
                          train_n_samples=1, valid_n_samples=1)
    t, _ = build_ref_full("DPBE", "DPBETrainer", args)

    t.model.forward = t.model.encoding
    monkeypatch.setattr(
        t.laplace, "sample",
        lambda parameters, posterior_scale, n_samples=100:
            parameters.view(1, -1).repeat(int(n_samples), 1))

    import ccmh.losses.dpbe as dpbe_mod

    monkeypatch.setattr(dpbe_mod, "sample_head", lambda rng, mu, sigma: mu)

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY

    def conv_l2norm_head(mod):
        sd = {k: v for k, v in mod.state_dict().items()}
        (wk,) = [k for k in sd if k.endswith("weight")]
        (bk,) = [k for k in sd if k.endswith("bias")]
        return {"w": jnp.asarray(tnp(sd[wk]).T), "b": jnp.asarray(tnp(sd[bk]))}

    heads = {"img_head": conv_l2norm_head(t.model.image_hash),
             "txt_head": conv_l2norm_head(t.model.text_hash)}

    trainer = build_ccmh_trainer("DPBE", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    trainer.cfg.dpbe.n_samples = 1
    assert trainer.cfg.dpbe.hessian_ema == args.hessian_memory_factor
    # both sides init the Hessians to train_num * ones (stochman laplace
    # init_hessian vs methods/dpbe._init) — no aux override needed
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DPBE")


# ---------------------------------------------------------------- DNpH (TMM)
def test_whole_loop_dnph_tmm(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                             data_dir):
    """3 full epochs of the REAL DNpHTMMTrainer loop (qmi loss + BertAdam,
    train/DNpH_TMM/hash_train.py:46-74 — the simplest trainer in the suite)
    vs the ccmh Trainer.  qmi_loss hardcodes torch.cuda.FloatTensor
    (loss.py:41, recorded device bug); aliased to the CPU type."""
    monkeypatch.setattr(torch.cuda, "FloatTensor", torch.FloatTensor,
                        raising=False)

    args = make_loop_args("DNpH_TMM", "DNpH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS)
    t, _ = build_ref_full("DNpH_TMM", "DNpHTMMTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash)}

    trainer = build_ccmh_trainer("DNpH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DNpH")


# ------------------------------------------------------------------- DMsH_LN
def test_whole_loop_dmsh_ln(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                            data_dir):
    """3 full epochs of the REAL DMsH_LNTrainer loop — LabelNet in the
    BertAdam groups with the epoch-annealed alpha = sqrt(epoch+1)
    (labelnet.py:6-22, set per epoch at train/DMsH_LN/hash_train.py:54) —
    vs the ccmh Trainer.  The multi-epoch annealing is exactly what the
    1-epoch trajectory golden could not cover.  The reference's MSL
    cuda:1 cast (hash_train.py:35, recorded bug) is redirected to CPU."""
    orig_to = torch.nn.Module.to

    def cpu_to(self, *a, **k):
        a = tuple("cpu" if isinstance(x, (str, torch.device)) and "cuda" in str(x)
                  else x for x in a)
        if "device" in k and "cuda" in str(k.get("device")):
            k["device"] = "cpu"
        return orig_to(self, *a, **k)

    monkeypatch.setattr(torch.nn.Module, "to", cpu_to)

    args = make_loop_args("DMsH_LN", "DMsH_LN", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS)
    t, _ = build_ref_full("DMsH_LN", "DMsH_LNTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY

    def conv_label_net(mod):
        return {"fc1": {"w": jnp.asarray(tnp(mod.fc1.weight).T),
                        "b": jnp.asarray(tnp(mod.fc1.bias))},
                "fc2": {"w": jnp.asarray(tnp(mod.fc2.weight).T),
                        "b": jnp.asarray(tnp(mod.fc2.bias))}}

    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash),
             "label_net": conv_label_net(t.L_net)}

    trainer = build_ccmh_trainer("DMsH_LN", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DMsH_LN")


# --------------------------------------------------------------------- DHaPH
def test_whole_loop_dhaph(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                          data_dir):
    """3 full epochs of the REAL DHaPHTrainer loop — three optimizers
    (BertAdam + 2x AdamW over HPmodel/LCAs, hash_train.py:44-50) and the
    self-paced MS ramp over epochs (MSLoss.py:26-31) — vs the ccmh Trainer,
    with ``alpha=0`` on BOTH sides: the hyperbolic term's reciprocal-topk
    mining draws from the global numpy RNG inside the forward
    (HPloss.py:162-183), unalignable with the jax PRNG (its Poincare math
    has its own goldens, test_dhaph.py).  The HP extras still step under
    AdamW's decoupled decay on both sides; codes never depend on them."""
    import functools

    import ccmh.losses.dhaph as dhaph_loss_mod
    import ccmh.train.methods.dhaph as dhaph_method_mod

    monkeypatch.setattr(
        dhaph_method_mod, "dhaph_loss",
        functools.partial(dhaph_loss_mod.dhaph_loss, alpha=0.0))

    # HPloss.py:125 hardcodes `.to(0)` (a CUDA ordinal) in its constructor
    orig_tensor_to = torch.Tensor.to

    def cpu_tensor_to(self, *a, **k):
        a = tuple("cpu" if ((isinstance(x, int) and not isinstance(x, bool))
                            or (isinstance(x, (str, torch.device))
                                and "cuda" in str(x))) else x for x in a)
        if "device" in k and ("cuda" in str(k["device"])
                              or (isinstance(k["device"], int)
                                  and not isinstance(k["device"], bool))):
            k["device"] = "cpu"
        return orig_tensor_to(self, *a, **k)

    monkeypatch.setattr(torch.Tensor, "to", cpu_tensor_to)

    # topk=4: the production default (15) exceeds the B=12 similarity matrix
    # in the (alpha-0-weighted but still executed) HP forward
    args = make_loop_args("DHaPH", "DHaPH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS, alpha=0, topk=4)
    t, _ = build_ref_full("DHaPH", "DHaPHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash)}

    trainer = build_ccmh_trainer("DHaPH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    trainer.cfg.dhaph.topk = args.topk
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DHaPH")


# --------------------------------------------------------------------- DScPH
def test_whole_loop_dscph(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                          data_dir):
    """3 full epochs of the REAL DScPHTrainer loop (CPF proxies in the
    BertAdam groups + Householder bit-variance quantization) vs the ccmh
    Trainer with the repair gate ``dscph.train_rot=False``: the reference
    never optimizes the rotation (hash_train.py:37-44, recorded bug), so
    reference-faithful dynamics keep it frozen at identity.  CPF's
    hardcoded `device=1` (hash_train.py:36) is redirected to CPU."""
    import train.DScPH.hash_train as ht_mod

    real_cpf_cls = ht_mod.CPF
    monkeypatch.setattr(
        ht_mod, "CPF",
        lambda embed_dim, n_classes, device: real_cpf_cls(
            embed_dim, n_classes, "cpu"))

    args = make_loop_args("DScPH", "DScPH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", nclass=NCLASS)
    t, _ = build_ref_full("DScPH", "DScPHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash),
             "loss_heads": {
                 "cpf": {"weight": jnp.asarray(tnp(t.cpf.weight))},
                 "rot": {"weights": jnp.asarray(tnp(t.rot.weights))},
             }}

    trainer = build_ccmh_trainer("DScPH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    trainer.cfg.dscph.train_rot = False
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DScPH")


# ---------------------------------------------------------------------- DDBH
def test_whole_loop_ddbh(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                         data_dir):
    """3 full epochs of the REAL DDBHTrainer loop (3x boundary-point loss +
    similarity-weighted quantization, train/DDBH/hash_train.py:48-86) vs
    the ccmh Trainer.  Upstream DDBH is unconstructible as committed — the
    same two injected-name repairs the trajectory golden documents
    (loss.py:7 ``DAMHLoss``; model/DDBH.py:15 ``super(MDNpH, ...)``) make
    the reference class runnable."""
    import train.DDBH.loss as ddbh_loss_mod
    import model.DDBH as ddbh_model_mod

    if not hasattr(ddbh_loss_mod, "DAMHLoss"):
        ddbh_loss_mod.DAMHLoss = ddbh_loss_mod.BPLoss
    if not hasattr(ddbh_model_mod, "MDNpH"):
        ddbh_model_mod.MDNpH = ddbh_model_mod.MDDBH

    args = make_loop_args("DDBH", "DDBH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS)
    t, _ = build_ref_full("DDBH", "DDBHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash)}

    trainer = build_ccmh_trainer("DDBH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DDBH")


# --------------------------------------------------------------------- DDWSH
def test_whole_loop_ddwsh(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                          data_dir):
    """3 full epochs of the REAL DDWSHTrainer loop (margin loss + trainable
    per-class beta + distance-weighted miner, train/DDWSH/hash_train.py:
    54-77) vs the ccmh Trainer.

    Upstream DDWSH is unconstructible as committed; the minimal injected
    repairs match the interpretation ccmh/losses/ddwsh.py documents:
    * get_args references undefined ``args.loss``/``args.miner`` for its
      save-dir join (get_args.py:17) — supplied as strings;
    * ``MarginLoss.forward`` reads the never-defined ``self.beta_constant``
      (loss.py:32) — injected False, the per-class-beta branch its
      ``Parameter(nclass)`` init clearly intends.
    (The third recorded bug — the miner constructed with the args namespace
    as ``tau``, loss.py:14 — needs no repair: tau is never read.)

    The miner draws positives/negatives from the global numpy RNG per
    anchor (loss.py:101-122), unalignable with the jax PRNG, so BOTH sides
    are pinned to the same deterministic rule: first eligible positive,
    argmax-probability negative.  The inverse-sphere-distance weighting
    itself still computes live on both sides — only the final draw is
    pinned — and the per-class beta gradient flows through the pinned
    triplets, so the trainable-beta dynamics are covered end to end."""
    import train.DDWSH.get_args as ddwsh_ga_mod
    import train.DDWSH.loss as ddwsh_loss_mod

    orig_ga = ddwsh_ga_mod.get_args

    def patched_ga(main_args):
        main_args.loss = "margin"
        main_args.miner = "distanceweighted"
        return orig_ga(main_args)

    monkeypatch.setattr(ddwsh_ga_mod, "get_args", patched_ga)
    monkeypatch.setattr(ddwsh_loss_mod.MarginLoss, "beta_constant", False,
                        raising=False)

    def det_choice(a, p=None):
        if p is not None:
            idx = int(np.argmax(np.asarray(p)))
            return idx if isinstance(a, (int, np.integer)) \
                else np.asarray(a).ravel()[idx]
        return np.asarray(a).ravel()[0]

    monkeypatch.setattr(np.random, "choice", det_choice)
    monkeypatch.setattr(
        jax.random, "categorical",
        lambda key, logits, axis=-1: jnp.argmax(logits, axis=axis))

    args = make_loop_args("DDWSH", "DDWSH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", nclass=NCLASS)
    t, _ = build_ref_full("DDWSH", "DDWSHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash),
             "loss_heads": {"beta": jnp.asarray(tnp(t.criterion.beta))}}

    trainer = build_ccmh_trainer("DDWSH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DDWSH")


# --------------------------------------------------------------------- DPSIH
def test_whole_loop_dpsih(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                          data_dir):
    """3 full epochs of the REAL DPSIHTrainer loop vs the ccmh Trainer —
    the multi-embed eval variant, closing the 13th method in this harness.

    The model runs via the same tiny-width patch as the trajectory golden
    (make_patched_mdpsih); the trainer/optimizer/loss run unmodified.  The
    one injected repair is the eval: base.get_code buffers
    ``[N, output_dim]`` and shape-crashes on DPSIH's ``[B, E, K]``
    multi-embed codes (train/base.py:130-148), and base.valid's
    ``calc_map_k`` cannot rank them — while the reference SHIPS the
    multi-embed mAP oracle in train/DPSIH/_utils.py:5-31 and never wires it
    in.  The injected ``valid`` buffers sign codes at the full ``[N, E, K]``
    shape and scores all four directions with that shipped oracle,
    preserving base.valid's best-epoch tracking verbatim
    (train/base.py:242-275).  ccmh's production path ranks the same codes
    through its max-over-embed-pairs dist_fn (methods/dpsih.py:66-77),
    which is parity-tested against the same oracle in test_ops."""
    import train.DPSIH._utils as ref_utils
    import train.DPSIH.hash_train as ht_mod

    args = make_loop_args("DPSIH", "DPSIH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", numclass=NCLASS)
    n_embeds = args.num_embeds
    assert n_embeds == 4  # ccmh methods/dpsih.py NUM_EMBEDS
    assert args.dropout == 0.0

    monkeypatch.setattr(ht_mod, "MDPSIH", make_patched_mdpsih(n_embeds, K))
    t, _ = build_ref_full("DPSIH", "DPSIHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    def get_code_multi(loader, length):
        img_buf = torch.empty(length, n_embeds, K)
        txt_buf = torch.empty(length, n_embeds, K)
        with torch.no_grad():
            for image, text, label, index in loader:
                idx = index.numpy()
                img_buf[idx] = torch.sign(t.model.encode_image(image).data)
                txt_buf[idx] = torch.sign(t.model.encode_text(text).data)
        return img_buf, txt_buf, 0.0

    def valid_multi(epoch):
        t.change_state(mode="valid")
        q_i, q_t, _ = get_code_multi(t.query_loader, args.query_num)
        r_i, r_t, _ = get_code_multi(t.retrieval_loader, args.retrieval_num)
        mAPi2t = ref_utils.mean_average_precision(
            q_i, r_t, t.query_labels, t.retrieval_labels)
        mAPt2i = ref_utils.mean_average_precision(
            q_t, r_i, t.query_labels, t.retrieval_labels)
        # best-epoch tracking + save_mat verbatim from train/base.py:262-270
        # (save_mat also creates save_dir — train() relies on that before
        # its save_model call, base.py:331)
        if t.max_mapi2t < mAPi2t:
            t.best_epoch_i = epoch
            t.save_mat(q_i, q_t, r_i, r_t, mode_name="i2t")
        t.max_mapi2t = max(t.max_mapi2t, mAPi2t)
        if t.max_mapt2i < mAPt2i:
            t.best_epoch_t = epoch
            t.save_mat(q_i, q_t, r_i, r_t, mode_name="t2i")
        t.max_mapt2i = max(t.max_mapt2i, mAPt2i)

    t.valid = valid_multi

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash),
             "dsie_i": conv_dsie(t.model.DSIE_i),
             "dsie_t": conv_dsie(t.model.DSIE_t)}

    trainer = build_ccmh_trainer("DPSIH", data_dir, tmp_path, clip_params,
                                 monkeypatch)
    override_params(trainer, heads)

    t.train()
    trainer.train()

    assert_maps_agree(t, trainer, "DPSIH")

    # final codes: reference [N, E, K] vs ccmh flattened [N, E*K]
    rq_i, rq_t, _ = get_code_multi(t.query_loader, QUERY_NUM)
    rr_i, rr_t, _ = get_code_multi(t.retrieval_loader, args.retrieval_num)
    cq_i, cq_t, _ = trainer.get_code(trainer.query_loader, QUERY_NUM)
    cr_i, cr_t, _ = trainer.get_code(
        trainer.retrieval_loader, len(trainer.retrieval_data))
    assert_codes_agree(
        [("q_img", rq_i.reshape(QUERY_NUM, -1), cq_i),
         ("q_txt", rq_t.reshape(QUERY_NUM, -1), cq_t),
         ("r_img", rr_i.reshape(args.retrieval_num, -1), cr_i),
         ("r_txt", rr_t.reshape(args.retrieval_num, -1), cr_t)], "DPSIH")


# -------------------------------------------------------------------- DGHDGH
def test_whole_loop_dghdgh(tiny_clip_pt, no_dropout, monkeypatch, tmp_path,
                           data_dir):
    """3 full epochs of the REAL DGHDGHTrainer loop (GNN-synthesized hard
    negatives, three backward/step phases per batch with the adaptive-λ3
    quirk, train/DGHDGH/hash_train.py:65-137) vs the ccmh Trainer in its
    reference-faithful ``dghdgh.sequenced`` mode — the 14th and last method
    in the whole-loop matrix.

    Upstream DGHDGH is unrunnable as committed: loss.py:10-12 imports three
    modules absent from the snapshot, get_args.py reads undefined
    ``optuna_trail``/``noise_rate``, and hash_train.py needs timm /
    torch_scatter / ``model.modelbase.BaseBackbone`` /
    ``model.clip.optimization`` — none present.  Injected repairs
    (tests/dghdgh_mirror.py): torch builds of the ccmh reconstruction for
    the three missing modules — so BOTH frameworks run the SAME
    reconstruction while all SURVIVING reference code (PaperLoss.fwd_stage1/
    fwd_stage2/triplet_loss, GeneralPulling, the three-optimizer
    train_epoch, TrainBase.run/valid) executes for real — plus faithful
    shims for the missing deps and a Baseclip-backed BaseBackbone.  Triplet
    mining (the missing ``gen_triplets``) is pinned to the same
    deterministic cyclic draw on both sides; anchors without an eligible
    positive/negative drop (torch, ragged) / mask (jax, fixed shape)
    identically."""
    import types

    import ccmh.losses.dghdgh as ccmh_dghdgh
    from ccmh.config import DGHDGHConfig
    from tests import dghdgh_mirror as mir

    # ---- missing third-party deps (hash_train.py:7, loss.py:8)
    if "torch_scatter" not in sys.modules or not callable(
            getattr(sys.modules.get("torch_scatter"), "scatter_mean", None)):
        ts = types.ModuleType("torch_scatter")
        ts.scatter_mean = mir.scatter_mean
        monkeypatch.setitem(sys.modules, "torch_scatter", ts)
    else:
        monkeypatch.setattr(sys.modules["torch_scatter"], "scatter_mean",
                            mir.scatter_mean)
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_utils = types.ModuleType("timm.utils")
        timm_utils.AverageMeter = mir.AverageMeter
        timm.utils = timm_utils
        monkeypatch.setitem(sys.modules, "timm", timm)
        monkeypatch.setitem(sys.modules, "timm.utils", timm_utils)

    # ---- missing reference symbols (hash_train.py:13-15)
    import model.base.optimization as ref_opt
    import model.modelbase as ref_mb

    clip_pkg = types.ModuleType("model.clip")
    opt_alias = types.ModuleType("model.clip.optimization")
    opt_alias.BertAdam = ref_opt.BertAdam
    clip_pkg.optimization = opt_alias
    monkeypatch.setitem(sys.modules, "model.clip", clip_pkg)
    monkeypatch.setitem(sys.modules, "model.clip.optimization", opt_alias)

    class BaseBackbone(ref_mb.Baseclip):
        """hash_train.py:36-38's missing model: Baseclip's CLIP +
        LinearHash heads behind the (outputDim, backbone, preload, ...)
        signature; ``.backbone`` aliases the CLIP tower for the optimizer
        group at hash_train.py:48."""

        def __init__(self, outputDim, backbone="clip", preload="",
                     writer=None, logger=None, is_train=True):
            assert backbone == "clip"
            super().__init__(outputDim=outputDim, clipPath=preload,
                             writer=writer, logger=logger, is_train=is_train)

        @property
        def backbone(self):
            return self.clip

    monkeypatch.setattr(ref_mb, "BaseBackbone", BaseBackbone, raising=False)

    # ---- the three missing modules (loss.py:10-12); also rebind the loss
    # module's globals in case test_dghdgh_loss already imported it with
    # placeholder stubs
    for name, sym, obj in (("train.DGHDGH.gnn", "GNNDecoder", mir.GNNDecoder),
                           ("train.DGHDGH.graph_generator", "GraphGenerator",
                            mir.GraphGenerator)):
        mod = sys.modules.get(name) or types.ModuleType(name)
        setattr(mod, sym, obj)
        monkeypatch.setitem(sys.modules, name, mod)
    import utils.utils as ref_utils_mod

    monkeypatch.setattr(ref_utils_mod, "gen_triplets", mir.gen_triplets,
                        raising=False)
    ref_loss = importlib.import_module("train.DGHDGH.loss")
    monkeypatch.setattr(ref_loss, "GNNDecoder", mir.GNNDecoder)
    monkeypatch.setattr(ref_loss, "GraphGenerator", mir.GraphGenerator)
    monkeypatch.setattr(ref_loss, "gen_triplets", mir.gen_triplets)

    # ---- get_args repairs: undefined optuna_trail/noise_rate reads
    import train.DGHDGH.get_args as ga_mod

    orig_ga = ga_mod.get_args

    def patched_ga(main_args):
        main_args.optuna_trail = False
        main_args.noise_rate = 0
        return orig_ga(main_args)

    monkeypatch.setattr(ga_mod, "get_args", patched_ga)

    args = make_loop_args("DGHDGH", "DGHDGH", tiny_clip_pt, data_dir,
                          tmp_path / "ref", nclass=NCLASS, backbone="clip",
                          preload=str(tiny_clip_pt))
    t, _ = build_ref_full("DGHDGH", "DGHDGHTrainer", args)
    t.model.image_hash.drop_out.p = 0.0
    t.model.text_hash.drop_out.p = 0.0

    clip_params, ccfg = convert_state_dict(
        {k: v.detach().clone() for k, v in t.model.clip.state_dict().items()})
    assert ccfg == TINY
    heads = {"img_head": conv_linear_hash(t.model.image_hash),
             "txt_head": conv_linear_hash(t.model.text_hash)}
    extra = {"gnn": mir.conv_gnn(t.criterion.gnn),
             "classifier": mir.conv_classifier(t.criterion.softmax_classifier)}

    monkeypatch.setattr(ccmh_dghdgh, "gen_triplets", mir.det_gen_triplets_jnp)
    trainer = build_ccmh_trainer("DGHDGH", data_dir, tmp_path, clip_params,
                                 monkeypatch,
                                 dghdgh=DGHDGHConfig(sequenced=True))
    override_params(trainer, heads, extra=extra)

    t.train()
    trainer.train()

    assert_loops_agree(t, trainer, "DGHDGH")
