"""Tensor-parallel (2-D "data" x "model" mesh) tests on the 8-CPU mesh.

The reference has no parallelism at all (SURVEY §2.6); TP is a new
TPU-native subsystem (ccmh/parallel/tp.py): Megatron-sharded tower
attention/MLP weights via a head-major qkv relayout, checkpoints kept in
the canonical packed layout.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.clip.model import (
    ClipConfig, encode_image, encode_text, init_clip_params, set_attn_impl,
    text_forward, vision_forward,
)
from ccmh.parallel import tp as tp_mod
from ccmh.parallel.mesh import shard_batch
from tests.test_parallel import build, make_batch

TINY = ClipConfig.tiny()            # vision_heads=2, transformer_heads=2
HEAD_MAJOR = dataclasses.replace(TINY, qkv_layout="head_major")


@pytest.fixture
def xla_attn():
    """Pin the plain-XLA attention path so packed-vs-head-major parity is
    exact (the packed default would go through the Pallas interpreter on
    CPU; head-major always uses the XLA formulation)."""
    set_attn_impl("xla")
    yield
    set_attn_impl("fused")


def _params(seed=0):
    return init_clip_params(jax.random.PRNGKey(seed), TINY)


def test_relayout_roundtrip():
    params = _params()
    there = tp_mod.relayout_clip(params, TINY, to_head_major=True)
    # the permutation must actually move columns (not be a silent no-op) ...
    assert not np.allclose(
        np.asarray(there["text"]["blocks"]["attn"]["qkv_w"]),
        np.asarray(params["text"]["blocks"]["attn"]["qkv_w"]))
    back = tp_mod.relayout_clip(there, TINY, to_head_major=False)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_head_major_forward_parity(xla_attn):
    """Head-major layout + head-major forward == packed forward, bitwise:
    the permutation reorders qkv columns exactly as the head-major reshape
    re-reads them, so q/k/v tensors (and everything downstream) are
    identical."""
    params = _params()
    batch = make_batch(4)
    img, ids = jnp.asarray(batch["image"]), jnp.asarray(batch["text"])

    base_i = encode_image(params, TINY, img)
    base_t = encode_text(params, TINY, ids)

    hm = tp_mod.relayout_clip(params, TINY, to_head_major=True)
    got_i = encode_image(hm, HEAD_MAJOR, img)
    got_t = encode_text(hm, HEAD_MAJOR, ids)

    np.testing.assert_array_equal(np.asarray(base_i), np.asarray(got_i))
    np.testing.assert_array_equal(np.asarray(base_t), np.asarray(got_t))


def test_head_major_token_features_parity(xla_attn):
    """The MITH token pipeline (tokens_proj + attention rows) must survive
    the relayout too — it reads per-head attention probabilities."""
    params = _params()
    batch = make_batch(3)
    img = jnp.asarray(batch["image"])
    hm = tp_mod.relayout_clip(params, TINY, to_head_major=True)

    base = vision_forward(params["visual"], TINY, img, features="mith")
    got = vision_forward(hm["visual"], HEAD_MAJOR, img, features="mith")
    np.testing.assert_array_equal(np.asarray(base.tokens_proj),
                                  np.asarray(got.tokens_proj))
    np.testing.assert_array_equal(np.asarray(base.cls_attn),
                                  np.asarray(got.cls_attn))

    ids = jnp.asarray(batch["text"])
    kpm = jnp.asarray(np.asarray(batch["text"]) == 0)
    base_t = text_forward(params["text"], TINY, ids, features="mith",
                          key_padding_mask=kpm)
    got_t = text_forward(hm["text"], HEAD_MAJOR, ids, features="mith",
                         key_padding_mask=kpm)
    np.testing.assert_array_equal(np.asarray(base_t.tokens_proj),
                                  np.asarray(got_t.tokens_proj))
    np.testing.assert_array_equal(np.asarray(base_t.eos_attn),
                                  np.asarray(got_t.eos_attn))


def test_validate_rejects_bad_shapes():
    with pytest.raises(ValueError):
        tp_mod.validate(TINY, 4)            # 4 does not divide 2 heads
    rn = dataclasses.replace(TINY, vision_layers=(1, 1, 1, 1),
                             vision_patch_size=None)
    with pytest.raises(ValueError):
        tp_mod.validate(rn, 2)              # resnet tower unsupported
    tp_mod.validate(TINY, 2)                # fine


def _bert_adam_state(opt_state):
    """Unwrap optax.chain nesting down to the BertAdamState."""
    from ccmh.train.optim import BertAdamState

    stack = [opt_state]
    while stack:
        node = stack.pop()
        if isinstance(node, BertAdamState):
            return node
        if isinstance(node, (tuple, list)):
            stack.extend(node)
    raise AssertionError("no BertAdamState found")


def _tp_build(method_name):
    """Mirror test_parallel.build() but with the head-major clip config:
    same state (the relayout happens after init), loss/step rebuilt against
    HEAD_MAJOR so the jitted program consumes the TP layout."""
    from ccmh.train.methods import get_method
    from ccmh.train.state import make_main_optimizer, make_train_step

    cfg, state, _ = build(method_name, jit=False)
    state = tp_mod.relayout_state(state, TINY, to_head_major=True)
    method = get_method(method_name)
    loss_fn = method.make_loss_fn(cfg, HEAD_MAJOR)
    tx = make_main_optimizer(cfg, state.params, steps_per_epoch=4)
    extra_tx = method.extra_tx(cfg) if method.extra_tx else None
    raw = make_train_step(loss_fn, tx, extra_tx, cfg, HEAD_MAJOR, jit=False)
    return cfg, state, raw


from ccmh.train.methods import available_methods

ALL_METHODS = available_methods()


@pytest.mark.slow
@pytest.mark.parametrize("method", ALL_METHODS)
def test_tp_all_methods(method):
    """Megatron-sharded == single-device for EVERY registered method (the
    registry is the coverage claim, mirroring test_dp_all_methods): two
    steps on a (4 data x 2 model) mesh so mutated aux feeds back through
    the loss once.  On top of the DP hazards, TP adds: head-sharded
    attention probabilities under MITH's need_weights last block (the mean
    over heads becomes a model-axis collective), TwDH's BatchNorm feeding
    from an all-reduced tower output, and every extra-optimizer partition
    updating replicated weights from model-axis-reduced gradients."""
    from tests.test_parallel import _batch_for

    batch_np = _batch_for(method, make_batch(16))
    batch2_np = _batch_for(method, make_batch(16, seed=1))
    batch2_np["index"] = batch2_np["index"] + 16

    cfg, state, step = build(method)
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    jb2 = {k: jnp.asarray(v) for k, v in batch2_np.items()}
    s1, m1 = step(state, jb)
    s1, m1b = step(s1, jb2)

    cfg2, state2, raw = _tp_build(method)
    mesh = tp_mod.make_mesh_2d(4, 2)
    with mesh:
        tp_step, state2 = tp_mod.tensor_parallel_train_step(raw, mesh, state2)
        s2, m2 = tp_step(state2, shard_batch(mesh, batch_np))
        s2, m2b = tp_step(s2, shard_batch(mesh, batch2_np))

    # Loss values get a RELATIVE budget: row-sharding a contraction splits
    # every tower matmul into per-chip partial sums, which legitimately
    # perturbs fp32 rounding by ~1 ulp — and a threshold-masked,
    # count-normalized loss (DCHMT's sim_threshold clipping) jumps a whole
    # quantum when one pair crosses the mask (measured: loss off by 7e-3
    # while params after two steps agree to 3e-6; the param/aux/extra
    # asserts below are the actual parity claim).
    l1, l2 = float(m1b["loss"]), float(m2b["loss"])
    assert abs(l1 - l2) < 2e-4 + 1e-3 * abs(l1), (l1, l2)
    s2c = tp_mod.relayout_state(s2, TINY, to_head_major=False)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.aux), jax.tree.leaves(s2c.aux)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    if s1.extra is not None:
        for a, b in zip(jax.tree.leaves(s1.extra), jax.tree.leaves(s2c.extra)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_tp_step_matches_single_device():
    """A (4 data x 2 model) step must reproduce the single-device step:
    the relayout + Megatron shardings are layout/placement only.  DSPH
    exercises the extra-optimizer partition (proxy SGD) under TP."""
    from ccmh.train.methods import get_method
    from ccmh.train.state import make_main_optimizer, make_train_step

    cfg, state, step = build("DSPH")
    batch_np = make_batch(16)
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()})

    cfg2, state2, _ = build("DSPH", jit=False)
    mesh = tp_mod.make_mesh_2d(4, 2)
    state2 = tp_mod.relayout_state(state2, TINY, to_head_major=True)

    # rebuild the step against the head-major clip cfg
    method = get_method("DSPH")
    loss_fn = method.make_loss_fn(cfg2, HEAD_MAJOR)
    tx = make_main_optimizer(cfg2, state2.params, steps_per_epoch=4)
    extra_tx = method.extra_tx(cfg2) if method.extra_tx else None
    raw = make_train_step(loss_fn, tx, extra_tx, cfg2, HEAD_MAJOR, jit=False)
    with mesh:
        tp_step, state2 = tp_mod.tensor_parallel_train_step(raw, mesh, state2)
        s2, m2 = tp_step(state2, shard_batch(mesh, batch_np))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4

    # tower weights and BertAdam moments live sharded over "model"
    qkv_sh = s2.params["clip"]["text"]["blocks"]["attn"]["qkv_w"].sharding
    assert qkv_sh.spec[-1] == tp_mod.MODEL_AXIS, qkv_sh.spec
    mu = _bert_adam_state(s2.opt_state).m
    mu_sh = mu["clip"]["text"]["blocks"]["attn"]["qkv_w"].sharding
    assert mu_sh.spec[-1] == tp_mod.MODEL_AXIS, mu_sh.spec

    # numerics match the single-device run after undoing the relayout
    s2_canon = tp_mod.relayout_state(s2, TINY, to_head_major=False)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2_canon.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree.leaves(s1.extra), jax.tree.leaves(s2_canon.extra)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.slow
def test_tp_trainer_e2e(tmp_path):
    """Full Trainer epoch + valid on a (2 data x 2 model) mesh, matching the
    single-device trainer batch-for-batch; the npz checkpoint written under
    TP must hold the canonical packed layout."""
    from ccmh.clip.convert import _unflatten
    from tests.test_train_e2e import make_trainer

    tp_trainer = make_trainer("DCHMT", tmp_path / "tp", mesh_shape=(2, 2))
    assert tp_trainer.mesh is not None and tp_trainer.tp == 2
    assert tp_trainer.clip_cfg.qkv_layout == "head_major"
    tp_trainer.train_epoch(0)
    maps_tp = tp_trainer.valid(0)

    ref_trainer = make_trainer("DCHMT", tmp_path / "single")
    ref_trainer.train_epoch(0)
    maps_ref = ref_trainer.valid(0)

    for a, b in zip(maps_tp, maps_ref):
        assert abs(a - b) < 5e-3, (maps_tp, maps_ref)

    # canonical checkpoint: packed layout, matching the single-device run
    ckpt = str(tmp_path / "tp.npz")
    tp_trainer.save_checkpoint(ckpt)
    canon = tp_trainer._canonical_state()
    with np.load(ckpt) as data:
        tree = _unflatten({k: data[k] for k in data.files})
    np.testing.assert_array_equal(
        tree["params"]["clip"]["text"]["blocks"]["attn"]["qkv_w"],
        np.asarray(canon.params["clip"]["text"]["blocks"]["attn"]["qkv_w"]))
    ref_qkv = np.asarray(
        ref_trainer.state.params["clip"]["text"]["blocks"]["attn"]["qkv_w"])
    np.testing.assert_allclose(
        tree["params"]["clip"]["text"]["blocks"]["attn"]["qkv_w"],
        ref_qkv, atol=5e-5)


def test_tp_retriever_encode_parity(xla_attn):
    """Serving under TP (the latency-bound use case docs/tp.md names):
    a Retriever on a (2 data x 2 model) mesh must encode bitwise like the
    single-device one — the relayout + shardings are placement only —
    with the tower weights actually living model-sharded."""
    from ccmh.config import Config
    from ccmh.retrieval import Retriever
    from ccmh.train.methods import get_method
    from ccmh.clip.model import init_clip_params

    cfg = Config(method="DSPH", output_dim=16, nclass=8, batch_size=8,
                 epochs=1, resolution=TINY.image_resolution, train_num=16)
    method = get_method("DSPH")
    key = jax.random.PRNGKey(0)
    heads, extra, aux = method.init(key, cfg, TINY)
    params = {"clip": init_clip_params(key, TINY), **heads}

    base = Retriever(method, params, aux, cfg, TINY)
    mesh = tp_mod.make_mesh_2d(2, 2)
    tpr = Retriever(method, params, aux, cfg, TINY, tp_mesh=mesh)
    assert tpr.clip_cfg.qkv_layout == "head_major"
    qkv_sh = tpr.params["clip"]["text"]["blocks"]["attn"]["qkv_w"].sharding
    assert qkv_sh.spec[-1] == tp_mod.MODEL_AXIS, qkv_sh.spec

    rng = np.random.RandomState(0)
    ids = np.tile(np.asarray([[49406] + [320] * 5 + [49407] + [0] * 25],
                             np.int32), (5, 1))
    imgs = rng.randn(5, TINY.image_resolution, TINY.image_resolution,
                     3).astype(np.float32)
    # 5 rows through bs=2 exercises the dp-rounded chunk (bs -> 2) + padding
    np.testing.assert_array_equal(base.encode_texts(ids),
                                  tpr.encode_texts(ids, batch_size=2))
    np.testing.assert_array_equal(base.encode_images(imgs),
                                  tpr.encode_images(imgs, batch_size=2))


@pytest.mark.slow
def test_tp_retriever_from_trainer(tmp_path, xla_attn):
    """from_trainer on a TP trainer re-canonicalizes the live head-major
    state and re-applies the mesh; codes are bitwise identical to a plain
    Retriever over the same trainer's canonical (packed) weights."""
    from ccmh.retrieval import Retriever
    from tests.test_train_e2e import make_trainer

    tp_trainer = make_trainer("DSPH", tmp_path / "tp", mesh_shape=(2, 2))
    tp_trainer.train_epoch(0)
    tpr = Retriever.from_trainer(tp_trainer)
    assert tpr.tp_mesh is not None

    canon = tp_trainer._canonical_state()
    ref = Retriever(tp_trainer.method,
                    jax.tree.map(np.asarray, canon.params),
                    jax.tree.map(np.asarray, canon.aux),
                    tp_trainer.cfg, TINY)
    assert ref.tp_mesh is None

    ids = np.tile(np.asarray([[49406] + [320] * 5 + [49407] + [0] * 25],
                             np.int32), (4, 1))
    np.testing.assert_array_equal(np.asarray(tpr.encode_texts(ids)),
                                  np.asarray(ref.encode_texts(ids)))


@pytest.mark.slow
def test_tp_resume_bit_exact(tmp_path):
    """Full-state checkpoint under TP resumes bit-exactly: save after epoch
    0, resume, train epoch 1, compare against an uninterrupted TP run."""
    from tests.test_train_e2e import make_trainer

    a = make_trainer("DSPH", tmp_path / "a", mesh_shape=(2, 2), epochs=2,
                     valid=False)
    a.train()

    b = make_trainer("DSPH", tmp_path / "b", mesh_shape=(2, 2), epochs=2,
                     valid=False)
    b.train_epoch(0)
    b.save_full_checkpoint(0)

    c = make_trainer("DSPH", tmp_path / "b", mesh_shape=(2, 2), epochs=2,
                     valid=False, resume=True)
    c.train()

    ca = tp_mod.relayout_state(a.state, TINY, to_head_major=False)
    cc = tp_mod.relayout_state(c.state, TINY, to_head_major=False)
    for x, y in zip(jax.tree.leaves(ca.params), jax.tree.leaves(cc.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_vitl_tp_degrees_validate():
    """The zoo's big towers shard at the degrees the sizing comment claims
    (parallel/tp.py: ViT-L/14 = 16 vision / 12 text heads -> tp in {2, 4};
    VERDICT r3 item 6 pins the claim as a test)."""
    from ccmh.clip.model import ClipConfig
    from ccmh.parallel import tp as tp_mod

    vitl = ClipConfig.vit_l14()
    assert vitl.vision_heads == 16 and vitl.transformer_heads == 12
    for deg in (2, 4):
        tp_mod.validate(vitl, deg)          # must not raise
    with pytest.raises(ValueError, match="attention heads"):
        tp_mod.validate(vitl, 8)            # 12 text heads % 8 != 0
    with pytest.raises(ValueError, match="attention heads"):
        tp_mod.validate(vitl, 32)
