"""FSDP (ZeRO-style weight/moment sharding, parallel/fsdp.py) tests on the
8-CPU mesh.

The reference has no parallelism at all (SURVEY §2.6); FSDP is a new
TPU-native subsystem: large CLIP-tower weights and their BertAdam moments
shard over the mesh's "data" axis (the batch axis), dividing per-chip
weight+optimizer residency by the data-parallel degree.  GSPMD inserts the
weight all-gathers / gradient reduce-scatters from the sharding
annotations alone, so numerics must match plain DP / single-device.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig
from ccmh.parallel import fsdp as fsdp_mod
from ccmh.parallel import tp as tp_mod
from ccmh.parallel.mesh import make_mesh, shard_batch
from tests.test_parallel import build, make_batch
from tests.test_tp import _bert_adam_state, _tp_build

TINY = ClipConfig.tiny()


def _shard_bytes(arr):
    return arr.addressable_shards[0].data.nbytes


def test_fsdp_spec_rules():
    """Sharding table: large tower weights take the data axis on a non-layer
    dim, small leaves (LN, biases, projections under MIN_SHARD_ELEMS)
    replicate, and the BertAdam moments mirror the params (path-matched)."""
    _, state, _ = build("DSPH", jit=False)
    mesh = make_mesh(8)
    sh = fsdp_mod.state_shardings(state, mesh)

    blocks = sh.params["clip"]["text"]["blocks"]
    # [L, 128, 384] -> largest non-layer dim sharded
    assert "data" in tuple(blocks["attn"]["qkv_w"].spec), blocks["attn"]["qkv_w"].spec
    assert tuple(blocks["attn"]["qkv_w"].spec)[0] is None  # never the layer dim
    assert "data" in tuple(blocks["mlp"]["fc_w"].spec)
    # [L, 128, 128] = 32k elems < MIN_SHARD_ELEMS -> replicated
    assert tuple(blocks["attn"]["out_w"].spec) == ()
    # LN + biases replicate
    assert tuple(sh.params["clip"]["text"]["ln_final"]["scale"].spec) == ()
    assert tuple(blocks["attn"]["qkv_b"].spec) == ()
    # token embedding [49408, 128] shards its vocab dim
    tok = sh.params["clip"]["text"]["token_embedding"]
    assert tuple(tok.spec) == ("data", None), tok.spec
    # heads / extra / aux replicate
    for leaf in jax.tree.leaves(sh.params["img_head"]):
        assert tuple(leaf.spec) == ()
    # moments mirror the param sharding
    m = _bert_adam_state_shardings(sh)
    assert "data" in tuple(m["clip"]["text"]["blocks"]["attn"]["qkv_w"].spec)


def _bert_adam_state_shardings(sh_tree):
    return _bert_adam_state(sh_tree.opt_state).m


def test_fsdp_tp_combined_specs():
    """On a (4 data x 2 model) mesh the Megatron dim keeps "model" and FSDP
    fills a remaining dim with "data"."""
    _, state, _ = build("DSPH", jit=False)
    mesh = tp_mod.make_mesh_2d(4, 2)
    sh = fsdp_mod.state_shardings(state, mesh)
    qkv = tuple(sh.params["clip"]["text"]["blocks"]["attn"]["qkv_w"].spec)
    assert "model" in qkv and "data" in qkv and qkv[0] is None, qkv
    proj = tuple(sh.params["clip"]["text"]["blocks"]["mlp"]["proj_w"].spec)
    assert proj[1] == "model" and proj[2] == "data", proj


@pytest.mark.slow
def test_fsdp_step_matches_single_device():
    """An 8-way FSDP step reproduces the single-device step (the shardings
    are placement only; the reduce-scattered update must equal the psum'd
    one), with the weights and moments actually living sharded."""
    cfg, state, step = build("DSPH")
    batch_np = make_batch(16)
    batch2_np = make_batch(16, seed=1)
    batch2_np["index"] = batch2_np["index"] + 16
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    jb2 = {k: jnp.asarray(v) for k, v in batch2_np.items()}
    s1, m1 = step(state, jb)
    s1, m1b = step(s1, jb2)

    cfg2, state2, raw = build("DSPH", jit=False)
    mesh = make_mesh(8)
    with mesh:
        f_step, state2 = fsdp_mod.fsdp_train_step(raw, mesh, state2)
        # weights + moments live sharded: per-device shard = total / 8
        qkv = state2.params["clip"]["text"]["blocks"]["attn"]["qkv_w"]
        assert _shard_bytes(qkv) == qkv.nbytes // 8
        mu = _bert_adam_state(state2.opt_state).m
        mu_qkv = mu["clip"]["text"]["blocks"]["attn"]["qkv_w"]
        assert _shard_bytes(mu_qkv) == mu_qkv.nbytes // 8
        s2, m2 = f_step(state2, shard_batch(mesh, batch_np))
        s2, m2b = f_step(s2, shard_batch(mesh, batch2_np))

    assert abs(float(m1b["loss"]) - float(m2b["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree.leaves(s1.extra), jax.tree.leaves(s2.extra)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.slow
def test_fsdp_tp_step_matches_single_device():
    """FSDP composed with tensor parallelism on a (4 data x 2 model) mesh:
    Megatron head-sharding + ZeRO weight sharding together still reproduce
    the single-device step."""
    cfg, state, step = build("DSPH")
    batch_np = make_batch(16)
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()})

    cfg2, state2, raw = _tp_build("DSPH")
    mesh = tp_mod.make_mesh_2d(4, 2)
    with mesh:
        f_step, state2 = fsdp_mod.fsdp_train_step(raw, mesh, state2)
        qkv = state2.params["clip"]["text"]["blocks"]["attn"]["qkv_w"]
        # sharded over model (2) AND data (4): shard = total / 8
        assert _shard_bytes(qkv) == qkv.nbytes // 8
        s2, m2 = f_step(state2, shard_batch(mesh, batch_np))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    s2c = tp_mod.relayout_state(s2, TINY, to_head_major=False)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.slow
def test_fsdp_trainer_e2e(tmp_path):
    """Full Trainer epoch + valid with --fsdp on a 2-device data mesh,
    matching the single-device trainer; the npz checkpoint gathers the
    shards back to canonical full arrays."""
    from ccmh.clip.convert import _unflatten
    from tests.test_train_e2e import make_trainer

    f_trainer = make_trainer("DSPH", tmp_path / "fsdp", mesh_shape=(2,),
                             fsdp=True)
    assert f_trainer.fsdp and f_trainer.mesh is not None
    qkv = f_trainer.state.params["clip"]["text"]["blocks"]["attn"]["qkv_w"]
    assert _shard_bytes(qkv) == qkv.nbytes // 2
    f_trainer.train_epoch(0)
    maps_f = f_trainer.valid(0)

    ref = make_trainer("DSPH", tmp_path / "single")
    ref.train_epoch(0)
    maps_ref = ref.valid(0)
    for a, b in zip(maps_f, maps_ref):
        assert abs(a - b) < 5e-3, (maps_f, maps_ref)

    ckpt = str(tmp_path / "fsdp.npz")
    f_trainer.save_checkpoint(ckpt)
    with np.load(ckpt) as data:
        tree = _unflatten({k: data[k] for k in data.files})
    np.testing.assert_allclose(
        tree["params"]["clip"]["text"]["blocks"]["attn"]["qkv_w"],
        np.asarray(ref.state.params["clip"]["text"]["blocks"]["attn"]["qkv_w"]),
        atol=5e-5)


@pytest.mark.slow
def test_fsdp_resume_bit_exact(tmp_path):
    """Full-state checkpoint under FSDP resumes bit-exactly (canonical
    gathered checkpoint -> re-sharded live state)."""
    from tests.test_train_e2e import make_trainer

    a = make_trainer("DSPH", tmp_path / "a", mesh_shape=(2,), fsdp=True,
                     epochs=2, valid=False)
    a.train()

    b = make_trainer("DSPH", tmp_path / "b", mesh_shape=(2,), fsdp=True,
                     epochs=2, valid=False)
    b.train_epoch(0)
    b.save_full_checkpoint(0)

    c = make_trainer("DSPH", tmp_path / "b", mesh_shape=(2,), fsdp=True,
                     epochs=2, valid=False, resume=True)
    c.train()
    qkv = c.state.params["clip"]["text"]["blocks"]["attn"]["qkv_w"]
    assert _shard_bytes(qkv) == qkv.nbytes // 2   # resumed state re-sharded
    for x, y in zip(jax.tree.leaves(a.state.params),
                    jax.tree.leaves(c.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
