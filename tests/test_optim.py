"""Step-level golden test: ccmh bert_adam vs the reference torch BertAdam."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.train.optim import bert_adam, lr_tree_for
from tests.conftest import load_reference_module

torch = pytest.importorskip("torch")


def run_torch(params_np, grads_seq, lr_groups, **kw):
    mod = load_reference_module("model/base/optimization.py")
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in params_np.items()}
    groups = [
        {"params": [tparams[k] for k in keys], "lr": lr}
        for lr, keys in lr_groups
    ]
    opt = mod.BertAdam(groups, lr=1e-3, **kw)
    for grads in grads_seq:
        opt.zero_grad()
        for k, p in tparams.items():
            p.grad = torch.from_numpy(grads[k].copy())
        opt.step()
    return {k: p.detach().numpy() for k, p in tparams.items()}


def run_jax(params_np, grads_seq, lr_map, **kw):
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    tx = bert_adam(lr_map, **kw)
    state = tx.init(params)
    for grads in grads_seq:
        g = {k: jnp.asarray(v) for k, v in grads.items()}
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return {k: np.asarray(v) for k, v in params.items()}


@pytest.mark.parametrize("schedule", ["warmup_cosine", "warmup_constant", "warmup_linear"])
def test_bert_adam_parity(schedule):
    rng = np.random.RandomState(0)
    params = {
        "a": rng.randn(4, 3).astype(np.float32),
        "b": rng.randn(5).astype(np.float32),
        "c": rng.randn(2, 2).astype(np.float32) * 10,  # exercises grad clipping
    }
    steps = 7
    grads_seq = [
        {k: (rng.randn(*v.shape) * (3.0 if k == "c" else 1.0)).astype(np.float32)
         for k, v in params.items()}
        for _ in range(steps)
    ]
    kw = dict(warmup=0.3, t_total=10, schedule=schedule, b1=0.9, b2=0.98,
              weight_decay=0.2, max_grad_norm=1.0)
    expected = run_torch(params, grads_seq, [(1e-3, ["a", "b"]), (1e-5, ["c"])],
                         e=1e-6, **kw)
    lr_map = {"a": 1e-3, "b": 1e-3, "c": 1e-5}
    got = run_jax(params, grads_seq, lr_map, eps=1e-6, **kw)
    for k in params:
        np.testing.assert_allclose(got[k], expected[k], atol=1e-6, rtol=1e-5)


def test_bert_adam_no_schedule():
    rng = np.random.RandomState(1)
    params = {"w": rng.randn(3, 3).astype(np.float32)}
    grads_seq = [{"w": rng.randn(3, 3).astype(np.float32)} for _ in range(4)]
    expected = run_torch(params, grads_seq, [(1e-2, ["w"])], e=1e-8, b1=0.9,
                         b2=0.999, weight_decay=0.0, max_grad_norm=-1)
    got = run_jax(params, grads_seq, {"w": 1e-2}, eps=1e-8, b1=0.9, b2=0.999,
                  weight_decay=0.0, max_grad_norm=-1)
    np.testing.assert_allclose(got["w"], expected["w"], atol=1e-6, rtol=1e-5)


def test_lr_tree_for():
    params = {"clip": {"x": jnp.ones(2), "y": {"z": jnp.ones(3)}}, "img_head": {"w": jnp.ones(1)}}
    tree = lr_tree_for(params, 1e-3, {"clip": 1e-5})
    assert tree["clip"]["y"]["z"] == 1e-5
    assert tree["img_head"]["w"] == 1e-3


def test_bert_adam_bf16_moments():
    """optim_moments_dtype=bfloat16: moments stored reduced, update math in
    fp32 — a few steps track the fp32 optimizer within bf16 storage noise,
    and the default (None) path is byte-identical to before."""
    import jax
    import jax.numpy as jnp

    from ccmh.train.optim import bert_adam

    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8),
              "b": jnp.linspace(0.3, 0.9, 8)}
    grads_seq = [jax.tree.map(
        lambda p: jnp.cos(p * (i + 1)) * 0.1, params) for i in range(5)]

    def run(moments_dtype):
        tx = bert_adam(1e-2, warmup=0.1, t_total=100,
                       weight_decay=0.01, moments_dtype=moments_dtype)
        st = tx.init(params)
        p = params
        for g in grads_seq:
            upd, st = tx.update(g, st, p)
            p = jax.tree.map(lambda a, u: a + u, p, upd)
        return p, st

    p32, st32 = run(None)
    pbf, stbf = run(jnp.bfloat16)
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(stbf.m))
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(st32.v))
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(pbf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-4)


def test_bf16_moments_end_to_end(tmp_path):
    """--set optim_moments_dtype=bfloat16 trains, checkpoints, and resumes
    (orbax round-trips the bf16 moment leaves)."""
    import jax
    import jax.numpy as jnp

    from tests.test_train_e2e import make_trainer

    t = make_trainer("DSPH", tmp_path, epochs=2, valid=False,
                     optim_moments_dtype="bfloat16")
    t.train_epoch(0)
    moment_leaves = jax.tree.leaves(t.state.opt_state.m)
    assert all(x.dtype == jnp.bfloat16 for x in moment_leaves)
    t.save_full_checkpoint(0)
    t2 = make_trainer("DSPH", tmp_path, epochs=2, valid=False,
                      optim_moments_dtype="bfloat16", resume=True)
    t2.train()
    assert all(x.dtype == jnp.bfloat16
               for x in jax.tree.leaves(t2.state.opt_state.m))
    assert np.isfinite(float(jnp.sum(jax.tree.leaves(t2.state.params)[0])))
