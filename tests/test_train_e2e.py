"""End-to-end slice: tiny CLIP + synthetic data, a few train steps + valid.

Exercises every layer (data -> tokenizer -> CLIP -> head -> loss -> BertAdam
-> encode -> on-device mAP), mirroring the reference PR1 config (DCHMT on a
small dataset, SURVEY §7).
"""

import numpy as np
import pytest

import jax

from ccmh.clip.model import ClipConfig, init_clip_params
from ccmh.config import Config
from ccmh.data.split import RawData, SplitData, split_data
from ccmh.data.synthetic import synthetic_arrays
from ccmh.train.trainer import Trainer

TINY = ClipConfig.tiny()


def tiny_cfg(method: str, tmp_path, **kw) -> Config:
    base = dict(
        method=method,
        dataset="synthetic",
        output_dim=16,
        save_dir=str(tmp_path / method),
        epochs=1,
        batch_size=16,
        query_num=16,
        train_num=32,
        seed=1814,
        max_words=32,
        resolution=TINY.image_resolution,
        eval_batch=16,
        display_step=1000,
        nclass=8,
    )
    base.update(kw)
    return Config(**base)


def make_trainer(method: str, tmp_path, **kw) -> Trainer:
    raw = synthetic_arrays(n=64, n_class=8, resolution=TINY.image_resolution)
    cfg = tiny_cfg(method, tmp_path, **kw)
    if method == "TwDH":
        cfg.twdh.center_path = _twdh_assets(tmp_path)
    splits = split_data(raw, query_num=cfg.query_num, train_num=cfg.train_num, seed=cfg.seed)
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    return Trainer(cfg, splits=splits, clip_cfg=TINY, clip_params=clip_params)


def _twdh_assets(tmp_path) -> str:
    """Synthetic TwDH center/trans npz: long=16 bits, one short length 8."""
    from ccmh.data.synthetic import write_synthetic_twdh_assets

    return write_synthetic_twdh_assets(str(tmp_path / "twdh_centers.npz"))


def test_split_parity_with_reference():
    """split_data must reproduce dataset/dataloader.py:6-28 exactly."""
    raw = synthetic_arrays(n=50, n_class=4, resolution=8)
    s = split_data(raw, query_num=10, train_num=20, seed=1814)
    np.random.seed(1814)
    order = np.random.permutation(range(50))
    np.testing.assert_array_equal(
        np.stack([np.asarray(x) for x in s.query.labels]),
        np.stack([np.asarray(raw.labels[i]) for i in order[:10]]))
    # train is a subset of retrieval (retrieval = all but query)
    assert len(s.retrieval.labels) == 40
    np.testing.assert_array_equal(
        np.stack(list(s.train.labels)),
        np.stack(list(s.retrieval.labels[:20])))


@pytest.mark.parametrize(
    "method",
    ["DCHMT", "DSPH", "DNpH", "DMsH_LN", "DScPH", "DDWSH", "DDBH", "DNPH",
     "DHaPH", "TwDH", "MITH", "DPSIH", "DPBE", "DGHDGH"])
@pytest.mark.slow
def test_train_and_valid(method, tmp_path):
    trainer = make_trainer(method, tmp_path)
    state0_loss = None

    trainer.train_epoch(0)
    assert trainer.global_step == 2  # 32 items / batch 16

    maps = trainer.valid(0)
    for v in maps:
        assert 0.0 <= v <= 1.0
    # mat export of the best epoch exists
    import os
    assert os.path.exists(
        os.path.join(trainer.cfg.save_dir, "PR_cruve",
                     f"16-ours-synthetic-i2t.mat"))


def test_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer("DCHMT", tmp_path)
    trainer.train_epoch(0)
    path = str(tmp_path / "ckpt.npz")
    trainer.save_checkpoint(path)

    trainer2 = make_trainer("DCHMT", tmp_path)
    trainer2.load_checkpoint(path)
    a = jax.tree.leaves(trainer.state.params)
    b = jax.tree.leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_loss_decreases(tmp_path):
    """A few epochs on tiny data should reduce the DCHMT loss."""
    trainer = make_trainer("DCHMT", tmp_path)
    import jax.numpy as jnp

    first, last = None, None
    for epoch in range(4):
        losses = []
        for batch in trainer.train_loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            trainer.state, metrics = trainer.train_step(trainer.state, jb)
            losses.append(float(metrics["loss"]))
        if first is None:
            first = np.mean(losses)
        last = np.mean(losses)
    assert last < first, (first, last)


@pytest.mark.slow
def test_full_state_resume(tmp_path):
    """Orbax full-state checkpoint: a killed-and-resumed run continues
    bit-exactly (params AND optimizer moments AND rng) vs an uninterrupted
    one — the failure-recovery capability the reference lacks (SURVEY §5)."""
    import jax.numpy as jnp

    # uninterrupted: 2 epochs straight
    t_ref = make_trainer("DSPH", tmp_path / "ref", epochs=2, valid=False)
    t_ref.train()

    # interrupted: same schedule (epochs=2 so the BertAdam t_total matches),
    # "crash" after epoch 0's checkpoint, then a fresh process resumes
    t_a = make_trainer("DSPH", tmp_path / "ab", epochs=2, valid=False)
    t_a.train_epoch(0)
    t_a.save_full_checkpoint(0)
    t_b = make_trainer("DSPH", tmp_path / "ab", epochs=2, valid=False,
                       resume=True)
    t_b.train()
    assert int(t_b.state.step) == int(t_ref.state.step)

    for x, y in zip(jax.tree.leaves(t_ref.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
    for x, y in zip(jax.tree.leaves(t_ref.state.opt_state),
                    jax.tree.leaves(t_b.state.opt_state)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
    # loss-side extras (DSPH proxies) restored too
    for x, y in zip(jax.tree.leaves(t_ref.state.extra),
                    jax.tree.leaves(t_b.state.extra)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)


def test_resolution_follows_clip_tower(tmp_path):
    """--resolution is a hard shape constraint of the loaded tower: a
    mismatching value is coerced to the checkpoint's image_resolution (so
    e.g. ViT-L/14@336px or an HF checkpoint at a non-224 size trains with
    the right data pipeline instead of a shape error)."""
    raw = synthetic_arrays(n=64, n_class=8, resolution=TINY.image_resolution)
    cfg = tiny_cfg("DCHMT", tmp_path, resolution=2 * TINY.image_resolution)
    splits = split_data(raw, query_num=cfg.query_num,
                        train_num=cfg.train_num, seed=cfg.seed)
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    t = Trainer(cfg, splits=splits, clip_cfg=TINY, clip_params=clip_params)
    assert t.cfg.resolution == TINY.image_resolution
    batch = next(iter(t.train_loader))
    assert batch["image"].shape[1] == TINY.image_resolution
    t.state, metrics = t.train_step(
        t.state, {k: jax.numpy.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(metrics["loss"]))


def test_async_checkpoint_resume_bit_exact(tmp_path):
    """--async-checkpoint overlaps the orbax write with the next epoch; the
    checkpoint it leaves behind must be byte-equivalent to the synchronous
    path: a resumed run continues bit-exactly, and train() finalizes any
    in-flight write before returning (so the slot is complete on exit)."""
    from ccmh.train.checkpoint import latest_checkpoint, load_state

    # 2 epochs with a checkpoint every epoch, async on
    t_a = make_trainer("DCHMT", tmp_path / "async", epochs=2, valid=False,
                       checkpoint_every=1, async_checkpoint=True)
    t_a.train()
    assert t_a._async_saver is None  # closed (finalized) on exit
    # sync twin on the same data/schedule
    t_s = make_trainer("DCHMT", tmp_path / "sync", epochs=2, valid=False,
                       checkpoint_every=1)
    t_s.train()

    pa = latest_checkpoint(t_a.cfg.save_dir)
    ps = latest_checkpoint(t_s.cfg.save_dir)
    assert pa is not None and ps is not None
    template = jax.tree.map(np.asarray, t_a.state)
    sa, ea, ma = load_state(pa, template)
    ss, es, ms = load_state(ps, template)
    ma.pop("total_time"), ms.pop("total_time")  # wall-clock, run-specific
    assert ea == es == 1 and ma == ms
    for x, y in zip(jax.tree.leaves(sa), jax.tree.leaves(ss)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # only the newest two slots are kept, even with deferred pruning
    import os

    slots = sorted(d for d in os.listdir(os.path.join(t_a.cfg.save_dir, "state_ckpt"))
                   if d.startswith("e"))
    assert slots == ["e000000", "e000001"]

    # and a resumed run continues bit-exactly from the async checkpoint
    t_b = make_trainer("DCHMT", tmp_path / "async", epochs=3, valid=False,
                       checkpoint_every=1, async_checkpoint=True, resume=True)
    t_b.train()
    t_c = make_trainer("DCHMT", tmp_path / "sync", epochs=3, valid=False,
                       checkpoint_every=1, resume=True)
    t_c.train()
    for x, y in zip(jax.tree.leaves(t_b.state.params),
                    jax.tree.leaves(t_c.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_state_checkpoint_none_extra(tmp_path):
    """Orbax checkpoint round-trip for a method WITHOUT loss-side extras
    (DCHMT: extra=None) — None members must be omitted, not serialised."""
    from ccmh.train.checkpoint import save_state, load_state

    t = make_trainer("DCHMT", tmp_path)
    t.train_epoch(0)
    assert t.state.extra is None
    path = str(tmp_path / "ck")
    save_state(path, jax.tree.map(np.asarray, t.state), 0)
    restored, epoch, _ = load_state(path, t.state)
    assert epoch == 0 and restored.extra is None
    for x, y in zip(jax.tree.leaves(t.state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_bf16_compute_dtype(tmp_path):
    """--compute-dtype bfloat16 runs the towers in bf16 (embeds come back
    fp32 for heads/losses); a step trains and encodes finitely, and the
    loss tracks the fp32 run closely on identical data."""
    import jax.numpy as jnp

    t32 = make_trainer("DSPH", tmp_path / "f32")
    tbf = make_trainer("DSPH", tmp_path / "bf16", compute_dtype="bfloat16")
    losses = {}
    for name, t in (("f32", t32), ("bf16", tbf)):
        batch = next(iter(t.train_loader))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        t.state, metrics = t.train_step(t.state, jb)
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
    # same data, same init: bf16 loss within 1% of fp32
    assert abs(losses["bf16"] - losses["f32"]) / abs(losses["f32"]) < 0.01, losses


def test_pretrained_accepts_state_ckpt_dir(tmp_path):
    """--pretrained pointed at an orbax state_ckpt directory restores the
    full state's weights (npz stays the interchange format)."""
    t = make_trainer("DCHMT", tmp_path)
    t.train_epoch(0)
    t.save_full_checkpoint(0)
    ck = str(tmp_path / "DCHMT" / "state_ckpt")

    t2 = make_trainer("DCHMT", tmp_path / "b")
    t2.load_checkpoint(ck)
    for x, y in zip(jax.tree.leaves(t.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_ragged_last_batch_semantics(tmp_path):
    """Single-chip training feeds the final partial batch at its TRUE size
    (reference semantics, train/base.py:87-92): no wrapped duplicates enter
    a batch-statistics loss, and the remainder shape compiles as its own
    program.  40 items / batch 16 -> 16, 16, 8."""
    from ccmh.data.dataset import BatchIterator

    trainer = make_trainer("DSPH", tmp_path, train_num=40, batch_size=16)
    assert trainer.train_loader.ragged_last

    trainer.train_loader.set_epoch(0)
    sizes, all_idx = [], []
    for batch in trainer.train_loader:
        sizes.append(batch["image"].shape[0])
        assert batch["valid"].all()
        all_idx.extend(batch["index"].tolist())
    assert sizes == [16, 16, 8]
    assert sorted(all_idx) == list(range(40))  # each item exactly once

    trainer.train_epoch(0)  # remainder shape compiles + runs
    assert trainer.global_step == 3

    # a mesh run keeps the fixed wrap-padded shape
    cfg2 = tiny_cfg("DSPH", tmp_path / "mesh", train_num=40, batch_size=16,
                    mesh_shape=(8,))
    import jax as _jax
    if len(_jax.devices()) >= 8:
        raw = synthetic_arrays(n=64, n_class=8, resolution=TINY.image_resolution)
        from ccmh.data.split import split_data
        from ccmh.clip.model import init_clip_params
        splits = split_data(raw, query_num=16, train_num=40, seed=cfg2.seed)
        tr2 = Trainer(cfg2, splits=splits, clip_cfg=TINY,
                      clip_params=init_clip_params(_jax.random.PRNGKey(0), TINY))
        assert not tr2.train_loader.ragged_last
        b = next(iter(tr2.train_loader))
        assert b["image"].shape[0] == 16


def test_device_prefetch_identical_losses(tmp_path):
    """VERDICT r2 item 3: the double-buffered device_put pipeline
    (data/prefetch.py) must be a pure scheduling change — training with
    depth=3 produces bit-identical parameters and losses to the serialized
    depth=1 order."""
    import jax as _jax

    results = []
    for depth in (1, 3):
        t = make_trainer("DSPH", tmp_path / f"d{depth}", epochs=2,
                         valid=False, prefetch_device=depth)
        t.train()
        results.append(t.state.params)
    for a, b in zip(_jax.tree.leaves(results[0]), _jax.tree.leaves(results[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_prefetch_order_and_exhaustion():
    """device_prefetch yields every batch exactly once, in order, and the
    put of batch N+1 happens before batch N is consumed (the overlap)."""
    from ccmh.data.prefetch import device_prefetch

    events = []
    batches = [{"i": i} for i in range(5)]

    def put(b):
        events.append(("put", b["i"]))
        return b

    out = []
    for b in device_prefetch(batches, put, depth=2):
        events.append(("use", b["i"]))
        out.append(b["i"])
    assert out == [0, 1, 2, 3, 4]
    # batch 1 was put before batch 0 was consumed
    assert events.index(("put", 1)) < events.index(("use", 0))
    # depth<=1 degenerates to strict alternation
    events.clear()
    assert [b["i"] for b in device_prefetch(batches, put, depth=1)] == list(range(5))
    assert events == [("put", i) for i in range(5)]
    # a StopIteration leaking from put() must PROPAGATE, not be mistaken
    # for iterator exhaustion (which would silently truncate the epoch)
    def bad_put(b):
        if b["i"] == 2:
            raise StopIteration("leaked")
        return b

    with pytest.raises((StopIteration, RuntimeError)):
        list(device_prefetch(batches, bad_put, depth=2))


def test_scan_unroll_identical(tmp_path):
    """cfg.scan_unroll (full transformer-block unroll, the DUS-free
    schedule) must not change training numerics: two steps with unroll=0
    track the classic scan bit-for-bit (CPU, fp32)."""
    import jax.numpy as jnp

    results = []
    for unroll in (1, 0):
        t = make_trainer("DSPH", tmp_path / f"u{unroll}", epochs=1,
                         valid=False, scan_unroll=unroll)
        t.train_epoch(0)
        results.append(t.state.params)
    for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_twdh_padded_eval_equals_ragged(tmp_path):
    """Wrap-padded eval batches must not pollute TwDH's batch-statistics BN
    encode (its valid() never leaves train mode — the BN normalizes with
    the EVAL batch's stats).  The 'valid' mask now travels to the device
    and masks pad rows out of the statistics, so a wrap-padded loader
    (eval_batch=10 on 16 queries: final batch 6 real + 4 duplicated rows)
    must produce byte-identical codes to a true-ragged loader with the
    same batch composition ([10], [6]) — the reference DataLoader's
    semantics."""
    from ccmh.data.dataset import BatchIterator

    t = make_trainer("TwDH", tmp_path, eval_batch=10)
    padded_i, padded_t, _ = t.get_code(t.query_loader, len(t.query_data))

    ragged_loader = BatchIterator(
        t.query_data, 10, shuffle=False, seed=t.cfg.seed, num_workers=2,
        ragged_last=True)
    ragged_i, ragged_t, _ = t.get_code(ragged_loader, len(t.query_data))

    np.testing.assert_array_equal(np.asarray(padded_i), np.asarray(ragged_i))
    np.testing.assert_array_equal(np.asarray(padded_t), np.asarray(ragged_t))


def test_loader_start_step_skips_batches():
    """BatchIterator.set_start_step(k): iteration yields exactly the
    uninterrupted epoch's batches [k:], bit-identical (the permutation and
    caption draws are pure functions of (seed, epoch, item)) — the O(1)
    fast-forward the mid-epoch preemption resume uses."""
    from ccmh.data.dataset import BatchIterator, CrossModalDataset

    raw = synthetic_arrays(n=40, n_class=4, resolution=TINY.image_resolution)
    s = split_data(raw, query_num=8, train_num=32, seed=3)
    ds = CrossModalDataset(s.train, is_train=True, max_words=16,
                           resolution=TINY.image_resolution, seed=3)
    loader = BatchIterator(ds, 8, shuffle=True, seed=3, num_workers=2)

    loader.set_epoch(5)
    full = list(loader)
    loader.set_epoch(5)
    loader.set_start_step(2)
    tail = list(loader)
    assert len(full) == 4 and len(tail) == 2
    for a, b in zip(full[2:], tail):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # one-shot: the next plain iteration starts from batch 0 again
    loader.set_epoch(5)
    again = list(loader)
    assert len(again) == len(full)
    np.testing.assert_array_equal(again[0]["index"], full[0]["index"])


@pytest.mark.slow
def test_preemption_mid_epoch_resume_bit_exact(tmp_path):
    """Graceful preemption: request_preempt() mid-epoch writes a full-state
    checkpoint tagged with the step survived, train() exits cleanly, and a
    --resume run fast-forwards the loader and continues BIT-EXACTLY — final
    params, optimizer moments, and step count all match an uninterrupted
    run.  (The reference loses the epoch in progress and every optimizer
    moment on any interruption.)"""
    # uninterrupted oracle: 2 epochs x 2 steps
    t_ref = make_trainer("DSPH", tmp_path / "ref", epochs=2, valid=False)
    t_ref.train()

    # preempted mid-epoch-1: signal lands after global step 3 (epoch 1 step 1)
    t_a = make_trainer("DSPH", tmp_path / "ab", epochs=2, valid=False)
    orig_step = t_a.train_step
    def counting_step(state, batch):
        out = orig_step(state, batch)
        if t_a.global_step + 1 == 3:   # global_step increments after the call
            t_a.request_preempt()
        return out
    t_a.train_step = counting_step
    t_a.train()
    assert t_a.global_step == 3        # exited before epoch 1's second step

    t_b = make_trainer("DSPH", tmp_path / "ab", epochs=2, valid=False,
                       resume=True)
    t_b.train()
    assert int(t_b.state.step) == int(t_ref.state.step)
    for x, y in zip(jax.tree.leaves(t_ref.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(t_ref.state.opt_state),
                    jax.tree.leaves(t_b.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(t_ref.state.extra),
                    jax.tree.leaves(t_b.state.extra)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_sigterm_graceful_checkpoint(tmp_path):
    """A REAL SIGTERM delivered mid-training triggers the checkpoint-and-
    exit path (the signal a preempted TPU VM sends), and --resume finishes
    the remaining epochs to the exact total step count."""
    import os
    import signal
    import threading

    # outer benign handler: if the timer fires after train() restored the
    # previous handler, the process must not die
    prev = signal.signal(signal.SIGTERM, lambda *a: None)
    try:
        t = make_trainer("DSPH", tmp_path, epochs=60, valid=False)
        timer = threading.Timer(2.0, os.kill, (os.getpid(), signal.SIGTERM))
        timer.start()
        try:
            t.train()
        finally:
            timer.cancel()
        assert t._preempt, "SIGTERM never landed during training"
        assert t.global_step < 120
        from ccmh.train.checkpoint import latest_checkpoint
        assert latest_checkpoint(t.cfg.save_dir) is not None

        t2 = make_trainer("DSPH", tmp_path, epochs=60, valid=False,
                          resume=True)
        t2.train()
        assert int(t2.state.step) == 120
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_compilation_cache_flag(tmp_path):
    """--compilation-cache DIR persists compiled executables to disk (the
    cross-process warm-start path)."""
    import jax as _jax

    cache = tmp_path / "xla_cache"
    try:
        t = make_trainer("DCHMT", tmp_path, compilation_cache=str(cache))
        t.train_epoch(0)
        assert cache.is_dir() and len(list(cache.iterdir())) > 0
    finally:
        _jax.config.update("jax_compilation_cache_dir", None)


def test_preemption_mid_epoch_resume_bit_exact_chunked(tmp_path):
    """The preemption/resume contract under CHUNKED (hybrid) residency:
    the resumed epoch re-derives its superblock assignment from the
    remaining batches (a pure function of the loader stream) and the
    padded epoch table reuses the warm program shape.  Final
    params/moments bit-match an uninterrupted CHUNKED run."""
    kw = dict(epochs=2, valid=False, cache_images=True,
              device_resident_budget_mb=0.05, display_step=1)
    t_ref = make_trainer("DSPH", tmp_path / "ref", **kw)
    assert t_ref.train_resident is None and t_ref.train_chunked is not None
    t_ref.train()

    t_a = make_trainer("DSPH", tmp_path / "ab", **kw)
    orig_write = t_a.metrics.write

    def spy(tag, step, **m):
        orig_write(tag, step, **m)
        if tag == "train" and t_a.global_step == 3:
            t_a.request_preempt()   # lands at epoch 1 step 1 of 2

    t_a.metrics.write = spy
    t_a.train()
    assert t_a.global_step == 3

    t_b = make_trainer("DSPH", tmp_path / "ab", resume=True, **kw)
    assert t_b.train_chunked is not None
    t_b.train()
    assert int(t_b.state.step) == int(t_ref.state.step)
    for x, y in zip(jax.tree.leaves(t_ref.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(t_ref.state.opt_state),
                    jax.tree.leaves(t_b.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_preemption_mid_epoch_resume_bit_exact_resident(tmp_path):
    """The preemption/resume contract holds under device-resident epochs:
    the zero-put epoch-table flow (data/resident.py) must fast-forward via
    the loader's set_start_step exactly like streaming — pack_epoch sees
    only the remaining batches and the device counter restarts at row 0 of
    the truncated table.  Final params/moments bit-match an uninterrupted
    RESIDENT run."""
    kw = dict(epochs=2, valid=False, cache_images=True,
              device_resident_images="on", display_step=1)
    t_ref = make_trainer("DSPH", tmp_path / "ref", **kw)
    assert t_ref.train_resident is not None
    t_ref.train()

    t_a = make_trainer("DSPH", tmp_path / "ab", **kw)
    orig_write = t_a.metrics.write

    def spy(tag, step, **m):
        orig_write(tag, step, **m)
        if tag == "train" and t_a.global_step == 3:
            t_a.request_preempt()   # lands at epoch 1 step 1 of 2

    t_a.metrics.write = spy
    t_a.train()
    assert t_a.global_step == 3

    t_b = make_trainer("DSPH", tmp_path / "ab", resume=True, **kw)
    assert t_b.train_resident is not None
    t_b.train()
    assert int(t_b.state.step) == int(t_ref.state.step)
    for x, y in zip(jax.tree.leaves(t_ref.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(t_ref.state.opt_state),
                    jax.tree.leaves(t_b.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
