"""Device-resident epochs (ccmh/data/resident.py).

The resident path replaces per-step host image puts (reference
train/base.py:87-92 DataLoader streaming) with one split-sized put and
on-device batch gathers.  Contract: bit-exact training vs the streaming
cache path — same pixels, same shuffle, same caption draws — only the
transport changes.
"""

import os

import numpy as np
import pytest

import jax

from ccmh.config import Config
from ccmh.data.cache import ImageCache
from ccmh.data.dataset import BatchIterator, CrossModalDataset
from ccmh.data.resident import ResidentImages
from ccmh.data.split import RawData
from ccmh.data.synthetic import synthetic_arrays


def _dataset(n=12, resolution=32, seed=5):
    caps, idx, labels = synthetic_arrays(n=n, n_class=4, resolution=resolution,
                                         seed=seed)
    raw = RawData(captions=caps, indexes=idx, labels=labels)
    return CrossModalDataset(raw, is_train=True, max_words=8,
                             resolution=resolution)


def test_gather_matches_host(tmp_path):
    ds = _dataset()
    cache = ImageCache.build(ds, str(tmp_path / "c"))
    res = ResidentImages(cache.images)
    idx = np.asarray([3, 0, 7, 7, 11], np.int32)
    np.testing.assert_array_equal(np.asarray(res.gather(idx)),
                                  cache.gather(idx))


def test_maybe_gating(tmp_path):
    ds = _dataset()
    cache = ImageCache.build(ds, str(tmp_path / "c"))
    mb = cache.images.nbytes / 2**20
    assert ResidentImages.maybe(cache, budget_mb=mb * 2) is not None
    assert ResidentImages.maybe(cache, budget_mb=mb / 2) is None
    assert ResidentImages.maybe(cache, budget_mb=mb * 2, mode="off") is None
    assert ResidentImages.maybe(cache, budget_mb=mb * 2,
                                mesh_transport=True) is None
    with pytest.raises(ValueError, match="budget"):
        ResidentImages.maybe(cache, budget_mb=mb / 2, mode="on")
    with pytest.raises(ValueError, match="tensor-parallel"):
        ResidentImages.maybe(cache, budget_mb=mb * 2, mode="on",
                             mesh_transport=True)


def test_loader_without_images_keeps_meta(tmp_path):
    ds = _dataset()
    cache = ImageCache.build(ds, str(tmp_path / "c"))
    a = BatchIterator(ds, 5, shuffle=True, seed=3, image_cache=cache,
                      ragged_last=True)
    b = BatchIterator(ds, 5, shuffle=True, seed=3, image_cache=cache,
                      ragged_last=True, with_images=False)
    a.set_epoch(2), b.set_epoch(2)
    for ba, bb in zip(a, b):
        assert "image" in ba and "image" not in bb
        for k in ("text", "label", "index", "valid"):
            np.testing.assert_array_equal(ba[k], bb[k])
        # resident gather of bb's indices == streamed pixels
        np.testing.assert_array_equal(
            cache.gather(bb["index"]), ba["image"])


def test_trainer_resident_equals_streaming(tmp_path):
    """Full Trainer epochs: device_resident_images=on is bit-exact vs off."""
    from ccmh.data.synthetic import write_synthetic_mat_dataset
    from ccmh.train.trainer import Trainer
    from ccmh.clip.model import ClipConfig

    data_dir = str(tmp_path / "data")
    write_synthetic_mat_dataset(data_dir, n=24, n_class=4, resolution=32)

    states = {}
    for mode in ("off", "on"):
        cfg = Config(method="DCHMT", dataset="synthetic", output_dim=16,
                     data_dir=data_dir, save_dir=str(tmp_path / f"out_{mode}"),
                     epochs=2, batch_size=10, query_num=8, train_num=16,
                     eval_batch=8, valid=False, cache_images=True,
                     cache_dir=str(tmp_path / f"cache_{mode}"),
                     device_resident_images=mode)
        tr = Trainer(cfg, clip_cfg=ClipConfig.tiny())
        assert (tr.train_resident is not None) == (mode == "on")
        tr.train()
        states[mode] = jax.device_get(tr.state.params)
    # two epochs of full training: every trained weight bit-identical —
    # the resident transport (fused put + on-device gather inside the
    # jitted step) must be invisible to the numerics
    flat_off = jax.tree_util.tree_leaves_with_path(states["off"])
    flat_on = dict(jax.tree_util.tree_leaves_with_path(states["on"]))
    assert flat_off and len(flat_off) == len(flat_on)
    for path, leaf in flat_off:
        np.testing.assert_array_equal(leaf, flat_on[path],
                                      err_msg=jax.tree_util.keystr(path))


def _trainer(tmp_path, method="DCHMT", tag="t", **kw):
    from ccmh.data.synthetic import (
        write_synthetic_mat_dataset, write_synthetic_twdh_assets,
    )
    from ccmh.train.trainer import Trainer
    from ccmh.clip.model import ClipConfig

    data_dir = str(tmp_path / "data")
    if not os.path.isdir(data_dir):
        write_synthetic_mat_dataset(data_dir, n=30, n_class=4, resolution=32)
    base = dict(method=method, dataset="synthetic", output_dim=16,
                data_dir=data_dir, save_dir=str(tmp_path / f"out_{tag}"),
                epochs=1, batch_size=8, query_num=10, train_num=12,
                eval_batch=8, valid=False, cache_images=True,
                cache_dir=str(tmp_path / "cache"))
    base.update(kw)
    cfg = Config(**base)
    if method == "TwDH":
        cfg.twdh.center_path = write_synthetic_twdh_assets(
            str(tmp_path / "twdh_centers.npz"))
    return Trainer(cfg, clip_cfg=ClipConfig.tiny())


def test_eval_resident_codes_equal_streaming(tmp_path):
    """Zero-put validation (VERDICT r4 #1): the one-dispatch resident
    encoder must produce BIT-IDENTICAL codes to the streaming get_code
    loop for both eval splits — same params, same cache pixels, same
    epoch-invariant tokens; only the transport changes."""
    t = _trainer(tmp_path, device_resident_images="on")
    assert set(t._resident_eval_plan) == {"query", "retrieval"}
    res = {}
    for split, loader, n in (("query", t.query_loader, len(t.query_data)),
                             ("retrieval", t.retrieval_loader,
                              len(t.retrieval_data))):
        ic, tc, _ = t.get_code(loader, n)
        assert not isinstance(ic, np.ndarray)   # device arrays (stay on-chip)
        res[split] = (np.asarray(ic), np.asarray(tc))
    # force the streaming path on the SAME trainer state
    t._resident_eval_plan = {}
    for split, loader, n in (("query", t.query_loader, len(t.query_data)),
                             ("retrieval", t.retrieval_loader,
                              len(t.retrieval_data))):
        ic, tc, _ = t.get_code(loader, n)
        np.testing.assert_array_equal(res[split][0], ic, err_msg=split)
        np.testing.assert_array_equal(res[split][1], tc, err_msg=split)


def test_eval_resident_codes_equal_streaming_dp_mesh(tmp_path):
    """Same contract under the 8-virtual-device DP mesh: the row-sharded
    pinned tables + in-scan gather collectives must be invisible to the
    extracted codes."""
    t = _trainer(tmp_path, method="DSPH", tag="mesh", mesh_shape=(8,),
                 batch_size=16, eval_batch=8, device_resident_images="on")
    assert set(t._resident_eval_plan) == {"query", "retrieval"}
    ic_r, tc_r, _ = t.get_code(t.query_loader, len(t.query_data))
    assert t._resident_eval.get("query") is not None   # pinned lazily
    t._resident_eval_plan = {}
    ic_s, tc_s, _ = t.get_code(t.query_loader, len(t.query_data))
    np.testing.assert_array_equal(np.asarray(ic_r), ic_s)
    np.testing.assert_array_equal(np.asarray(tc_r), tc_s)


def test_eval_resident_budget_gating(tmp_path):
    """An over-budget retrieval split streams while the (smaller) query
    split still pins — the COCO-on-16GiB configuration."""
    # budget accounting is cumulative: train pins first (~36 KiB), then
    # query (~51 KiB incl. tokens), and retrieval (~76 KiB) must exceed
    # the 0.12 MiB (= ~126 KiB) budget and stream
    t = _trainer(tmp_path, tag="budget",
                 device_resident_images="auto",
                 device_resident_budget_mb=0.12)
    assert t.train_resident is not None
    assert "query" in t._resident_eval_plan
    assert "retrieval" not in t._resident_eval_plan


def test_twdh_multi_resident_equals_streaming(tmp_path):
    """TwDH: batch-statistics BN encode (wrap-pad masked by `valid`) and
    the multi-length code dict, resident vs streaming."""
    t = _trainer(tmp_path, method="TwDH", tag="twdh",
                 device_resident_images="on")
    ic_r, tc_r, _ = t.get_code(t.query_loader, len(t.query_data))
    multi_r = t._get_multi_codes(t.query_loader, len(t.query_data))
    t._resident_eval_plan = {}
    ic_s, tc_s, _ = t.get_code(t.query_loader, len(t.query_data))
    multi_s = t._get_multi_codes(t.query_loader, len(t.query_data))
    np.testing.assert_array_equal(np.asarray(ic_r), ic_s)
    np.testing.assert_array_equal(np.asarray(tc_r), tc_s)
    assert set(multi_r) == set(multi_s)
    for name in multi_r:
        np.testing.assert_array_equal(
            np.asarray(multi_r[name][0]), multi_s[name][0], err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(multi_r[name][1]), multi_s[name][1], err_msg=name)


def test_augment_chunked_batches_shapes():
    """Superblock assignment: composition untouched, streamed rows get
    in-buffer positions, blocks never overflow."""
    from ccmh.data.resident import augment_chunked_batches

    rng = np.random.RandomState(0)
    idx = rng.permutation(40)
    batches = [{"index": idx[i:i + 8].astype(np.int32),
                "label": np.zeros((len(idx[i:i + 8]), 3), np.float32)}
               for i in range(0, 40, 8)]
    aug, sblocks, sb_of_batch = augment_chunked_batches(
        batches, n_resident=25, block_rows=10)
    assert len(aug) == len(batches) == len(sb_of_batch)
    streamed_total = 0
    for a, b in zip(aug, batches):
        np.testing.assert_array_equal(a["index"], b["index"])  # untouched
        res = a["is_res"]
        np.testing.assert_array_equal(res, b["index"] < 25)
        np.testing.assert_array_equal(a["res_idx"][res], b["index"][res])
        streamed_total += int((~res).sum())
    assert sum(len(s) for s in sblocks) == streamed_total
    assert all(len(s) <= 10 for s in sblocks)
    # every streamed row's sb_pos indexes its block's buffer correctly
    for a, g in zip(aug, sb_of_batch):
        for row, pos in zip(a["index"][~a["is_res"]],
                            a["sb_pos"][~a["is_res"]]):
            assert sblocks[g][pos] == row


def test_trainer_chunked_equals_streaming(tmp_path):
    """Over-budget split -> hybrid chunked residency, bit-exact vs
    streaming (VERDICT r4 #2): pinned region + per-epoch superblock
    streaming must be invisible to the trained weights."""
    states = {}
    for mode, kw in (("chunk", dict(device_resident_budget_mb=0.02)),
                     ("stream", dict(device_resident_images="off"))):
        t = _trainer(tmp_path, method="DSPH", tag=f"ck_{mode}",
                     epochs=2, **kw)
        if mode == "chunk":
            assert t.train_resident is None and t.train_chunked is not None
            assert t.train_chunked["R"] < len(t.train_data)
        else:
            assert t.train_chunked is None
        t.train()
        states[mode] = jax.device_get(t.state.params)
    flat_s = jax.tree_util.tree_leaves_with_path(states["stream"])
    flat_c = dict(jax.tree_util.tree_leaves_with_path(states["chunk"]))
    assert flat_s and len(flat_s) == len(flat_c)
    for path, leaf in flat_s:
        np.testing.assert_array_equal(leaf, flat_c[path],
                                      err_msg=jax.tree_util.keystr(path))


def test_trainer_chunked_dp_mesh_equals_streaming(tmp_path):
    """Chunked residency under the 8-virtual-device DP mesh (region
    row-sharded, superblock buffers replicated): trained weights
    bit-match the stream+shard_batch path."""
    states = {}
    for mode, kw in (("chunk", dict(device_resident_budget_mb=0.003)),
                     ("stream", dict(device_resident_images="off"))):
        t = _trainer(tmp_path, method="DSPH", tag=f"mck_{mode}",
                     epochs=2, mesh_shape=(8,), batch_size=8, **kw)
        if mode == "chunk":
            assert t.train_chunked is not None
        t.train()
        states[mode] = jax.device_get(t.state.params)
    flat_s = jax.tree_util.tree_leaves_with_path(states["stream"])
    flat_c = dict(jax.tree_util.tree_leaves_with_path(states["chunk"]))
    assert flat_s and len(flat_s) == len(flat_c)
    for path, leaf in flat_s:
        np.testing.assert_array_equal(leaf, flat_c[path],
                                      err_msg=jax.tree_util.keystr(path))


def test_valid_resident_matches_streaming(tmp_path):
    """Full valid(): device-resident codes feed the on-device mAP directly
    (device labels, no host staging) and the best-epoch .mat export
    converts them — numbers identical to the streaming pipeline."""
    t_on = _trainer(tmp_path, tag="v_on", device_resident_images="on",
                    valid=True, save_mat=True)
    r_on = t_on.valid(0)
    t_off = _trainer(tmp_path, tag="v_off", device_resident_images="off",
                     valid=True)
    r_off = t_off.valid(0)
    assert r_on == r_off
    # the .mat snapshot was written from device arrays
    import glob
    assert glob.glob(os.path.join(t_on.cfg.save_dir, "PR_cruve", "*.mat"))


def test_fused_batch_put_round_trip():
    """FusedBatchPut is a pure layout transform: every field comes back
    bit-exact with its dtype and shape."""
    from ccmh.data.resident import FusedBatchPut

    rng = np.random.RandomState(7)
    batch = {
        "index": np.arange(10, dtype=np.int32),
        "text": rng.randint(0, 49408, (10, 32)).astype(np.int32),
        "label": rng.rand(10, 24).astype(np.float32),
        "valid": np.asarray([True] * 7 + [False] * 3),
        "key_padding_mask": rng.rand(10, 32) < 0.5,
    }
    fused = FusedBatchPut()
    out = fused(batch)
    assert set(out) == set(batch)
    for k, v in batch.items():
        got = np.asarray(out[k])
        assert got.dtype == v.dtype, (k, got.dtype, v.dtype)
        np.testing.assert_array_equal(got, v, err_msg=k)
    # second call with the same spec reuses the jitted unpack
    assert len(fused._unpack) == 1
    out2 = fused({k: v.copy() for k, v in batch.items()})
    np.testing.assert_array_equal(np.asarray(out2["label"]), batch["label"])
    # a ragged final batch (different shapes) compiles its own unpack
    ragged = {k: v[:3] for k, v in batch.items()}
    out3 = fused(ragged)
    assert len(fused._unpack) == 2
    np.testing.assert_array_equal(np.asarray(out3["text"]), batch["text"][:3])


def test_trainer_resident_dp_mesh_equals_streaming(tmp_path):
    """DP mesh (8 virtual devices): resident row-sharded epochs are
    bit-exact vs the stream+shard_batch path — same trained weights."""
    from ccmh.data.synthetic import write_synthetic_mat_dataset
    from ccmh.train.trainer import Trainer
    from ccmh.clip.model import ClipConfig

    data_dir = str(tmp_path / "data")
    write_synthetic_mat_dataset(data_dir, n=32, n_class=4, resolution=32)

    states = {}
    for mode in ("off", "on"):
        cfg = Config(method="DSPH", dataset="synthetic", output_dim=16,
                     data_dir=data_dir, save_dir=str(tmp_path / f"o_{mode}"),
                     epochs=2, batch_size=16, query_num=8, train_num=16,
                     eval_batch=8, valid=False, cache_images=True,
                     cache_dir=str(tmp_path / f"c_{mode}"),
                     device_resident_images=mode, mesh_shape=(8,))
        tr = Trainer(cfg, clip_cfg=ClipConfig.tiny())
        assert (tr.train_resident is not None) == (mode == "on")
        if mode == "on":
            # the pinned table is row-sharded over the mesh, padded to a
            # device-count multiple
            assert tr.train_resident.images.shape[0] % 8 == 0
            shard_rows = {
                s.data.shape[0]
                for s in tr.train_resident.images.addressable_shards}
            assert shard_rows == {tr.train_resident.images.shape[0] // 8}
        tr.train()
        states[mode] = jax.device_get(tr.state.params)
    flat_off = jax.tree_util.tree_leaves_with_path(states["off"])
    flat_on = dict(jax.tree_util.tree_leaves_with_path(states["on"]))
    assert flat_off and len(flat_off) == len(flat_on)
    for path, leaf in flat_off:
        np.testing.assert_array_equal(leaf, flat_on[path],
                                      err_msg=jax.tree_util.keystr(path))
