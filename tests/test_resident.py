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
