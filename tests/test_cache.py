"""Decoded-tensor image cache (data/cache.py): losslessness + integration.

The cache stores post-resize uint8 images (the transforms are deterministic,
dataset/base.py:35-44 has no random augmentation) and normalization moves
on-device (clip/model.py normalize_pixels).  These tests pin down the whole
equivalence chain: cached bytes == direct transform, on-device normalize ==
host normalize, cached training == uncached training.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from PIL import Image

from ccmh.clip.model import ClipConfig, init_clip_params, normalize_pixels, vision_forward
from ccmh.data import native
from ccmh.data.cache import ImageCache, dataset_fingerprint, open_or_build
from ccmh.data.dataset import BatchIterator, CrossModalDataset, normalize_u8
from ccmh.data.split import RawData
from ccmh.data.synthetic import synthetic_arrays


def _array_dataset(n=6, resolution=32, is_train=True, seed=3):
    rng = np.random.RandomState(seed)
    raw = RawData(
        captions=np.asarray([f"caption {i}" for i in range(n)], object),
        indexes=(rng.rand(n, 40, 48, 3) * 255).astype(np.uint8),
        labels=np.eye(max(n, 2), dtype=np.float32)[:n],
    )
    return CrossModalDataset(raw, is_train=is_train, max_words=8,
                             resolution=resolution, seed=0)


def _jpeg_dataset(tmp_path, sizes, resolution=32, is_train=True):
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    raw = RawData(
        captions=np.asarray([f"c {i}" for i in range(len(paths))], object),
        indexes=np.asarray(paths, object),
        labels=np.eye(max(len(paths), 2), dtype=np.float32)[: len(paths)],
    )
    return CrossModalDataset(raw, is_train=is_train, max_words=8,
                             resolution=resolution, seed=0)


def test_build_is_lossless_for_pil_sources(tmp_path):
    """Array-source items decode via PIL on both paths -> bit-identical."""
    ds = _array_dataset()
    cache = ImageCache.build(ds, str(tmp_path / "c"), num_workers=2)
    assert len(cache) == len(ds)
    for i in range(len(ds)):
        np.testing.assert_array_equal(cache.gather([i])[0], ds.load_image_u8(i))


@pytest.mark.skipif(not native.available(), reason="native loader unavailable")
@pytest.mark.parametrize("is_train", [True, False])
def test_build_jpeg_native_parity(tmp_path, is_train):
    """JPEG-path items decode via the native u8 loader; within the loader's
    documented <=2/255 parity envelope of the PIL transform."""
    ds = _jpeg_dataset(tmp_path, [(50, 40), (32, 32), (64, 100)],
                       is_train=is_train)
    cache = ImageCache.build(ds, str(tmp_path / "c"), num_workers=2)
    for i in range(len(ds)):
        diff = np.abs(cache.gather([i])[0].astype(np.int16)
                      - ds.load_image_u8(i).astype(np.int16))
        assert diff.max() <= 2, diff.max()


def test_cache_reuse_and_fingerprint_invalidation(tmp_path):
    ds = _array_dataset()
    path = str(tmp_path / "c")
    cache = ImageCache.build(ds, path)
    data_file = os.path.join(path, cache.meta["data"])
    stamp = os.path.getmtime(data_file)
    # same dataset -> reopened, not rebuilt
    cache2 = ImageCache.build(ds, path)
    assert os.path.getmtime(data_file) == stamp
    np.testing.assert_array_equal(cache.gather([1]), cache2.gather([1]))
    # different pixels -> different fingerprint -> rebuild
    ds2 = _array_dataset(seed=7)
    assert dataset_fingerprint(ds2) != dataset_fingerprint(ds)
    cache3 = ImageCache.build(ds2, path)
    np.testing.assert_array_equal(cache3.gather([0])[0], ds2.load_image_u8(0))


def test_fingerprint_tracks_in_place_file_edits(tmp_path):
    """Editing an image file IN PLACE (same filename) must invalidate the
    cache: the fingerprint folds in size+mtime, not just the path string."""
    ds = _jpeg_dataset(tmp_path, [(40, 40), (40, 40)])
    fp1 = dataset_fingerprint(ds)
    p = str(ds.raw.indexes[0])
    arr = (np.random.RandomState(9).rand(40, 40, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(p, quality=92)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    assert dataset_fingerprint(ds) != fp1


def test_rebuild_never_leaves_stale_meta_over_new_data(tmp_path):
    """meta.json can only ever bless the payload built for ITS fingerprint:
    the payload filename embeds the fingerprint and meta references it by
    name, so a crash at ANY point of a rebuild leaves either the complete
    old cache or the complete new one — never a stale fingerprint over
    different pixels."""
    ds = _array_dataset()
    path = str(tmp_path / "c")
    cache1 = ImageCache.build(ds, path)
    old_meta = dict(cache1.meta)
    old_pixels = cache1.gather([0])[0].copy()

    # simulate a crash mid-rebuild: the new payload has landed but the
    # meta write dies -> the directory must still open as the OLD cache
    real_replace = os.replace
    import unittest.mock as mock

    def dying_replace(src, dst):
        if dst.endswith("meta.json"):
            raise RuntimeError("crash before meta write")
        return real_replace(src, dst)

    ds2 = _array_dataset(seed=11)
    with mock.patch("os.replace", dying_replace):
        with pytest.raises(RuntimeError):
            ImageCache.build(ds2, path)
    survivor = ImageCache(path)
    assert survivor.meta == old_meta
    np.testing.assert_array_equal(survivor.gather([0])[0], old_pixels)

    # the completed rebuild swaps both atomically and GCs the old payload
    cache2 = ImageCache.build(ds2, path)
    assert cache2.meta["data"] != old_meta["data"]
    np.testing.assert_array_equal(cache2.gather([0])[0], ds2.load_image_u8(0))
    payloads = [n for n in os.listdir(path) if n.startswith("images.")]
    assert payloads == [cache2.meta["data"]]


def test_device_normalize_matches_host():
    """clip/model.py normalize_pixels (on-device) == dataset.py normalize_u8
    (host) — same op order, float32; this is what makes uint8-to-the-device
    batches equivalent to the reference's host-normalized float batches."""
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
    dev = np.asarray(normalize_pixels(jnp.asarray(u8)))
    host = normalize_u8(u8)
    np.testing.assert_allclose(dev, host, atol=1e-6, rtol=0)


def test_vision_forward_uint8_equals_float():
    cfg = ClipConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (2, cfg.image_resolution, cfg.image_resolution, 3),
                     np.uint8)
    out_u8 = vision_forward(params["visual"], cfg, jnp.asarray(u8)).pooled
    out_f = vision_forward(params["visual"], cfg,
                           jnp.asarray(normalize_u8(u8))).pooled
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f),
                               atol=1e-5, rtol=1e-5)


def test_batch_iterator_with_cache_matches_direct(tmp_path):
    ds = _array_dataset(n=5, resolution=32)
    cache = ImageCache.build(ds, str(tmp_path / "c"))
    it_cached = BatchIterator(ds, batch_size=2, shuffle=False, num_workers=2,
                              image_cache=cache)
    it_direct = BatchIterator(ds, batch_size=2, shuffle=False, num_workers=2)
    for bc, bd in zip(it_cached, it_direct):
        assert bc["image"].dtype == np.uint8
        np.testing.assert_allclose(normalize_u8(bc["image"]), bd["image"],
                                   atol=1e-6, rtol=0)
        np.testing.assert_array_equal(bc["text"], bd["text"])
        np.testing.assert_array_equal(bc["valid"], bd["valid"])


@pytest.mark.slow
def test_trainer_cached_equals_uncached(tmp_path):
    """Full Trainer with --cache-images: identical losses and identical
    valid() mAPs vs the uncached run (array sources -> PIL path -> the cache
    is bit-lossless, and normalize-on-device == normalize-on-host)."""
    from ccmh.clip.model import ClipConfig, init_clip_params
    from ccmh.config import Config
    from ccmh.data.split import split_data
    from ccmh.train.trainer import Trainer

    tiny = ClipConfig.tiny()
    raw = synthetic_arrays(n=48, n_class=8, resolution=tiny.image_resolution)
    splits = split_data(raw, query_num=16, train_num=24, seed=1814)

    def run(cache: bool, sub: str):
        # fresh host copy per run — the jitted train step donates its state
        clip_params = jax.tree.map(
            np.asarray, init_clip_params(jax.random.PRNGKey(0), tiny))
        cfg = Config(
            method="DCHMT", dataset="synthetic", output_dim=16,
            save_dir=str(tmp_path / sub), epochs=1, batch_size=8,
            query_num=16, train_num=24, seed=1814,
            resolution=tiny.image_resolution, eval_batch=16,
            display_step=1000, nclass=8, cache_images=cache,
            cache_dir=str(tmp_path / sub / "cache"))
        tr = Trainer(cfg, splits=splits, clip_cfg=tiny, clip_params=clip_params)
        tr.train_epoch(0)
        return tr.valid(0), tr.state

    maps_c, state_c = run(True, "cached")
    maps_d, state_d = run(False, "direct")
    np.testing.assert_allclose(maps_c, maps_d, atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_c.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_build_validates_reopen_after_lost_race(tmp_path):
    """ADVICE r3: if a concurrent divergent builder replaces meta.json after
    our build lands, build() must NOT hand back the other builder's pixels —
    it retries its own build and returns a fingerprint-matching cache."""
    import unittest.mock as mock

    ds = _array_dataset(seed=3)
    ds_other = _array_dataset(seed=21)
    path = str(tmp_path / "c")
    fp = dataset_fingerprint(ds)

    real_once = ImageCache._build_once
    calls = {"n": 0}

    def racing_once(dataset, p, f, meta_path, **kw):
        real_once(dataset, p, f, meta_path, **kw)
        if calls["n"] == 0:
            # the rival lands AFTER us, replacing meta with ITS fingerprint
            real_once(ds_other, p, dataset_fingerprint(ds_other), meta_path,
                      **kw)
        calls["n"] += 1

    with mock.patch.object(ImageCache, "_build_once", staticmethod(racing_once)):
        cache = ImageCache.build(ds, path)
    assert calls["n"] == 2  # first attempt lost the race, second retried
    assert cache.meta["fingerprint"] == fp
    np.testing.assert_array_equal(cache.gather([0])[0], ds.load_image_u8(0))


def test_build_gives_up_after_repeated_lost_races(tmp_path):
    """Three consecutive lost races raise instead of looping forever."""
    import unittest.mock as mock

    ds = _array_dataset(seed=3)
    ds_other = _array_dataset(seed=21)
    path = str(tmp_path / "c")
    real_once = ImageCache._build_once

    def always_lose(dataset, p, f, meta_path, **kw):
        real_once(ds_other, p, dataset_fingerprint(ds_other), meta_path, **kw)

    with mock.patch.object(ImageCache, "_build_once", staticmethod(always_lose)):
        with pytest.raises(RuntimeError, match="lost 3 consecutive races"):
            ImageCache.build(ds, path)


def test_gc_collects_stale_orphaned_tmp_files(tmp_path):
    """ADVICE r3: a builder SIGKILLed mid-write leaves a dataset-sized
    '.tmp.' orphan; GC collects it once it is older than a day, while a
    fresh tmp (a live concurrent builder) is left alone."""
    ds = _array_dataset()
    path = str(tmp_path / "c")
    os.makedirs(path)
    stale = os.path.join(path, "images.deadbeef0000.u8.tmp.999.aaaa")
    fresh = os.path.join(path, "images.cafebabe0000.u8.tmp.998.bbbb")
    for p in (stale, fresh):
        with open(p, "wb") as fh:
            fh.write(b"x" * 64)
    old = os.path.getmtime(stale) - 25 * 3600
    os.utime(stale, (old, old))

    ImageCache.build(ds, path)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
