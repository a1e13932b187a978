"""Native C++ batch image loader: PIL parity + pipeline integration.

The loader reimplements the reference transform (dataset/base.py:35-44 —
bicubic resize, center crop, CLIP normalize) in C++ with libjpeg; outputs
must match the Python/PIL path within uint8 rounding (1/255 per channel).
"""

import os

import numpy as np
import pytest

from PIL import Image

from ccmh.data import native
from ccmh.data.dataset import CrossModalDataset, BatchIterator, _to_pil, _transform
from ccmh.data.split import RawData

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader toolchain unavailable")

STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _make_jpegs(tmp_path, sizes, quality=92):
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=quality)
        paths.append(p)
    return paths


@pytest.mark.parametrize("is_train", [True, False])
def test_pil_parity(tmp_path, is_train):
    paths = _make_jpegs(tmp_path, [(320, 240), (224, 224), (64, 100), (500, 375)])
    images, ok = native.decode_batch(paths, 224, is_train)
    assert ok.all()
    for img, p in zip(images, paths):
        ref = _transform(_to_pil(p), 224, is_train)
        pixel_diff = np.abs(img - ref) * STD * 255.0
        assert pixel_diff.max() <= 2.0 + 1e-3, pixel_diff.max()


def test_failure_flags(tmp_path):
    good = _make_jpegs(tmp_path, [(64, 64)])[0]
    bad = str(tmp_path / "not_a.jpg")
    with open(bad, "wb") as fh:
        fh.write(b"this is not a jpeg")
    images, ok = native.decode_batch([good, bad, good], 32, False)
    assert ok.tolist() == [True, False, True]


def test_batch_iterator_uses_native(tmp_path):
    """End-to-end through BatchIterator: native-loaded batches match the
    per-item PIL path exactly (same items, same transform)."""
    paths = _make_jpegs(tmp_path, [(100, 80), (80, 100), (224, 224), (90, 90)])
    labels = np.eye(4, dtype=np.float32)
    raw = RawData(
        captions=np.asarray(["a b", "c d", "e f", "g h"], object),
        indexes=np.asarray(paths, object),
        labels=labels,
    )
    ds = CrossModalDataset(raw, is_train=True, max_words=8, resolution=64, seed=0)
    assert ds.image_path(0) == paths[0]

    it = BatchIterator(ds, batch_size=4, shuffle=False, num_workers=2)
    batch = next(iter(it))
    assert batch["image"].shape == (4, 64, 64, 3)
    for j in range(4):
        ref = ds.load_image(j)
        pixel_diff = np.abs(batch["image"][j] - ref) * STD * 255.0
        assert pixel_diff.max() <= 2.0 + 1e-3

    # in-memory array sources (synthetic tests) use the PIL path untouched
    raw2 = RawData(
        captions=raw.captions,
        indexes=np.asarray([np.zeros((8, 8, 3), np.uint8)] * 4, dtype=object),
        labels=labels,
    )
    ds2 = CrossModalDataset(raw2, is_train=True, max_words=8, resolution=64, seed=0)
    assert ds2.image_path(0) is None


def test_grayscale_jpeg(tmp_path):
    """Grayscale JPEGs decode via libjpeg's L->RGB conversion and match the
    PIL path (real Flickr/COCO archives contain mode-L images)."""
    rng = np.random.RandomState(5)
    arr = (rng.rand(120, 90) * 255).astype(np.uint8)
    p = str(tmp_path / "gray.jpg")
    Image.fromarray(arr, mode="L").save(p, quality=92)
    images, ok = native.decode_batch([p], 64, True)
    assert ok.all()
    ref = _transform(_to_pil(p), 64, True)
    pixel_diff = np.abs(images[0] - ref) * STD * 255.0
    assert pixel_diff.max() <= 2.0 + 1e-3, pixel_diff.max()


def test_mem_decode_matches_path_decode(tmp_path):
    """decode_batch_mem (serving ingestion: raw bytes, no file) is
    bit-identical to decode_batch on the same JPEG payloads, and flags
    corrupt/empty payloads instead of failing the batch."""
    paths = _make_jpegs(tmp_path, [(320, 240), (64, 100), (224, 224)])
    blobs = [open(p, "rb").read() for p in paths]
    via_path, ok_p = native.decode_batch(paths, 96, False)
    via_mem, ok_m = native.decode_batch_mem(blobs, 96, False)
    assert ok_p.all() and ok_m.all()
    np.testing.assert_array_equal(via_mem, via_path)

    mixed = [blobs[0], b"not a jpeg", b"", blobs[2]]
    images, ok = native.decode_batch_mem(mixed, 96, False)
    assert ok.tolist() == [True, False, False, True]
    np.testing.assert_array_equal(images[0], via_mem[0])


def test_images_from_bytes_fallback(tmp_path):
    """images_from_bytes: JPEGs ride the native loader, PNGs fall back to
    PIL per item, undecodable bytes raise a clear ValueError."""
    import io as _io

    from ccmh.data.dataset import images_from_bytes

    rng = np.random.RandomState(7)
    arr = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    jpg = _io.BytesIO()
    Image.fromarray(arr).save(jpg, format="JPEG", quality=92)
    png = _io.BytesIO()
    Image.fromarray(arr).save(png, format="PNG")

    images = images_from_bytes([jpg.getvalue(), png.getvalue()], 48)
    for i, blob in enumerate([jpg.getvalue(), png.getvalue()]):
        ref = _transform(
            Image.open(_io.BytesIO(blob)).convert("RGB"), 48, False)
        pixel_diff = np.abs(images[i] - ref) * STD * 255.0
        assert pixel_diff.max() <= 2.0 + 1e-3, pixel_diff.max()

    with pytest.raises(ValueError, match="image 1"):
        images_from_bytes([jpg.getvalue(), b"garbage"], 48)
