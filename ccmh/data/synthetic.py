"""Synthetic datasets for tests and benchmarks (no reference counterpart —
the reference assumes pre-built COCO/NUS-WIDE/MIRFLICKR .mat files).

Two forms:
* in-memory RawData with npy-mode images (uint8 arrays) — unit tests;
* on-disk .mat files in the exact reference layout
  (index.mat["index"], caption.mat["caption"], label.mat["category"],
  dataset/dataloader.py:40-53) — end-to-end CLI tests.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import scipy.io as scio

from ccmh.data.split import RawData

_WORDS = (
    "a the of on in cat dog man woman tree car road sky sea boat bird "
    "red green blue small large photo picture group person riding standing "
    "playing holding table room street mountain snow water grass field"
).split()


def synthetic_arrays(
    n: int = 64,
    n_class: int = 8,
    resolution: int = 32,
    captions_per_item: int = 3,
    seed: int = 0,
) -> RawData:
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, size=(n, resolution, resolution, 3), dtype=np.uint8)
    captions = np.empty(n, dtype=object)
    for i in range(n):
        captions[i] = [
            " ".join(rng.choice(_WORDS, size=rng.randint(3, 10)))
            for _ in range(captions_per_item)
        ]
    labels = (rng.rand(n, n_class) < 0.25).astype(np.float32)
    labels[np.arange(n), rng.randint(0, n_class, n)] = 1.0  # no empty labels
    return RawData(captions, images, labels)


def write_synthetic_mat_dataset(
    out_dir: str,
    n: int = 64,
    n_class: int = 8,
    resolution: int = 32,
    seed: int = 0,
    jpeg: bool = False,
    captions_per_item: int = 3,
) -> str:
    """Write index.npy (npy image mode) + caption.mat + label.mat.

    ``jpeg=True`` instead writes the images as .jpg files and an index.mat
    of their paths — the reference's real dataset layout
    (dataset/dataloader.py:46-48), which also exercises the native C++
    batch loader in end-to-end runs.
    """
    os.makedirs(out_dir, exist_ok=True)
    raw = synthetic_arrays(n, n_class, resolution, seed=seed,
                           captions_per_item=captions_per_item)
    if jpeg:
        from PIL import Image

        img_dir = os.path.join(out_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        paths = []
        for i in range(n):
            p = os.path.join(img_dir, f"{i:06d}.jpg")
            Image.fromarray(raw.indexes[i]).save(p, quality=92)
            paths.append(p)
        # plain list of strings: scipy stores a space-padded [N] char matrix
        # — the layout the reference builder produces (make_coco.py:159-163)
        # and why its BaseDataset calls .strip() (dataset/base.py:55)
        scio.savemat(os.path.join(out_dir, "index.mat"), {"index": paths})
    else:
        np.save(os.path.join(out_dir, "index.npy"), raw.indexes)
    caption_cells = np.empty((1, n), dtype=object)
    for i in range(n):
        # plain '<U' char matrix per cell (NOT dtype=object): loadmat then
        # yields np.str_ elements, the layout the reference builders produce
        # (make_coco.py captionList) and its tokenizer consumes
        caption_cells[0, i] = np.asarray(raw.captions[i])
    scio.savemat(os.path.join(out_dir, "caption.mat"), {"caption": caption_cells})
    scio.savemat(os.path.join(out_dir, "label.mat"), {"category": raw.labels})
    return out_dir


def write_synthetic_twdh_assets(
    path: Optional[str] = None,
    n_class: int = 8,
    long_bits: int = 16,
    short_bits: int = 8,
    seed: int = 0,
) -> str:
    """Synthetic TwDH center/trans npz (one long length, one short length,
    ccmh.losses.twdh.load_twdh_assets layout) — the substrate for tests and
    the multichip dry run, which have no real center assets at tiny shapes.
    Stands in for the reference's train/TwDH/center/<dataset>/ pkl tree."""
    if path is None:
        import tempfile

        path = os.path.join(
            tempfile.gettempdir(),
            f"ccmh_twdh_{n_class}_{long_bits}_{short_bits}_{seed}.npz")
    if not os.path.exists(path):
        r = np.random.RandomState(seed)
        np.savez(path, **{
            f"long/{long_bits}":
                (r.randint(0, 2, (n_class, long_bits)) * 2 - 1).astype(np.float32),
            f"short/{short_bits}":
                (r.randint(0, 2, (n_class, short_bits)) * 2 - 1).astype(np.float32),
            f"trans/{long_bits}/{short_bits}":
                r.randn(2 * long_bits, long_bits).astype(np.float32),
        })
    return path
