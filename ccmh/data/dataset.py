"""Host-side dataset + fixed-shape batching for the TPU input pipeline.

Per-item semantics match the reference BaseDataset (dataset/base.py:35-100):

* train transform: bicubic resize (short side) + center crop; eval
  transform: bicubic resize to (R, R);
* CLIP pixel normalization (same constants, dataset/base.py:39);
* caption: uniform random choice among the item's captions, BPE tokenize,
  SOT + tokens + EOT, zero-pad to max_words;
* item -> (image NHWC float32, caption ids int32, label float32, index).

TPU-side differences: batches are produced as stacked numpy arrays by a
thread pool (replacing torch DataLoader worker processes,
train/base.py:87-107), with an async prefetch depth of 2 so host decode
overlaps device compute.  Images are NHWC (the patchify matmul's native
layout) instead of NCHW.
"""

from __future__ import annotations

import random
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from ccmh.data.split import RawData
from ccmh.tokenizer.bpe import default_tokenizer

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_pil(source):
    from PIL import Image

    if isinstance(source, np.ndarray) and source.ndim >= 2:
        return Image.fromarray(source).convert("RGB")
    path = source
    if isinstance(path, np.ndarray):
        path = str(path.item() if path.size == 1 else path[0])
    return Image.open(str(path).strip()).convert("RGB")


def _transform_u8(img, resolution: int, is_train: bool) -> np.ndarray:
    """Resize(+crop) only — the post-resize uint8 image PIL yields before
    ToTensor.  Both transforms are deterministic per item, which is what
    makes the decoded-tensor cache (data/cache.py) lossless."""
    from PIL import Image

    if is_train:
        w, h = img.size
        short = min(w, h)
        scale = resolution / short
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w, h = img.size
        left = (w - resolution) // 2
        top = (h - resolution) // 2
        img = img.crop((left, top, left + resolution, top + resolution))
    else:
        img = img.resize((resolution, resolution), Image.BICUBIC)
    return np.asarray(img, np.uint8)


def normalize_u8(arr: np.ndarray) -> np.ndarray:
    """uint8 -> CLIP-normalized float32 (host side; the on-device twin is
    clip/model.py normalize_pixels — identical op order for bit parity)."""
    return (arr.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


def _transform(img, resolution: int, is_train: bool) -> np.ndarray:
    return normalize_u8(_transform_u8(img, resolution, is_train))


def images_from_bytes(blobs, resolution: int, is_train: bool = False) -> np.ndarray:
    """Decode raw image byte strings -> [N, R, R, 3] CLIP-normalized float32.

    The serving ingestion path: JPEGs go through the native C++ batch loader
    (GIL-free, threaded) when it is available; anything the native loader
    rejects (PNG/WebP/corrupt-JPEG) falls back to PIL per item.  Raises
    ``ValueError`` naming the first undecodable item.
    """
    import io

    from ccmh.data import native

    blobs = list(blobs)
    n = len(blobs)
    if n == 0:
        return np.empty((0, resolution, resolution, 3), np.float32)
    if native.available():
        images, ok = native.decode_batch_mem(blobs, resolution, is_train)
    else:
        images = np.empty((n, resolution, resolution, 3), np.float32)
        ok = np.zeros(n, bool)
    for i in np.flatnonzero(~ok):
        from PIL import Image

        try:
            img = Image.open(io.BytesIO(blobs[i])).convert("RGB")
        except Exception as exc:
            raise ValueError(f"image {i} is not a decodable image: {exc}") from None
        images[i] = _transform(img, resolution, is_train)
    return images


class CrossModalDataset:
    """Indexable dataset over one split."""

    def __init__(
        self,
        raw: RawData,
        *,
        is_train: bool = True,
        max_words: int = 32,
        resolution: int = 224,
        seed: int = 0,
        with_mask: bool = False,
    ):
        self.raw = raw
        self.is_train = is_train
        self.max_words = max_words
        self.resolution = resolution
        self.with_mask = with_mask
        self.tokenizer = default_tokenizer()
        self.seed = seed
        self.epoch = 0          # bumped by BatchIterator.set_epoch

    def __len__(self) -> int:
        return len(self.raw.indexes)

    def all_labels(self) -> np.ndarray:
        return np.stack([np.asarray(l, np.float32).ravel() for l in self.raw.labels])

    def _caption(self, i: int) -> str:
        caps = self.raw.captions[i]
        if isinstance(caps, str):
            return caps
        caps = [c for c in np.ravel(np.asarray(caps, dtype=object))]
        if len(caps) > 1:
            # pure function of (seed, epoch, item) — the reference's unseeded
            # random.choice (dataset/base.py:66) varies per epoch but is not
            # replayable; this keeps per-epoch variety AND lets a resumed run
            # (or a rerun with the same seed) see the identical captions
            # regardless of worker-thread scheduling.
            mix = (int(self.seed) * 0x9E3779B1
                   + int(self.epoch) * 0x85EBCA77 + int(i)) & 0xFFFFFFFF
            choice = random.Random(mix).randrange(len(caps))
        else:
            choice = 0
        cap = caps[choice]
        if isinstance(cap, np.ndarray):
            cap = cap.item() if cap.size == 1 else str(cap)
        return str(cap)

    def image_path(self, i: int) -> Optional[str]:
        """Filesystem path of item i's image if it is a decodable-by-the-
        native-loader JPEG path; None for in-memory arrays / other formats."""
        src = self.raw.indexes[i]
        if isinstance(src, np.ndarray):
            if src.ndim >= 2:
                return None
            src = src.item() if src.size == 1 else src[0]
        if not isinstance(src, (str, bytes)):
            return None
        path = str(src).strip()
        return path if path.lower().endswith((".jpg", ".jpeg")) else None

    def load_image(self, i: int) -> np.ndarray:
        return _transform(
            _to_pil(self.raw.indexes[i]), self.resolution, self.is_train
        ).astype(np.float32)

    def load_image_u8(self, i: int) -> np.ndarray:
        """Post-resize uint8 image (pre-normalization) — the cache payload."""
        return _transform_u8(
            _to_pil(self.raw.indexes[i]), self.resolution, self.is_train)

    def meta_item(self, i: int) -> Dict[str, np.ndarray]:
        """Everything except the decoded image (used by the native batch
        loader path, which fills images separately)."""
        ids = np.asarray(
            self.tokenizer.encode_padded(self._caption(i), self.max_words), np.int32
        )
        label = np.asarray(self.raw.labels[i], np.float32).ravel()
        item = {"text": ids, "label": label, "index": np.int32(i)}
        if self.with_mask:
            item["key_padding_mask"] = ids == 0
        return item

    def meta_items(self, idxs) -> Dict[str, np.ndarray]:
        """Batched :meth:`meta_item`: one stacked dict for a whole batch.
        Captions tokenize through :func:`tokenize_batch` (the native C++
        BPE fast path — bit-identical ids, one GIL-free call) instead of
        per item."""
        from ccmh.tokenizer.bpe import tokenize_batch

        caps = [self._caption(int(i)) for i in idxs]
        ids = tokenize_batch(caps, self.max_words)
        labels = np.stack(
            [np.asarray(self.raw.labels[int(i)], np.float32).ravel() for i in idxs])
        batch = {"text": ids, "label": labels,
                 "index": np.asarray(idxs, np.int32)}
        if self.with_mask:
            batch["key_padding_mask"] = ids == 0
        return batch

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        item = self.meta_item(i)
        item["image"] = self.load_image(i)
        return item


class BatchIterator:
    """Threaded, prefetching batch producer.

    Yields dicts of stacked numpy arrays.  By default the final partial
    batch is padded by *wrapping* (repeating leading items) with a ``valid``
    mask so every batch has an identical shape — one XLA compilation per
    (method, batch size); eval code extraction honours ``valid`` when
    scattering codes.  With ``ragged_last=True`` the final batch is instead
    yielded at its true size (exact reference train semantics for
    batch-statistics losses, train/base.py:87-92) and XLA compiles one extra
    program at the remainder shape — the Trainer's single-chip default.
    """

    def __init__(
        self,
        dataset: CrossModalDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        drop_last: bool = False,
        image_cache=None,
        ragged_last: bool = False,
        with_images: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0
        self._start_step = 0    # one-shot batch skip (set_start_step)
        # ragged_last=True yields the final partial batch at its true size
        # instead of wrap-padding: exact reference semantics for batch-
        # statistics losses (the ragged torch batch, train/base.py:87-92) at
        # the cost of ONE extra XLA compile at the remainder shape.  The
        # trainer uses it on single-chip runs; mesh runs keep wrap-padding
        # (the remainder rarely divides the mesh).
        self.ragged_last = ragged_last
        # data/cache.py ImageCache: batches then carry post-resize uint8
        # images straight from the memmap (no decode, no host normalize —
        # normalization happens on-device, clip/model.py normalize_pixels)
        self.image_cache = image_cache
        # with_images=False skips image assembly entirely (meta + valid
        # only): the device-resident-epochs mode (data/resident.py) gathers
        # pixels on-device from the batch's indices, so hauling them off the
        # host memmap here would be pure waste.
        self.with_images = with_images

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle to an epoch index.  Each epoch's permutation is a
        pure function of (seed, epoch) — not iterator state — so a resumed
        run (trainer checkpoint/resume) replays the identical data order."""
        self._epoch = epoch
        self.dataset.epoch = epoch      # caption sampling follows the epoch

    def set_start_step(self, step: int) -> None:
        """Skip the first ``step`` batches of the NEXT iteration only —
        O(1) (the skipped batches are never assembled or decoded).  Because
        the epoch's permutation and caption draws are pure functions of
        (seed, epoch, item), batch ``step`` onward is bit-identical to the
        uninterrupted epoch's — the mid-epoch preemption resume path
        (Trainer.train)."""
        self._start_step = step

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _assemble(self, idx_batch: np.ndarray, n_valid: int, pool) -> Dict[str, np.ndarray]:
        if not self.with_images:
            batch = self.dataset.meta_items(idx_batch)
            valid = np.zeros(len(idx_batch), bool)
            valid[:n_valid] = True
            batch["valid"] = valid
            return batch
        if self.image_cache is not None:
            batch = self.dataset.meta_items(idx_batch)
            batch["image"] = self.image_cache.gather(idx_batch)
            valid = np.zeros(len(idx_batch), bool)
            valid[:n_valid] = True
            batch["valid"] = valid
            return batch
        images = self._native_images(idx_batch, pool)
        if images is not None:
            batch = self.dataset.meta_items(idx_batch)
            batch["image"] = images
        else:
            items = list(pool.map(self.dataset.__getitem__, idx_batch))
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        valid = np.zeros(len(idx_batch), bool)
        valid[:n_valid] = True
        batch["valid"] = valid
        return batch

    def _native_images(self, idx_batch: np.ndarray, pool) -> Optional[np.ndarray]:
        """Decode the batch's images with the C++ loader (GIL-free, one call
        per batch, kernel-thread parallel) when every source is a JPEG path;
        items the loader rejects fall back to PIL individually."""
        from ccmh.data import native

        paths = [self.dataset.image_path(int(i)) for i in idx_batch]
        if any(p is None for p in paths) or not native.available():
            return None
        images, ok = native.decode_batch(
            paths, self.dataset.resolution, self.dataset.is_train)
        if not ok.all():
            for j in np.nonzero(~ok)[0]:
                images[j] = self.dataset.load_image(int(idx_batch[j]))
        return images

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState((self.seed * 1_000_003 + self._epoch) % (2**32))
            order = rng.permutation(n)
            self._epoch += 1        # plain iteration still varies per epoch
        else:
            order = np.arange(n)
        starts = list(range(0, n, self.batch_size))
        if self.drop_last and n % self.batch_size:
            starts = starts[:-1]
        skip, self._start_step = getattr(self, "_start_step", 0), 0
        starts = starts[skip:]

        queue: Queue = Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer(pool):
            # any worker exception is forwarded to the consumer — a dead
            # producer must never leave the main thread blocked on the queue
            try:
                for s in starts:
                    chunk = order[s : s + self.batch_size]
                    n_valid = len(chunk)
                    if n_valid < self.batch_size and not self.ragged_last:
                        # wrap-pad to a full batch (fixed compile shape)
                        pad = order[: self.batch_size - n_valid]
                        chunk = np.concatenate([chunk, pad])
                    queue.put(self._assemble(chunk, n_valid, pool))
            except BaseException as e:  # noqa: BLE001
                queue.put(e)
            queue.put(sentinel)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            thread = threading.Thread(target=producer, args=(pool,), daemon=True)
            thread.start()
            while True:
                batch = queue.get()
                if batch is sentinel:
                    break
                if isinstance(batch, BaseException):
                    thread.join()
                    raise batch
                yield batch
            thread.join()
