"""Device-resident epochs: keep the decoded train split in HBM.

The reference streams every batch host->device each step behind a
DataLoader worker pool (train/base.py:87-92) — the right call for a GPU
box with GB/s of PCIe, the wrong one for a TPU host whose per-step put
competes with the step itself (measured on the bench host: a 37 MiB uint8
batch puts at ~11-27 MiB/s while the DSPH step finishes in 74 ms, so the
epoch runs at ~9% of the pure step rate even with double buffering).

The decoded uint8 cache for a reference-scale train split is small —
10k x 224 x 224 x 3 = 1.4 GiB — and a v5e chip has 16 GiB of HBM, so the
whole split can live on device: ``device_put`` the cache payload ONCE,
then each step gathers its batch on-device from the epoch permutation.
Per-step host traffic drops to the int32 ids / float32 labels (a few KiB);
the decode cache (data/cache.py) already guarantees the pixels are
bit-identical to the streaming path, and caption draws / shuffle order are
untouched (they remain pure functions of (seed, epoch, item)), so training
is bit-exact vs the streaming pipeline — only the transport changes.

Mesh scope: under a data-parallel mesh the pixel table pins ROW-SHARDED
over the data axis (``ResidentImages(..., sharding=NamedSharding(mesh,
P("data")))`` — per-chip residency is N/ndev rows) and
``make_resident_epoch_step(mesh=...)`` constrains the unpacked fields and
the gathered batch to the batch axis; GSPMD lowers the gather to [B]-index
collectives, never a table-sized all-gather (asserted in
tests/test_parallel.py).  Tensor-parallel / FSDP runs keep the streaming +
shard_batch path — their batch/state shardings don't compose with the
resident stepper.  Multi-host DP, where each process feeds its own chips
from its own host cache, composes naturally — each process pins its local
shard.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class FusedBatchPut:
    """All non-image batch fields in ONE device put.

    On the relay-attached bench host each ``device_put`` costs a full host
    round trip, so a resident-mode step that ships index/text/label/valid
    separately pays 4-5 RTTs per 74 ms step (measured: 41% of the pure
    step rate).  Byte-packing every host field into a single uint8 buffer
    makes it one RTT; a tiny jitted program bitcasts the slices back to
    their dtypes on device.  Bit-exact: a pure layout transform.
    """

    def __init__(self):
        self._unpack = {}   # spec -> jitted unpack fn

    @staticmethod
    def pack(batch):
        """Host side: (uint8 buffer, spec).  spec is hashable and keys the
        compiled unpack (one per distinct batch shape — the ragged final
        batch gets its own)."""
        items = sorted(batch.items())
        spec = tuple(
            (k, np.asarray(v).dtype.str, np.asarray(v).shape)
            for k, v in items)
        fused = np.concatenate([
            np.ascontiguousarray(v).view(np.uint8).ravel() for _, v in items])
        return fused, spec

    @staticmethod
    def build_unpack(spec):
        """Pure (traceable) uint8-buffer -> batch-dict function for ``spec``
        — call it INSIDE a larger jitted program (the resident train step)
        so unpack+gather+step are one device dispatch."""
        import jax
        import jax.numpy as jnp

        def unpack(buf):
            out = {}
            off = 0
            for name, dstr, shape in spec:
                dt = np.dtype(dstr)
                nbytes = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
                raw = jax.lax.slice(buf, (off,), (off + nbytes,))
                if dt.itemsize > 1:
                    raw = jax.lax.bitcast_convert_type(
                        raw.reshape(-1, dt.itemsize), dt)
                arr = raw.reshape(shape)
                if dt == np.bool_:
                    arr = arr.astype(jnp.bool_)
                out[name] = arr
                off += nbytes
            return out

        return unpack

    def _unpack_fn(self, spec):
        import jax

        fn = self._unpack.get(spec)
        if fn is None:
            fn = jax.jit(self.build_unpack(spec))
            self._unpack[spec] = fn
        return fn

    def __call__(self, batch):
        import jax

        fused, spec = self.pack(batch)
        return self._unpack_fn(spec)(jax.device_put(fused))


def make_resident_step(train_step, mesh=None, axis: str = "data"):
    """Wrap ``train_step`` so one device dispatch does unpack + resident
    image gather + the step (plus ONE host put for the fused buffer):

        state, metrics = stepper(state, buf_dev, spec, epoch, images)

    On a relay-attached host every put/dispatch costs a full RTT; folding
    the three resident-mode programs into the step turns
    ``4-5 RTTs + step`` into ``1 put + 1 dispatch`` per step (the
    difference between ~40% and step-bound epoch rates on the bench host).
    One program compiles per distinct batch spec (ragged tail = one more).

    With ``mesh`` (a 1-D data mesh): ``images`` is row-sharded over
    ``axis``, the unpacked fields and the gathered image batch are
    sharding-constrained to the batch axis, and ``train_step`` is the RAW
    (unwrapped) step — GSPMD inserts the gradient psum exactly as
    ``data_parallel_train_step`` does, plus the per-step cross-chip
    traffic of gathering one batch from the sharded table (verified: no
    table-sized all-gather in the lowered HLO, only the [B]-index gather
    collectives).
    """
    import jax
    import jax.numpy as jnp

    cache = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())

    def stepper(state, buf, spec, epoch, images):
        fn = cache.get(spec)
        if fn is None:
            unpack = FusedBatchPut.build_unpack(spec)

            def fused_step(state, buf, epoch, images):
                b = unpack(buf)
                if mesh is not None:
                    b = {k: jax.lax.with_sharding_constraint(v, data)
                         for k, v in b.items()}
                img = jnp.take(images, b["index"], axis=0)
                if mesh is not None:
                    img = jax.lax.with_sharding_constraint(img, data)
                b["image"] = img
                b["epoch"] = epoch
                return train_step(state, b)

            kw = {}
            if mesh is not None:
                kw["out_shardings"] = (repl, repl)
            fn = jax.jit(fused_step, donate_argnums=(0,), **kw)
            cache[spec] = fn
        return fn(state, buf, epoch, images)

    return stepper


def make_resident_epoch_step(train_step, mesh=None, axis: str = "data"):
    """Zero-puts-per-step resident stepping.

    ``make_resident_step`` still ships one small fused buffer per step —
    on a relay-attached host whose put latency swings from ~50 ms to >1 s
    that single put can dominate the 74 ms step.  This variant removes
    per-step host traffic entirely: the caller packs EVERY batch of the
    epoch into one [n_batches, L] uint8 table, puts it ONCE (~0.5 MB for
    a reference-scale epoch), and each step passes a device-side scalar
    row index (sliced from an ``iota`` table — a dispatch, never a put):

        table_dev = put(stack of fused buffers)        # 1 put / epoch
        idx_tab   = jnp.arange(n_batches)              # device iota
        stepper = make_resident_epoch_step(step)
        state, metrics = stepper(state, table_dev, spec, idx_tab[i],
                                 epoch, images)        # 0 puts / step

    The row index is a DEVICE scalar carried through the call — the
    program dynamic-slices row ``counter``, unpacks it, gathers the image
    batch from the resident table, runs the step and returns
    ``counter + 1`` — so the host never manufactures a per-step index
    either (a ``jnp.asarray(i)`` would itself be a put).  Ragged tail
    batches (a different spec) use their own 1-row table.  Same mesh
    semantics as make_resident_step.  Usage:

        counter = jnp.zeros((), jnp.int32)     # once per table
        for _ in range(n_rows):
            state, metrics, counter = stepper(
                state, table_dev, spec, counter, epoch, images)
    """
    import jax
    import jax.numpy as jnp

    cache = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())

    def stepper(state, table, spec, counter, epoch, images):
        key = (spec, table.shape)
        fn = cache.get(key)
        if fn is None:
            unpack = FusedBatchPut.build_unpack(spec)

            def fused_step(state, table, counter, epoch, images):
                buf = jax.lax.dynamic_slice(
                    table, (counter, 0), (1, table.shape[1]))[0]
                b = unpack(buf)
                if mesh is not None:
                    b = {k: jax.lax.with_sharding_constraint(v, data)
                         for k, v in b.items()}
                img = jnp.take(images, b["index"], axis=0)
                if mesh is not None:
                    img = jax.lax.with_sharding_constraint(img, data)
                b["image"] = img
                b["epoch"] = epoch
                new_state, metrics = train_step(state, b)
                return new_state, metrics, counter + 1

            kw = {}
            if mesh is not None:
                kw["out_shardings"] = (repl, repl, repl)
            fn = jax.jit(fused_step, donate_argnums=(0,), **kw)
            cache[key] = fn
        return fn(state, table, counter, epoch, images)

    return stepper


def augment_chunked_batches(batches, n_resident: int, block_rows: int):
    """Annotate an epoch's (image-free) meta batches for HYBRID residency.

    Rows ``< n_resident`` live in the pinned region; every other row
    streams once per epoch inside fixed-size superblock pixel buffers of
    ``block_rows`` rows.  Batches are assigned to superblocks greedily in
    epoch order (a superblock closes when the next batch's streamed rows
    would overflow its buffer), preserving the exact batch composition —
    bit-exact vs full streaming/residency by construction.

    Adds three per-row fields to each batch (they ride the fused epoch
    table like every other host field):

    * ``is_res``  bool  — row comes from the pinned region
    * ``res_idx`` int32 — row index into the pinned region (0 if streamed)
    * ``sb_pos``  int32 — row position in ITS superblock's buffer (0 if
      resident)

    Returns ``(augmented_batches, superblocks, sb_of_batch)`` where
    ``superblocks[g]`` is the int32 array of dataset rows superblock ``g``
    streams (in buffer order) and ``sb_of_batch[i]`` names batch i's
    superblock.
    """
    superblocks, sb_of_batch = [], []
    cur: list = []
    augmented = []
    for b in batches:
        idx = np.asarray(b["index"], np.int64)
        is_res = idx < n_resident
        streamed = idx[~is_res]
        if len(streamed) > block_rows:
            raise ValueError(
                f"block_rows={block_rows} cannot hold one batch's "
                f"{len(streamed)} streamed rows")
        if len(cur) + len(streamed) > block_rows and cur:
            superblocks.append(np.asarray(cur, np.int32))
            cur = []
        sb_pos = np.zeros(len(idx), np.int32)
        sb_pos[~is_res] = len(cur) + np.arange(len(streamed), dtype=np.int32)
        cur.extend(int(i) for i in streamed)
        b = dict(b)
        b["is_res"] = is_res
        b["res_idx"] = np.where(is_res, idx, 0).astype(np.int32)
        b["sb_pos"] = sb_pos
        augmented.append(b)
        sb_of_batch.append(len(superblocks))
    superblocks.append(np.asarray(cur, np.int32))   # last (possibly empty)
    return augmented, superblocks, sb_of_batch


def make_chunked_epoch_step(train_step, mesh=None, axis: str = "data"):
    """Zero-puts-per-step stepping for HYBRID residency.

    Same contract as :func:`make_resident_epoch_step` plus a per-superblock
    pixel buffer argument: the fused program slices its meta row, unpacks,
    builds the image batch by selecting per row between the pinned region
    (``jnp.take(res_images, res_idx)``) and the superblock buffer
    (``jnp.take(sb_buf, sb_pos)``), and runs the step.  Host traffic is one
    buffer put per superblock — amortized over its many steps and
    double-buffered by the caller — instead of per step.

        state, metrics, counter = stepper(state, table, spec, counter,
                                          epoch, res_images, sb_buf)
    """
    import jax
    import jax.numpy as jnp

    cache = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())

    def stepper(state, table, spec, counter, epoch, res_images, sb_buf):
        key = (spec, table.shape, sb_buf.shape)
        fn = cache.get(key)
        if fn is None:
            unpack = FusedBatchPut.build_unpack(spec)

            def fused_step(state, table, counter, epoch, res_images, sb_buf):
                buf = jax.lax.dynamic_slice(
                    table, (counter, 0), (1, table.shape[1]))[0]
                b = unpack(buf)
                if mesh is not None:
                    b = {k: jax.lax.with_sharding_constraint(v, data)
                         for k, v in b.items()}
                is_res = b.pop("is_res")
                res_idx = b.pop("res_idx")
                sb_pos = b.pop("sb_pos")
                img = jnp.where(
                    is_res[:, None, None, None],
                    jnp.take(res_images, res_idx, axis=0),
                    jnp.take(sb_buf, sb_pos, axis=0))
                if mesh is not None:
                    img = jax.lax.with_sharding_constraint(img, data)
                b["image"] = img
                b["epoch"] = epoch
                new_state, metrics = train_step(state, b)
                return new_state, metrics, counter + 1

            kw = {}
            if mesh is not None:
                kw["out_shardings"] = (repl, repl, repl)
            fn = jax.jit(fused_step, donate_argnums=(0,), **kw)
            cache[key] = fn
        return fn(state, table, counter, epoch, res_images, sb_buf)

    return stepper


class AsyncBlockPut:
    """Background-thread device_put of superblock pixel buffers.

    The put of superblock g+1 is issued while superblock g's steps compute,
    so an epoch's streamed-pixel transfer overlaps device time instead of
    serializing with it (on the bench host's relay, puts are the bound —
    overlap is the whole point of superblocking).
    """

    def __init__(self, sharding=None):
        self._sharding = sharding
        self._pending = {}

    def start(self, key, buf_np):
        import threading

        import jax

        if key in self._pending:
            return
        slot = {}

        def work():
            try:
                arr = (jax.device_put(buf_np, self._sharding)
                       if self._sharding is not None
                       else jax.device_put(buf_np))
                arr.block_until_ready()
                slot["arr"] = arr
            except Exception as e:  # noqa: BLE001 - re-raised at get()
                slot["err"] = e

        th = threading.Thread(target=work, daemon=True)
        th.start()
        self._pending[key] = (th, slot)

    def get(self, key):
        th, slot = self._pending.pop(key)
        th.join()
        if "err" in slot:
            raise slot["err"]
        return slot["arr"]


class ResidentEvalSplit:
    """An EVAL split pinned whole to device memory + a one-dispatch encoder.

    ``Trainer.get_code`` (the ``valid()``/``test()`` encode loop, reference
    train/base.py:130-148) streams every query/retrieval pixel batch
    host->device each validation epoch — at reference scale ~2.6 GiB
    (flickr) to ~17 GiB (COCO) per epoch over a link measured at
    11-27 MiB/s on the bench host: the same put-bound disease device-
    resident epochs cured for training (VERDICT r4 #1).

    Eval batches are EPOCH-INVARIANT: the eval loaders never advance the
    dataset epoch, so caption draws — and therefore the token ids — are
    fixed, the iteration order is sequential, and the pixels come from the
    decoded-tensor cache.  So the ENTIRE split input (pixels uint8 +
    tokens int32) can pin once; every later validation encodes it with a
    single jitted ``lax.scan`` program (``make_resident_eval_encoder``)
    whose per-batch body gathers rows on-device: ZERO host->device
    transfers per validation epoch, and codes stay on device to feed the
    on-device mAP (ops/map_metric.py) directly.

    Under a DP mesh both tables pin row-sharded over ``sharding`` (tables
    are padded to a device-count row multiple; gathers never read padding).
    """

    def __init__(self, cache, dataset, batch_size: int, *, sharding=None):
        import jax

        n = len(dataset)
        if len(cache.images) != n:
            raise ValueError(
                f"cache holds {len(cache.images)} items but split has {n}")
        self.n = n
        self.batch = int(batch_size)
        self.n_batches = -(-n // self.batch)
        n_pad = self.n_batches * self.batch
        # tokenize the whole split once (the streaming path pays this every
        # valid epoch; draws are epoch-invariant so once is enough forever)
        meta = dataset.meta_items(np.arange(n))
        tokens = np.ascontiguousarray(meta["text"], np.int32)
        images = np.ascontiguousarray(cache.images)
        if sharding is not None:
            ndev = sharding.mesh.devices.size
            n_pad += (-n_pad) % ndev   # rows beyond n_batches*B never gather
        if n_pad > n:
            images = np.concatenate([
                images, np.zeros((n_pad - n,) + images.shape[1:], np.uint8)])
            tokens = np.concatenate([
                tokens, np.zeros((n_pad - n, tokens.shape[1]), np.int32)])
        self.nbytes = int(images.nbytes + tokens.nbytes)
        self.images = jax.device_put(images, sharding)
        self.tokens = jax.device_put(tokens, sharding)
        self.images.block_until_ready()

    @staticmethod
    def plan_bytes(cache, dataset, batch_size: int) -> int:
        """Device bytes a pin would take (without pinning) — the budget
        check the Trainer runs before committing HBM."""
        n = len(cache.images)
        n_pad = -(-n // int(batch_size)) * int(batch_size)
        per_row = int(np.prod(cache.images.shape[1:]))
        max_words = getattr(dataset, "max_words", 32)
        return n_pad * (per_row + 4 * max_words)


def make_resident_eval_encoder(encode_fn, split: "ResidentEvalSplit", *,
                               needs_mask: bool = False, mesh=None,
                               axis: str = "data"):
    """One jitted program encoding the WHOLE pinned split.

    ``encode_fn(params, aux, batch) -> pytree of [B, K] code arrays`` is the
    RAW (unjitted) per-batch encode — the plain (img, txt) pair or TwDH's
    multi-length dict; the scan handles any pytree.  The returned callable
    ``encode(params, aux) -> pytree of [n, K] int8 device arrays`` is a
    single device dispatch: the scan body gathers batch rows from the
    resident tables (``jnp.take`` — under a mesh this lowers to [B]-index
    collectives against the row-sharded table, like the resident train
    step), derives ``valid``/``key_padding_mask`` on device, and stacks the
    signed codes.  Wrap-pad parity: the streaming eval loader wrap-pads its
    final batch and masks batch-statistics encodes by ``valid``
    (trainer._put_eval); here padded rows are zeros with valid=False — the
    masked statistics are identical, and padded rows' codes are sliced off.
    """
    import jax
    import jax.numpy as jnp

    n, B, nb = split.n, split.batch, split.n_batches
    constrain = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        if B % mesh.devices.size == 0:
            data = NamedSharding(mesh, P(axis))

            def constrain(t):  # noqa: E731 - closure over data sharding
                return jax.lax.with_sharding_constraint(t, data)

    def encode_all(params, aux, images, tokens):
        def body(carry, i):
            idx = i * B + jnp.arange(B, dtype=jnp.int32)
            b = {
                "image": jnp.take(images, idx, axis=0),
                "text": jnp.take(tokens, idx, axis=0),
                "index": idx,
                "valid": idx < n,
            }
            if needs_mask:
                b["key_padding_mask"] = b["text"] == 0
            if constrain is not None:
                b = {k: constrain(v) for k, v in b.items()}
            out = encode_fn(params, aux, b)
            return carry, jax.tree.map(lambda t: t.astype(jnp.int8), out)

        _, ys = jax.lax.scan(body, 0, jnp.arange(nb, dtype=jnp.int32))
        return jax.tree.map(
            lambda t: t.reshape((nb * B,) + t.shape[2:])[:n], ys)

    kw = {"out_shardings": repl} if mesh is not None else {}
    jitted = jax.jit(encode_all, **kw)
    return lambda params, aux: jitted(params, aux, split.images, split.tokens)


def pack_epoch(batches):
    """[(table [n, L] uint8, spec, rows)] groups for a list of host batches.

    Consecutive batches sharing a spec stack into one table (the common
    case: every full batch); a ragged tail forms its own group.  Returns
    groups in epoch order as (table, spec, n_rows) tuples.
    """
    groups = []
    cur_spec, cur_bufs = None, []
    for b in batches:
        buf, spec = FusedBatchPut.pack(b)
        if spec != cur_spec and cur_bufs:
            groups.append((np.stack(cur_bufs), cur_spec, len(cur_bufs)))
            cur_bufs = []
        cur_spec = spec
        cur_bufs.append(buf)
    if cur_bufs:
        groups.append((np.stack(cur_bufs), cur_spec, len(cur_bufs)))
    return groups


class ResidentImages:
    """The decoded uint8 images of one split, resident in device memory.

    ``gather(idx)`` returns the ``[B, R, R, 3]`` uint8 batch as a device
    array produced by an on-device take — no host image traffic.  ``idx``
    may be a host numpy array (a few hundred int32s) or already on device.
    """

    def __init__(self, images_u8: np.ndarray, device=None, sharding=None):
        """``sharding``: optional ``NamedSharding(mesh, P(axis))`` — the
        table is zero-padded to a device-count-row multiple and pinned
        row-sharded (per-chip residency = N/ndev rows); gathers never read
        the padding (dataset indices are < N)."""
        import jax
        import jax.numpy as jnp

        if images_u8.dtype != np.uint8 or images_u8.ndim != 4:
            raise ValueError(
                f"expected uint8 [N,R,R,3] images, got "
                f"{images_u8.dtype} {images_u8.shape}")
        self.n = len(images_u8)
        self.nbytes = int(images_u8.nbytes)
        arr = np.ascontiguousarray(images_u8)
        if sharding is not None:
            ndev = sharding.mesh.devices.size
            pad = (-len(arr)) % ndev
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            device = sharding
        # one put for the whole split (memmap-backed caches stream from
        # disk here exactly once)
        self.images = jax.device_put(arr, device)
        self.images.block_until_ready()
        self._take = jax.jit(lambda data, idx: jnp.take(data, idx, axis=0))

    def gather(self, idx) -> "jax.Array":  # noqa: F821
        import jax.numpy as jnp

        return self._take(self.images, jnp.asarray(idx))

    # ------------------------------------------------------------- factory
    @classmethod
    def plan(
        cls,
        cache,
        *,
        budget_mb: float,
        mode: str = "auto",
        ndev: int = 1,
        unsupported_transport: bool = False,
        logger=None,
    ) -> bool:
        """Decide (without pinning) whether ``cache`` should go resident.

        mode "off" -> never; "on" -> required (raises if over the per-chip
        budget or if the transport can't support it); "auto" -> pin when
        the PER-CHIP share (``nbytes / ndev`` — a DP mesh row-shards the
        table) fits ``budget_mb``.  ``unsupported_transport``: tensor-
        parallel / FSDP runs, whose batch/state shardings the resident
        stepper does not compose with — those stream + shard_batch.
        """
        if mode == "off" or cache is None:
            return False
        per_chip = int(cache.images.nbytes) / max(ndev, 1)
        fits = per_chip <= budget_mb * 2**20
        if mode == "on":
            if unsupported_transport:
                raise ValueError(
                    "device_resident_images=on does not compose with "
                    "tensor-parallel/FSDP sharding; those runs stream")
            if not fits:
                raise ValueError(
                    f"device_resident_images=on but split needs "
                    f"{per_chip / 2**20:.0f} MiB/chip > budget "
                    f"{budget_mb:.0f} MiB")
            return True
        if unsupported_transport or not fits:
            if logger is not None:
                why = ("tp/fsdp transport" if unsupported_transport else
                       f"{per_chip / 2**20:.0f} MiB/chip > "
                       f"{budget_mb:.0f} MiB")
                logger.info(f"device-resident images: streaming ({why})")
            return False
        return True

    @classmethod
    def maybe(
        cls,
        cache,
        *,
        budget_mb: float,
        mode: str = "auto",
        logger=None,
        mesh_transport: bool = False,
        sharding=None,
    ) -> Optional["ResidentImages"]:
        """plan() + pin in one call.  ``mesh_transport`` keeps its round-4
        meaning: an UNSUPPORTED (tp/fsdp) transport.  ``sharding``
        row-shards the pinned table over a DP mesh."""
        ndev = sharding.mesh.devices.size if sharding is not None else 1
        if not cls.plan(cache, budget_mb=budget_mb, mode=mode, ndev=ndev,
                        unsupported_transport=mesh_transport, logger=logger):
            return None
        resident = cls(cache.images, sharding=sharding)
        if logger is not None:
            logger.info(
                f"device-resident images: pinned {resident.n} items "
                f"({resident.nbytes / 2**20:.0f} MiB"
                + (f", row-sharded over {ndev} devices" if ndev > 1 else "")
                + ") to device HBM — per-step host traffic is now "
                "ids/labels only")
        return resident
