"""Top-k retrieval: the serving layer the reference never built.

The reference stops at offline evaluation — mAP over the full gallery
(train/base.py:242-275, utils/calc_utils.py:16-39) and ``.mat`` dumps of
codes for PR curves (train/base.py:328-349).  There is no entry point a
deployed user could call with a query.  This module completes the eval
stack into a serving path:

* :func:`topk_search` / :func:`topk_search_sharded` — jitted chunked
  top-k Hamming ranking with **deterministic tie-breaking** (equal
  distance -> lower gallery index wins, the same stable order as the
  exact-eval sort), single device or gallery-sharded over a 1-D mesh
  (per-shard top-k, on-device merge: each chip ranks only N/ndev items
  and only k candidates per chip cross the ICI).
* :class:`HashIndex` — a gallery of binary codes held on device in the
  int8 MXU form (one int8 matmul per query chunk — the measured
  speed-of-light ranking path) or the packed uint32 form (8x smaller HBM
  residency), plus optional labels for precision@k.  Exact top-100 over
  a 1M-item gallery measured 187 ms / 512 queries (~2.7k queries/s) on
  one v5e via the recursive blocked selection + cached executables.
* :class:`Retriever` — composes a trained method (params/aux) with the
  BPE tokenizer into text->image / image->text search.  Single-tower
  encoders come for free from XLA dead-code elimination: the jitted
  wrapper returns only one modality's codes, so the other tower is
  removed from the compiled program entirely (asserted by
  tests/test_retrieval.py via compiler cost analysis) — no per-method
  "image-only encode" variants needed.

``python -m ccmh.retrieval <PR_cruve .mat>`` demos search over a saved
code dump (no model needed).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccmh.ops.hamming import (
    hamming_distance,
    hamming_distance_packed,
    hamming_distance_packed_xla,
)
from ccmh.ops.packing import pack_codes


def _packed_dist(q: jax.Array, r: jax.Array) -> jax.Array:
    """Packed Hamming with backend dispatch: the Pallas XOR+popcount kernel
    needs TPU and block-divisible shapes (256 | Q, 1024 | N); anything else
    takes the pure-XLA formulation (bit-identical results)."""
    if (jax.default_backend() == "tpu"
            and q.shape[0] % 256 == 0 and r.shape[0] % 1024 == 0):
        return hamming_distance_packed(q, r)
    return hamming_distance_packed_xla(q, r)

# combined sort key = (distance << idx_bits) | gallery_index, minimized.
# distance needs ceil(log2(max_dist+1)) bits; both must fit an int32.
_KEY_BITS = 31
_SENTINEL = jnp.int32(2**_KEY_BITS - 1)
# recursive blocked-selection width (v5e sweep: 256≈512 « 1024 « full;
# full-width lax.top_k at [512, 1M] measured 1.22 s vs 0.12 s blocked)
_TOPK_BLOCK = 512


def _blocked_smallest_k(key: jax.Array, k: int) -> jax.Array:
    """Exact k smallest int32 keys per row via recursive blocked top_k.

    XLA's full-width ``lax.top_k`` degrades badly on long rows (1.22 s at
    [512, 1M] on v5e).  The global k best must lie among each block's k
    best, so keep every 512-block's top k and recurse — each round shrinks
    the row ~5x and the selection network only ever runs at block width.
    Measured 0.12 s for the same shape (~10x), converging in ~4 rounds.
    Rows shorter than max(4k, block) take one plain top_k.
    """
    q = key.shape[0]
    if key.shape[1] < k:
        # rows narrower than k (sharded search with k > per-shard rows):
        # sentinel-pad — sentinels re-pack to themselves in _merge_topk and
        # rank strictly last, so they never reach a final top-k (k <= the
        # total REAL row count is the callers' invariant)
        key = jnp.pad(key, ((0, 0), (0, k - key.shape[1])),
                      constant_values=_SENTINEL)
    block = _TOPK_BLOCK
    while block < 2 * k:
        block *= 2  # keep >= 2x row shrink per round (k >= block/2 would
        #             otherwise shrink sublinearly — or not at all at k=block)
    while key.shape[1] > max(4 * k, block):
        m = key.shape[1]
        nb = -(-m // block)
        padded = jnp.pad(key, ((0, 0), (0, nb * block - m)),
                         constant_values=_SENTINEL)
        t, _ = jax.lax.top_k(-padded.reshape(q, nb, block), k)
        key = (-t).reshape(q, -1)
    t, _ = jax.lax.top_k(-key, k)
    return -t


def _idx_bits(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(2, n)))))


def _check_key_fits(n: int, max_dist: int) -> Tuple[int, int]:
    ib = _idx_bits(n)
    db = max(1, int(np.ceil(np.log2(max_dist + 2))))
    if ib + db > _KEY_BITS:
        raise ValueError(
            f"gallery of {n} items with max distance {max_dist} overflows the "
            f"int32 tie-break key ({ib}+{db} > {_KEY_BITS} bits); shard the "
            "gallery or reduce max_dist")
    return ib, db


def _chunk_topk(dist: jax.Array, k: int, idx_bits: int, idx_offset,
                n_valid) -> Tuple[jax.Array, jax.Array]:
    """[C, N_local] int32 distances -> (dist [C, k], global idx [C, k]).

    Stable: ties broken by ascending gallery index (the reference's
    ``torch.sort`` on CPU is stable — utils/calc_utils.py:31 — so equal
    distances rank by position; the packed key reproduces that order
    exactly).  Rows at global index >= n_valid (shard padding) get the
    maximum key so they rank strictly last.
    """
    n_local = dist.shape[1]
    gidx = jnp.arange(n_local, dtype=jnp.int32) + idx_offset
    key = (dist.astype(jnp.int32) << idx_bits) | gidx[None, :]
    key = jnp.where(gidx[None, :] < n_valid, key, _SENTINEL)
    top = _blocked_smallest_k(key, k)
    return top >> idx_bits, top & ((1 << idx_bits) - 1)


def _merge_topk(dist: jax.Array, idx: jax.Array, k: int,
                idx_bits: int) -> Tuple[jax.Array, jax.Array]:
    """Merge candidate sets [C, m] (m >= k) back into the global order."""
    key = (dist.astype(jnp.int32) << idx_bits) | idx
    neg_top, _ = jax.lax.top_k(-key, k)
    top = -neg_top
    return top >> idx_bits, top & ((1 << idx_bits) - 1)


@functools.lru_cache(maxsize=256)
def _search_fn(dist_fn, k: int, idx_bits: int):
    """Compiled single-device search, cached on its static parameters.

    A per-call ``@jax.jit`` closure would be a fresh cache entry every
    search (measured: recompilation dominated serving latency); an index
    reuses one executable for its whole lifetime.  The valid-row count is
    a RUNTIME argument (not baked in), so a growing index
    (HashIndex.add) keeps its executable across appends.
    """

    @jax.jit
    def run(qc, g, n_valid):
        d = dist_fn(qc, g)
        return _chunk_topk(d, k, idx_bits, jnp.int32(0), n_valid)

    return run


@functools.lru_cache(maxsize=256)
def _sharded_search_fn(mesh, axis: str, dist_fn, k: int, idx_bits: int,
                       per: int, n: int):
    """Compiled gallery-sharded search (see _search_fn for why cached)."""
    from jax.sharding import PartitionSpec as P

    def shard_body(qc, g_local):
        # g_local: [per, K]; global offset of this shard from its position
        shard = jax.lax.axis_index(axis) * per
        d = dist_fn(qc, g_local)
        ld, li = _chunk_topk(d, k, idx_bits, shard, jnp.int32(n))
        # gather the per-shard candidates; merge identically on every chip
        ad = jax.lax.all_gather(ld, axis, axis=1, tiled=True)   # [C, ndev*k]
        ai = jax.lax.all_gather(li, axis, axis=1, tiled=True)
        return _merge_topk(ad, ai, k, idx_bits)

    return jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        # the all_gather makes every chip's merge identical, but the VMA
        # checker can't infer post-collective replication — disable it
        check_vma=False,
    ))


def _pad_rows(a, n: int):
    """Zero-pad rows; device arrays pad on device (no host round trip)."""
    if a.shape[0] == n:
        return a
    if isinstance(a, jax.Array):
        return jnp.concatenate(
            [a, jnp.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)], axis=0)
    return np.concatenate(
        [a, np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)], axis=0)


def topk_search(
    queries,
    gallery,
    k: int,
    *,
    dist_fn: Optional[Callable] = None,
    max_dist: Optional[int] = None,
    chunk: int = 1024,
    valid_n: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rank ``gallery`` for each query; return the k best.

    queries [Q, K] ±1, gallery [N, K] ±1 (or packed uint32 when both are
    packed and ``dist_fn`` is None — detected by dtype).  ``gallery`` may
    be a committed device array (HashIndex keeps it resident; the
    device_put below is then a no-op — serving never re-transfers the
    gallery).  ``dist_fn`` overrides plain Hamming (DPSIH's multi-embed
    ranking, train/DPSIH/_utils.py:16-26); it must return int32 distances
    bounded by ``max_dist``.  ``valid_n``: true row count when the gallery
    carries padding rows (they rank strictly last and are never returned).
    Returns (distances [Q, k] int32, indices [Q, k]).
    """
    queries = np.asarray(queries)
    n = valid_n if valid_n is not None else gallery.shape[0]
    k = min(k, n)
    if queries.shape[0] == 0:
        return (np.zeros((0, k), np.int32), np.zeros((0, k), np.int32))
    packed = np.dtype(gallery.dtype) == np.uint32
    if dist_fn is None:
        if packed:
            dist_fn, md = _packed_dist, 32 * queries.shape[1]
        else:
            dist_fn, md = hamming_distance, queries.shape[1]
        max_dist = md if max_dist is None else max_dist
    elif max_dist is None:
        raise ValueError("custom dist_fn requires max_dist")
    if packed:  # pad the gallery to the Pallas block multiple; the key
        gallery = _pad_rows(gallery, -(-gallery.shape[0] // 1024) * 1024)
    # idx_bits covers the full CAPACITY (incl. pad rows), so a grown index
    # (HashIndex.add) only changes executables when capacity doubles
    idx_bits, _ = _check_key_fits(gallery.shape[0], max_dist)

    run = _search_fn(dist_fn, k, idx_bits)
    g_dev = jax.device_put(gallery)
    n_dev = jnp.int32(n)
    out_d, out_i = [], []
    chunk = min(chunk, max(1, queries.shape[0]))
    if packed:
        chunk = -(-chunk // 256) * 256  # Pallas query-block multiple
    for s in range(0, queries.shape[0], chunk):
        qc = queries[s:s + chunk]
        d, i = run(jax.device_put(_pad_rows(qc, chunk)), g_dev, n_dev)
        out_d.append(np.asarray(d[:qc.shape[0]]))
        out_i.append(np.asarray(i[:qc.shape[0]]))
    return np.concatenate(out_d), np.concatenate(out_i)


def topk_search_sharded(
    queries,
    gallery,
    k: int,
    mesh,
    *,
    axis: str = "data",
    chunk: int = 1024,
    valid_n: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Gallery-sharded top-k: each chip ranks its N/ndev shard, then the
    per-shard winners (k per chip, carrying global indices) are merged
    on device.  Only [ndev, C, k] candidates cross the ICI per chunk —
    the distance matrix is never gathered.  Queries are replicated.

    Mirrors the sharded-eval layout (ops/map_metric.py ``shard_gallery``);
    padding rows rank strictly last via the key sentinel.  ``gallery`` may
    be an already-sharded committed device array (HashIndex's resident
    form — the sharded device_put is then a no-op).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    queries = np.asarray(queries)
    n = valid_n if valid_n is not None else gallery.shape[0]
    k = min(k, n)
    if queries.shape[0] == 0:
        return (np.zeros((0, k), np.int32), np.zeros((0, k), np.int32))
    if np.dtype(gallery.dtype) == np.uint32:
        dfn, max_dist = _packed_dist, 32 * queries.shape[1]
    else:
        dfn, max_dist = hamming_distance, queries.shape[1]
    idx_bits, _ = _check_key_fits(n, max_dist)

    ndev = mesh.devices.size
    per = -(-gallery.shape[0] // ndev)
    g_pad = _pad_rows(gallery, per * ndev)

    mapped = _sharded_search_fn(mesh, axis, dfn, k, idx_bits, per, n)
    g_dev = jax.device_put(g_pad, NamedSharding(mesh, P(axis)))
    repl = NamedSharding(mesh, P())
    out_d, out_i = [], []
    chunk = min(chunk, max(1, queries.shape[0]))
    for s in range(0, queries.shape[0], chunk):
        qc = queries[s:s + chunk]
        d, i = mapped(jax.device_put(_pad_rows(qc, chunk), repl), g_dev)
        out_d.append(np.asarray(d[:qc.shape[0]]))
        out_i.append(np.asarray(i[:qc.shape[0]]))
    return np.concatenate(out_d), np.concatenate(out_i)


class HashIndex:
    """A searchable gallery of binary codes.

    codes: [N, K] ±1 (any float/int dtype).  ``packed=True`` stores the
    uint32-packed form (8x smaller residency; XOR+popcount kernel);
    default keeps int8 for the MXU matmul path.  ``labels`` ([N, C]
    multi-hot) enables :meth:`precision_at_k`.  ``mesh`` shards the
    gallery axis; ``dist_fn`` (+ ``max_dist``) replaces Hamming ranking
    (DPSIH multi-embed; single-device only).
    """

    def __init__(self, codes, labels=None, *, packed: bool = False,
                 mesh=None, dist_fn: Optional[Callable] = None,
                 max_dist: Optional[int] = None, chunk: int = 1024):
        codes = np.asarray(codes)
        if codes.ndim != 2 or codes.shape[1] == 0:
            # a zero-bit index would accept the build, then reject every
            # real-width add()/search() forever (serve's /v1/add bootstrap
            # must 400 on [[], []], not create a poisoned index)
            raise ValueError(f"codes must be [N, K>=1], got {codes.shape}")
        if dist_fn is not None and mesh is not None:
            raise ValueError("custom dist_fn search is single-device")
        self.n, self.k_bits = codes.shape
        self.labels = None if labels is None else np.asarray(labels)
        if self.labels is not None and self.labels.shape[0] != self.n:
            raise ValueError("labels/codes row mismatch")
        self.packed = packed
        self.mesh = mesh
        self.dist_fn = dist_fn
        self.max_dist = max_dist
        self.chunk = chunk
        if packed:
            if dist_fn is not None:
                raise ValueError("packed storage implies Hamming ranking")
            prepared = np.asarray(pack_codes(jnp.asarray(codes)))
        else:
            prepared = np.where(codes > 0, 1, -1).astype(np.int8)
        self._place(prepared)

    def _place(self, prepared: np.ndarray) -> None:
        """Commit the prepared (int8 ±1 / packed uint32) gallery to device:
        it lives ON DEVICE for the index's lifetime — searches pass the
        committed array into topk_search*, whose device_put is then a
        no-op, so a query never pays the gallery transfer again."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            per = -(-self.n // self.mesh.devices.size)
            self._codes = jax.device_put(
                _pad_rows(prepared, per * self.mesh.devices.size),
                NamedSharding(self.mesh, P("data")))
        else:
            if self.packed:  # pre-pad to the Pallas gallery block once
                prepared = _pad_rows(prepared, -(-self.n // 1024) * 1024)
            self._codes = jax.device_put(prepared)

    def __len__(self) -> int:
        return self.n

    def add(self, codes, labels=None) -> None:
        """Append gallery items WITHOUT rebuilding (streaming ingestion —
        production galleries grow; the reference has no serving at all).

        Rows land in the device-resident gallery's spare capacity via an
        on-device dynamic_update_slice; when full, capacity doubles (in
        1024-row blocks) with one device-side concatenate — the existing
        gallery is never re-transferred from the host.  Rows past ``n``
        rank strictly last through the search key sentinel, so a search
        after ``add`` is exactly a search over the concatenated gallery
        (same stable tie order: appended items get higher indices).
        Mesh-sharded galleries would need a full reshard — rebuild instead.
        """
        if self.mesh is not None:
            raise NotImplementedError(
                "add() on a mesh-sharded index needs a full gallery "
                "reshard; rebuild the HashIndex instead")
        codes = np.asarray(codes)
        if codes.ndim != 2 or codes.shape[1] != self.k_bits:
            raise ValueError(f"codes must be [M, {self.k_bits}], got {codes.shape}")
        if (labels is None) != (self.labels is None):
            raise ValueError("add() labels must match how the index was built")
        if self.packed:
            rows = np.asarray(pack_codes(jnp.asarray(codes)))
        else:
            rows = np.where(codes > 0, 1, -1).astype(np.int8)
        m = rows.shape[0]
        capacity = self._codes.shape[0]
        if self.n + m > capacity:
            new_cap = max(2 * capacity, -(-(self.n + m) // 1024) * 1024)
            self._codes = jnp.concatenate([
                self._codes,
                jnp.zeros((new_cap - capacity,) + self._codes.shape[1:],
                          self._codes.dtype)])
        self._codes = jax.lax.dynamic_update_slice(
            self._codes, jnp.asarray(rows), (jnp.int32(self.n), jnp.int32(0)))
        self._codes.block_until_ready()   # rows visible before n advances
        if labels is not None:
            labels = np.asarray(labels)
            if labels.shape[0] != m:
                raise ValueError("labels/codes row mismatch")
            self.labels = np.concatenate([self.labels, labels])
        self.n += m

    @classmethod
    def from_mat(cls, path: str, field: str = "r_img",
                 label_field: str = "r_l", **kw) -> "HashIndex":
        """Build from a reference-interoperable PR_cruve ``.mat`` dump
        (train/base.py:328-349 layout: q_img/q_txt/r_img/r_txt/q_l/r_l)."""
        import scipy.io as scio

        mat = scio.loadmat(path)
        labels = mat.get(label_field) if label_field else None
        return cls(mat[field], labels=labels, **kw)

    def save(self, path: str) -> None:
        """Persist the index (npz: prepared codes + labels) so a serving
        restart skips re-encoding the gallery — together with
        ``--compilation-cache`` and ``Retriever.from_pretrained`` this
        makes a cold serving start checkpoint-load + index-load only.
        ``dist_fn`` is code, not data: pass it to :meth:`load` again."""
        arrays = {"codes": np.asarray(self._codes[:self.n]),
                  "n": np.int64(self.n), "k_bits": np.int64(self.k_bits),
                  "packed": np.bool_(self.packed)}
        if self.labels is not None:
            arrays["labels"] = self.labels
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path: str, **kw) -> "HashIndex":
        """Rebuild a saved index.  Codes were stored PREPARED (int8 ±1 or
        packed uint32 lanes), so loading is one device transfer — no
        re-sign, no re-pack.  ``kw`` takes the non-serializable build
        options again (mesh=, dist_fn=+max_dist=, chunk=)."""
        with np.load(path) as data:
            packed = bool(data["packed"])
            codes = np.asarray(data["codes"])
            labels = np.asarray(data["labels"]) if "labels" in data else None
            n, k_bits = int(data["n"]), int(data["k_bits"])
        if not packed:
            return cls(codes, labels=labels, **kw)  # int8 ±1 re-prepares to itself
        if kw.get("dist_fn") is not None:
            raise ValueError("packed storage implies Hamming ranking")
        # packed rows skip __init__'s prep: construct over a placeholder of
        # the right logical shape, then place the stored packed rows
        self = cls(np.ones((1, k_bits), np.int8), packed=True, **kw)
        self.n, self.k_bits = n, k_bits
        self.labels = labels
        self._place(codes)
        return self

    def _prep_queries(self, queries) -> np.ndarray:
        q = np.asarray(queries)
        if self.dist_fn is not None:
            return q
        if self.packed:
            return np.asarray(pack_codes(jnp.asarray(q)))
        return np.where(q > 0, 1, -1).astype(np.int8)

    def search(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """queries [Q, K] ±1 -> (distances [Q, k], gallery indices [Q, k])."""
        q = self._prep_queries(queries)
        if self.mesh is not None:
            return topk_search_sharded(q, self._codes, k, self.mesh,
                                       chunk=self.chunk, valid_n=self.n)
        return topk_search(q, self._codes, k, dist_fn=self.dist_fn,
                           max_dist=self.max_dist, chunk=self.chunk,
                           valid_n=self.n)

    def precision_at_k(self, queries, query_labels, k: int) -> float:
        """Mean fraction of top-k hits sharing >= 1 label with the query
        (the label-overlap relevance of calc_neighbor, utils/utils.py:26)."""
        if self.labels is None:
            raise ValueError("index built without labels")
        _, idx = self.search(queries, k)
        ql = np.asarray(query_labels)
        hit = np.einsum("qc,qkc->qk", ql.astype(np.float64),
                        self.labels[idx].astype(np.float64)) > 0
        return float(hit.mean())


class Retriever:
    """Trained method + tokenizer -> cross-modal search.

    Single-tower encoders are derived from the method's joint ``encode``
    (train/base.py:130-223 variants) by returning only one modality's
    codes under jit: XLA dead-code-eliminates the other tower, so a text
    query costs only the text transformer (verified by cost analysis in
    tests/test_retrieval.py).
    """

    def __init__(self, method, params, aux, cfg, clip_cfg, tp_mesh=None):
        """``tp_mesh``: a 2-D ``("data", "model")`` mesh (parallel/tp.py
        ``make_mesh_2d``) Megatron-shards the CLIP towers across chips for
        serving — the latency lever when a query batch cannot be grown to
        fill a slice: one query's tower FLOPs spread over the ``model``
        axis.  ``params`` must be in the canonical packed-qkv layout (the
        form every checkpoint stores); the relayout happens here."""
        self.method = method
        self.tp_mesh = tp_mesh
        if tp_mesh is not None:
            import dataclasses

            from jax.sharding import NamedSharding, PartitionSpec as P

            from ccmh.parallel import tp as tp_mod

            tp = tp_mesh.shape[tp_mod.MODEL_AXIS]
            tp_mod.validate(clip_cfg, tp)
            clip_cfg = dataclasses.replace(clip_cfg, qkv_layout="head_major")
            params = tp_mod.shard_state(
                tp_mod.relayout_state(params, clip_cfg, to_head_major=True),
                tp_mesh)
            aux = jax.device_put(aux, NamedSharding(tp_mesh, P()))
            self._dp = tp_mesh.shape[tp_mod.DATA_AXIS]
        self.params = params
        self.aux = aux
        self.cfg = cfg
        self.clip_cfg = clip_cfg
        # ONE dist_fn closure for the retriever's lifetime: _search_fn's
        # executable cache keys on function identity, so a fresh closure per
        # _index_kw() call would recompile the search per index
        self._dist_fn = (method.dist_fn(cfg)
                         if method.dist_fn is not None else None)
        res = clip_cfg.image_resolution

        def _batch(images, ids):
            b: Dict[str, jax.Array] = {"image": images, "text": ids}
            if method.needs_mask:
                b["key_padding_mask"] = ids == 0
            return b

        def text_codes(params, aux, ids):
            imgs = jnp.zeros((ids.shape[0], res, res, 3), jnp.float32)
            return method.encode(params, aux, _batch(imgs, ids), cfg, clip_cfg)[1]

        def image_codes(params, aux, images):
            ids = jnp.zeros((images.shape[0], cfg.max_words), jnp.int32)
            # a zero caption has no EOT token; argmax over zeros is index 0,
            # valid for the DCE'd pooled path (the result is never used)
            return method.encode(params, aux, _batch(images, ids), cfg, clip_cfg)[0]

        self._text_codes = jax.jit(text_codes)
        self._image_codes = jax.jit(image_codes)

    @classmethod
    def from_trainer(cls, trainer) -> "Retriever":
        """A TP trainer's live state is head-major/sharded; take the
        canonical form and re-apply its mesh here."""
        tp_mesh = trainer.mesh if getattr(trainer, "tp", 1) > 1 else None
        state = trainer._canonical_state()
        clip_cfg = trainer.clip_cfg
        if tp_mesh is not None:
            import dataclasses

            clip_cfg = dataclasses.replace(clip_cfg, qkv_layout="packed")
        return cls(trainer.method, state.params, state.aux,
                   trainer.cfg, clip_cfg, tp_mesh=tp_mesh)

    @classmethod
    def from_pretrained(cls, cfg, clip_cfg=None) -> "Retriever":
        """Dataset-free serving construction: build the method's parameter
        skeleton and restore ``cfg.pretrained`` into it (any checkpoint
        form — reference ``.pth``, orbax ``state_ckpt`` dir, or ``.npz``).
        Unlike Trainer, no dataset/loaders are required — this is the
        deployment entry point.

        ``clip_cfg`` is only consulted when ``cfg.clip_path`` is empty
        (e.g. ClipConfig.tiny() in tests); otherwise the converted
        checkpoint decides the architecture.
        """
        from ccmh.clip.model import ClipConfig, init_clip_params
        from ccmh.clip.convert import load_clip_params
        from ccmh.train.methods import get_method
        from ccmh.train.state import init_state, make_main_optimizer
        from ccmh.train.trainer import restore_state

        if not cfg.pretrained:
            raise ValueError("from_pretrained requires cfg.pretrained")
        if getattr(cfg, "compilation_cache", ""):
            from ccmh.utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(cfg.compilation_cache)
        method = get_method(cfg.method)
        rng = jax.random.PRNGKey(cfg.seed)
        if cfg.clip_path:
            clip_params, clip_cfg = load_clip_params(cfg.clip_path)
        else:
            clip_cfg = clip_cfg or ClipConfig()
            clip_params = init_clip_params(rng, clip_cfg)
        k_head, k_state = jax.random.split(jax.random.fold_in(rng, 1))
        heads, extra, aux = method.init(k_head, cfg, clip_cfg)
        params = {"clip": clip_params, **heads}
        # real optimizer transforms so the state SKELETON matches training
        # checkpoints (the orbax branch restores into the same structure);
        # the schedule horizon is irrelevant — serving never steps
        tx = make_main_optimizer(cfg, params, steps_per_epoch=1)
        extra_tx = method.extra_tx(cfg) if method.extra_tx else None
        state = init_state(k_state, params, extra, aux, tx, extra_tx)
        state = restore_state(cfg.pretrained, state, cfg.method, clip_cfg)
        tp_mesh = None
        mesh_shape = getattr(cfg, "mesh_shape", (1,))
        if len(mesh_shape) > 1 and mesh_shape[1] > 1:
            from ccmh.parallel.tp import make_mesh_2d

            tp_mesh = make_mesh_2d(mesh_shape[0], mesh_shape[1])
        return cls(method, state.params, state.aux, cfg, clip_cfg,
                   tp_mesh=tp_mesh)

    # ------------------------------------------------------------- encoding
    def _chunked(self, fn, arr, batch_size: int) -> np.ndarray:
        if arr.shape[0] == 0:
            # one padded row probes the output width/dtype (methods differ:
            # DPSIH emits multi-embed rows), then slice to the empty result
            return self._chunked(fn, _pad_rows(arr, 1), 1)[:0]
        out = []
        bs = min(batch_size, max(1, arr.shape[0]))
        if self.tp_mesh is not None and self._dp > 1:
            bs = -(-bs // self._dp) * self._dp   # data-shardable chunk
        for s in range(0, arr.shape[0], bs):
            part = arr[s:s + bs]
            padded = jnp.asarray(_pad_rows(np.asarray(part), bs))
            if self.tp_mesh is not None:
                # pin the query placement: rows over "data" (when dp > 1),
                # replicated over "model" — GSPMD propagates the rest
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ccmh.parallel.tp import DATA_AXIS

                spec = P(DATA_AXIS) if self._dp > 1 else P()
                padded = jax.device_put(padded, NamedSharding(self.tp_mesh, spec))
            codes = fn(self.params, self.aux, padded)
            out.append(np.asarray(codes[:part.shape[0]]))
        return np.concatenate(out)

    def encode_texts(self, texts, batch_size: int = 256) -> np.ndarray:
        """list[str] (host BPE tokenize, dataset/base.py:64-81 semantics)
        or pre-tokenized [B, max_words] int ids -> ±1 codes."""
        if isinstance(texts, (list, tuple)) and texts and isinstance(texts[0], str):
            from ccmh.tokenizer.bpe import tokenize_batch

            ids = tokenize_batch(texts, max_words=self.cfg.max_words)
        else:
            ids = np.asarray(texts, np.int32)
            if ids.ndim == 1 and ids.size == 0:
                # [] / empty list decays to 1-D; the empty-batch probe in
                # _chunked needs the real [0, max_words] token shape
                ids = ids.reshape(0, self.cfg.max_words)
        return self._chunked(self._text_codes, ids.astype(np.int32), batch_size)

    def encode_images(self, images, batch_size: int = 256) -> np.ndarray:
        """[B, H, W, 3] CLIP-normalized float images -> ±1 codes."""
        images = np.asarray(images, np.float32)
        if images.ndim == 1 and images.size == 0:
            r = self.clip_cfg.image_resolution
            images = images.reshape(0, r, r, 3)
        return self._chunked(self._image_codes, images, batch_size)

    # ------------------------------------------------------------- indexing
    def _index_kw(self) -> Dict[str, Any]:
        kw: Dict[str, Any] = {}
        if self._dist_fn is not None:
            kw["dist_fn"] = self._dist_fn
            kw["max_dist"] = self.cfg.output_dim
        return kw

    def build_image_index(self, images=None, codes=None, labels=None,
                          **kw) -> HashIndex:
        if codes is None:
            codes = self.encode_images(images)
        return HashIndex(codes, labels=labels, **{**self._index_kw(), **kw})

    def build_text_index(self, texts=None, codes=None, labels=None,
                         **kw) -> HashIndex:
        if codes is None:
            codes = self.encode_texts(texts)
        return HashIndex(codes, labels=labels, **{**self._index_kw(), **kw})

    # ------------------------------------------------------------- search
    def search_text2image(self, texts, index: HashIndex,
                          k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        return index.search(self.encode_texts(texts), k)

    def search_image2text(self, images, index: HashIndex,
                          k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        return index.search(self.encode_images(images), k)


def _demo(argv: Optional[Sequence[str]] = None) -> int:
    """Search a saved PR_cruve .mat: text-query codes vs the image gallery."""
    import argparse

    ap = argparse.ArgumentParser(
        description="top-k retrieval demo over a saved code dump")
    ap.add_argument("mat", help="PR_cruve .mat (train/base.py:328 layout)")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--direction", choices=["t2i", "i2t"], default="t2i")
    ap.add_argument("--queries", type=int, default=5,
                    help="number of query rows to print")
    ap.add_argument("--packed", action="store_true")
    args = ap.parse_args(argv)

    import scipy.io as scio

    mat = scio.loadmat(args.mat)
    qf, gf = ("q_txt", "r_img") if args.direction == "t2i" else ("q_img", "r_txt")
    index = HashIndex(mat[gf], labels=mat.get("r_l"), packed=args.packed)
    queries, q_labels = mat[qf], mat.get("q_l")
    dists, idx = index.search(queries, args.topk)
    for row in range(min(args.queries, queries.shape[0])):
        print(f"query {row}: top-{args.topk} gallery ids {idx[row].tolist()} "
              f"at distances {dists[row].tolist()}")
    if q_labels is not None and index.labels is not None:
        p = index.precision_at_k(queries, q_labels, args.topk)
        print(f"precision@{args.topk} over {queries.shape[0]} queries: {p:.4f}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(_demo())
