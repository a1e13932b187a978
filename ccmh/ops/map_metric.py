"""Fully on-device vectorized mAP over Hamming ranking.

The reference evaluates retrieval with a *CPU Python loop over queries*
(utils/calc_utils.py:16-39: per query — label matmul, Hamming row, sort,
cumulative precision).  That loop is the dominant eval cost and the single
biggest defect to fix on TPU (SURVEY §3.3).

Here the whole metric is one jitted program per query chunk:

  1. Hamming distances for the chunk: one int8 MXU matmul            [C, N]
  2. ground-truth relevance:          one label matmul > 0           [C, N]
  3. a single *stable* ``lax.sort`` of (distance, relevance) rows — the
     stable sort reproduces deterministic index-order tie-breaking (torch's
     unstable sort makes tie order arbitrary; any tie order is admissible
     under the metric definition, stable-by-index is reproducible)
  4. AP from the cumulative sum of sorted relevance:
       AP_q = (1/total) * sum_s rel[s] * (csum[s] <= total) * csum[s]/(s+1)
     with total = min(k, tsum); queries with tsum == 0 contribute 0 but
     still count in the denominator (parity: calc_utils.py:27-28, 38).

Matches ``calc_map_k_matrix`` exactly on tie-free data; within tie
permutation variance otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ccmh.ops.hamming import hamming_distance
from ccmh.ops.packing import pack_codes


def _gnd_matrix(q_labels: jax.Array, r_labels: jax.Array) -> jax.Array:
    """Relevance matrix [C, N] {0,1} int32: "any shared label"
    (calc_neighbor, utils/utils.py:26-28).

    Two layouts: float multi-hot labels use one fp32 MXU matmul (exact for
    0/1 vectors); uint32 BIT-PACKED labels (pack_codes lanes) use AND + a
    lane OR — 32x less HBM for the replicated gallery labels (1M x 291
    classes: 40 MB packed vs ~1.1 GB fp32), which is the real per-chip
    memory term of mesh eval.  Both give identical gnd."""
    if q_labels.dtype == jnp.uint32:
        acc = jnp.zeros((q_labels.shape[0], r_labels.shape[0]), jnp.uint32)
        for lane in range(q_labels.shape[1]):     # ceil(L/32) lanes, tiny
            acc = acc | (q_labels[:, lane][:, None] & r_labels[None, :, lane])
        return (acc != 0).astype(jnp.int32)
    return (
        jnp.dot(q_labels, r_labels.T, preferred_element_type=jnp.float32) > 0
    ).astype(jnp.int32)


# pack label matrices above this element count: below it the fp32 matmul is
# one cheap MXU call and packing would only add compile variants; above it
# the replicated fp32 gallery labels dominate per-chip eval memory
_PACK_LABEL_ELEMS = 1 << 26


@functools.lru_cache(maxsize=1)
def _chunk_budget_elems() -> int:
    """Element budget for the [chunk, N] eval working set, derived from the
    default device's reported memory (not a hardcoded per-chip constant):
    ~3 int32 buffers live through the sort (~12 B/elem) and half the device
    is left for codes/labels/executables.  Backends without memory_stats
    (CPU) fall back to the conservative 2^28-element sizing."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
    except Exception:
        limit = 0
    if limit <= 0:
        return 1 << 28
    return max(1 << 28, int(limit * 0.5) // 12)


@functools.partial(jax.jit, static_argnames=("k", "dist_fn"))
def _map_chunk(
    q_codes: jax.Array,     # [C, K] ±1
    r_codes: jax.Array,     # [N, K] ±1
    q_labels: jax.Array,    # [C, L] multi-hot
    r_labels: jax.Array,    # [N, L]
    k: Optional[int],
    dist_fn=None,
) -> jax.Array:
    """Sum of per-query APs for one chunk (scalar float32)."""
    n = r_codes.shape[0]
    dist = (dist_fn or hamming_distance)(q_codes, r_codes)        # [C, N] int32
    gnd = _gnd_matrix(q_labels, r_labels)                         # [C, N]

    tsum = jnp.sum(gnd, axis=1)                                   # [C]
    total = tsum if k is None else jnp.minimum(k, tsum)

    # Stable sort each row by distance, carrying relevance along.  When
    # (dist, index, gnd) fit in 31 bits we pack them into ONE int32 key —
    # a single-operand sort is ~2x faster than the two-operand
    # (key, payload) sort, and the embedded index reproduces the same
    # deterministic stable-by-index tie order.
    dist_bits = (q_codes.shape[1] + 1).bit_length()   # Hamming dist in [0, K]
    idx_bits = max(n - 1, 1).bit_length()
    if dist_fn is None and dist_bits + idx_bits + 1 <= 31:
        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        packed = (dist << (idx_bits + 1)) | (idx << 1) | gnd
        gnd_sorted = jax.lax.sort(packed, dimension=-1) & 1
    else:
        _, gnd_sorted = jax.lax.sort((dist, gnd), dimension=-1, num_keys=1)
    csum = jnp.cumsum(gnd_sorted, axis=1)                         # [C, N]
    positions = jnp.arange(1, n + 1, dtype=jnp.float32)
    contrib = gnd_sorted * (csum <= total[:, None])
    precision = csum.astype(jnp.float32) / positions
    ap_sum = jnp.sum(contrib * precision, axis=1)                 # [C]
    ap = jnp.where(total > 0, ap_sum / jnp.maximum(total, 1).astype(jnp.float32), 0.0)
    return jnp.sum(ap)


def _bin_counts(dist: jax.Array, gnd: jax.Array, n_bins: int):
    """Per-distance-bin counts for a chunk: (A, R) both [C, n_bins] float32 —
    A_d = items at distance d, R_d = relevant items at distance d.

    Computed via lax.scan over GROUPS of 8 bins: the scan bounds live
    [C, N] compare masks at 8 (a fully unrolled python loop keeps all
    n_bins masks live -> OOM at large chunk x gallery products), while the
    in-group unroll lets XLA fuse 8 compares per pass over ``dist``.
    Shared by the hist-mAP path and ops/pr_curve.py."""
    GROUP = 8
    n_groups = -(-n_bins // GROUP)
    base = jnp.arange(n_groups, dtype=dist.dtype) * GROUP

    def group_counts(_, d0):
        a, r = [], []
        for j in range(GROUP):
            m = (dist == d0 + j).astype(jnp.float32)
            a.append(jnp.sum(m, axis=1))
            r.append(jnp.sum(m * gnd, axis=1))
        return None, (jnp.stack(a), jnp.stack(r))                 # [GROUP, C]

    _, (A_g, R_g) = jax.lax.scan(group_counts, None, base)        # [G, GROUP, C]
    A = A_g.reshape(n_groups * GROUP, -1).T[:, :n_bins]           # [C, bins]
    R = R_g.reshape(n_groups * GROUP, -1).T[:, :n_bins]
    return A, R


@functools.partial(jax.jit, static_argnames=("n_bins", "dist_fn"))
def _map_chunk_hist(
    q_codes: jax.Array,     # [C, K] ±1
    r_codes: jax.Array,     # [N, K] ±1
    q_labels: jax.Array,    # [C, L]
    r_labels: jax.Array,    # [N, L]
    n_bins: int,
    dist_fn=None,
    r_valid: Optional[jax.Array] = None,  # [N] bool; False rows are padding
) -> jax.Array:
    """Sort-free mAP@all: per-distance histograms + the closed-form expected
    AP over random tie permutations (McSherry & Najork, ECIR'08).

    Hamming distances take only K+1 integer values, so the full ranking
    collapses to K+1 tie groups per query.  With A_d items (R_d relevant) at
    distance d, L_d/P_d cumulative counts below d, and H the harmonic number
    (via digamma), the expected AP contribution of group d is

        (R_d/A_d) [ (P_d+1) S1 + (R_d-1)/(A_d-1) (A_d - (L_d+1) S1) ],
        S1 = H(L_d+A_d) - H(L_d).

    This is O(N·K) comparisons and O(K) transcendentals per query — no
    O(N log² N) sort — and differs from the stable-tie exact metric only
    within tie-permutation noise (the reference's own unstable torch.sort
    has the same noise, utils/calc_utils.py:31).
    """
    dist = (dist_fn or hamming_distance)(q_codes, r_codes)        # [C, N]
    if r_valid is not None:
        # padded gallery rows (gallery sharding pads N to a device-count
        # multiple) get the sentinel distance n_bins: it matches no bin, so
        # a padded item enters no histogram — exactly as if it didn't exist
        # (its labels are zero, so tsum is untouched either way)
        dist = jnp.where(r_valid[None, :], dist,
                         jnp.asarray(n_bins, dist.dtype))
    gnd = _gnd_matrix(q_labels, r_labels).astype(jnp.float32)

    A, R = _bin_counts(dist, gnd, n_bins)                         # [C, bins]
    L = jnp.cumsum(A, axis=1) - A
    P = jnp.cumsum(R, axis=1) - R

    harm = lambda n: jax.scipy.special.digamma(n + 1.0)           # H(n) - γ
    S1 = harm(L + A) - harm(L)
    safe_A1 = jnp.maximum(A - 1.0, 1.0)
    contrib = (R / jnp.maximum(A, 1.0)) * (
        (P + 1.0) * S1 + (R - 1.0) / safe_A1 * (A - (L + 1.0) * S1)
    )
    contrib = jnp.where(A > 0, contrib, 0.0)
    tsum = jnp.sum(R, axis=1)
    ap = jnp.where(tsum > 0, jnp.sum(contrib, axis=1) / jnp.maximum(tsum, 1.0), 0.0)
    return jnp.sum(ap)


def calc_map(
    q_codes: jax.Array,
    r_codes: jax.Array,
    q_labels: jax.Array,
    r_labels: jax.Array,
    k: Optional[int] = None,
    chunk: Optional[int] = None,
    method: str = "auto",
    dist_fn=None,
    n_bins: Optional[int] = None,
    mesh=None,
    mesh_axis: str = "data",
    pack_labels: Optional[bool] = None,
    shard_gallery: Optional[bool] = None,
) -> jax.Array:
    """mAP@k of Hamming ranking (k=None -> mAP@all).

    Drop-in on-device replacement for the reference ``calc_map_k_matrix``
    (utils/calc_utils.py:16-39).  Queries are processed in fixed-size
    chunks so the [chunk, N] distance matrix stays comfortably in HBM for
    million-item galleries; the final division is by the *total* query
    count, zero-relevance queries included (reference parity).

    ``chunk``: queries per program; default sizes the [chunk, N] working
    set to ~256M elements (bigger chunks amortise dispatch + sort setup —
    COCO-sized exact eval is ~1.6x faster at 2500 than at 512 — while
    million-item galleries automatically drop to smaller chunks to bound
    the sort buffer).  The final partial chunk is zero-padded to the fixed
    size (padded queries have no relevant items -> AP 0 and are excluded
    by the division), so every chunk runs the SAME compiled program.

    ``method``: "exact" — stable sort, deterministic index tie-breaking;
    "hist" — sort-free expected-tie AP (mAP@all only, ~4x faster on large
    galleries); "auto" — hist when k is None, exact otherwise.

    ``mesh``: optional 1-D jax.sharding.Mesh — each chunk's queries are
    sharded over ``mesh_axis`` with the gallery replicated, so every chip
    ranks its query shard against the full gallery and the AP sums combine
    with one psum (compiler-inserted from the shardings).  Chunks are
    padded to a device-count multiple.  Replaces the reference's CPU
    python loop over queries AND scales it across the mesh.

    ``shard_gallery``: shard the GALLERY axis over the mesh instead of the
    query axis (queries replicated).  Per-chip gallery residency (codes +
    labels + the [chunk, N] distance/relevance working set) drops by the
    device count — the scaling mode for million-item galleries (SURVEY
    §2.6 "sharded gallery eval").  Hist path only: its per-bin counts are
    reductions over the gallery axis, so XLA turns the shardings into one
    psum per chunk; the exact path's full-row sort would force an
    all-gather of the distance matrix, defeating the sharding (explicitly
    rejected).  The gallery is zero-padded to a device-count multiple;
    padded rows carry a validity mask and rank strictly last (sentinel
    distance), leaving every AP unchanged.  Default (None): auto-enables
    for hist-path galleries of >= 2^20 items on multi-device meshes.

    ``pack_labels``: bit-pack multi-hot labels into uint32 lanes and compute
    relevance via AND+lane-OR instead of the fp32 matmul — 32x smaller
    (replicated) gallery labels, identical gnd.  Default (None) packs
    automatically when the gallery label matrix exceeds ~64M elements
    (the 1M x 291-class regime where fp32 replicas cost ~1.1 GB/chip).
    """
    import numpy as onp

    use_hist = (method == "hist") or (method == "auto" and k is None)
    num_query = q_codes.shape[0]
    num_gallery = int(r_codes.shape[0])
    ndev = int(mesh.devices.size) if mesh is not None else 1
    if shard_gallery is None:
        shard_gallery = (
            mesh is not None and use_hist and ndev > 1
            and num_gallery >= 1 << 20)
    if shard_gallery:
        if mesh is None:
            raise ValueError("shard_gallery requires a mesh")
        if not use_hist:
            raise ValueError(
                "shard_gallery supports the hist path only: the exact "
                "path's full-row stable sort would all-gather the sharded "
                "distance matrix (use the default query sharding for exact)")
    if chunk is None:
        # size the [chunk, N] working set from the device's memory budget:
        # big enough that a COCO-sized eval (5k x 117k) is ONE dispatch —
        # each extra dispatch costs a full host round trip, which dominated
        # exact-eval latency when this used to split COCO into 3 chunks.
        # With the gallery sharded, the per-chip row length is N/ndev, so
        # the same budget admits ndev-times-larger chunks.
        per_chip_n = -(-num_gallery // ndev) if shard_gallery else num_gallery
        chunk = max(256, min(num_query,
                             _chunk_budget_elems() // max(per_chip_n, 1)))

    if pack_labels is None:
        pack_labels = (
            int(r_labels.shape[0]) * int(r_labels.shape[1]) >= _PACK_LABEL_ELEMS)

    # device-resident inputs (zero-put validation: Trainer.get_code returns
    # device code arrays, and the Trainer caches its label matrices on
    # device) STAY on device — pulling them to host just to re-put per
    # chunk would reintroduce the host round trips the resident eval path
    # exists to avoid.  Chunk slicing/padding below is dtype-dispatched so
    # device arrays slice/pad on device and host arrays stage with numpy.
    q_codes_h = (q_codes if isinstance(q_codes, jax.Array)
                 else onp.asarray(q_codes))
    if pack_labels:
        # one uint32 lane per 32 classes; chunk padding below pads packed
        # rows with zero lanes (no labels -> tsum 0 -> AP 0, as for fp32).
        # Host-resident labels pack with numpy BEFORE any device_put —
        # shipping 1M x 291 fp32 first (~1.1 GB put + HBM bit-tensor spike)
        # is exactly what packing exists to avoid; device-resident labels
        # pack on-device (pulling them to host would cost the same 1.1 GB
        # the other way).
        from ccmh.ops.packing import pack_codes_np

        q_labels_h = (pack_codes(q_labels)
                      if isinstance(q_labels, jax.Array)
                      else pack_codes_np(q_labels))
        r_labels = (pack_codes(r_labels) if isinstance(r_labels, jax.Array)
                    else jnp.asarray(pack_codes_np(r_labels)))
    else:
        q_labels_h = (q_labels.astype(jnp.float32)
                      if isinstance(q_labels, jax.Array)
                      else onp.asarray(q_labels, dtype=onp.float32))
    if n_bins is None:
        n_bins = q_codes_h.shape[1] + 1

    q_shard = gal_shard = None
    r_valid = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        if shard_gallery:
            # queries replicated, gallery rows sharded; pad the gallery to
            # a device-count multiple (padded rows: zero codes/labels + a
            # False validity bit -> sentinel distance in _map_chunk_hist)
            q_shard = repl
            gal_shard = NamedSharding(mesh, P(mesh_axis))
        else:
            chunk = -(-chunk // ndev) * ndev
            q_shard = NamedSharding(mesh, P(mesh_axis))
            gal_shard = repl

    # multi-controller meshes route every placement through
    # global_device_put (each process lands its addressable shards of the
    # identical host data); single-process this is plain device_put
    from ccmh.parallel.mesh import global_device_put

    multiproc = jax.process_count() > 1
    if multiproc and mesh is not None:
        # non-addressable device_put is illegal; stage through host numpy
        # (codes/labels at eval scale are tiny next to the distance matrix)
        r_codes = onp.asarray(r_codes)
        r_labels = (onp.asarray(r_labels) if not pack_labels
                    else onp.asarray(r_labels))
        xg = onp
    else:
        r_codes = jnp.asarray(r_codes)
        xg = jnp
    if not pack_labels:
        r_labels = xg.asarray(r_labels, dtype=xg.float32)
    if shard_gallery:
        pad_n = (-num_gallery) % ndev
        if pad_n:
            r_codes = xg.concatenate(
                [r_codes, xg.zeros((pad_n,) + r_codes.shape[1:], r_codes.dtype)])
            r_labels = xg.concatenate(
                [r_labels, xg.zeros((pad_n, r_labels.shape[1]), r_labels.dtype)])
        r_valid = xg.arange(num_gallery + pad_n) < num_gallery
        r_valid = global_device_put(r_valid, gal_shard)
    if gal_shard is not None:
        r_codes = global_device_put(r_codes, gal_shard)
        r_labels = global_device_put(r_labels, gal_shard)

    total = jnp.zeros((), jnp.float32)
    for start in range(0, num_query, chunk):
        size = min(chunk, num_query - start)
        qc = q_codes_h[start : start + size]
        ql = q_labels_h[start : start + size]
        if size < chunk:  # zero-pad: all-zero labels -> tsum 0 -> AP 0
            xq = jnp if isinstance(qc, jax.Array) else onp
            xl = jnp if isinstance(ql, jax.Array) else onp
            qc = xq.concatenate(
                [qc, xq.zeros((chunk - size,) + qc.shape[1:], qc.dtype)])
            ql = xl.concatenate(
                [ql, xl.zeros((chunk - size, ql.shape[1]), ql.dtype)])
        if q_shard is not None:
            qc = global_device_put(qc, q_shard)
            ql = global_device_put(ql, q_shard)
        else:
            qc, ql = jnp.asarray(qc), jnp.asarray(ql)
        if use_hist:
            total = total + _map_chunk_hist(
                qc, r_codes, ql, r_labels, n_bins, dist_fn, r_valid)
        else:
            total = total + _map_chunk(qc, r_codes, ql, r_labels, k, dist_fn)
    return total / num_query


@functools.partial(jax.jit,
                   static_argnames=("k", "n_bins", "dist_fn", "use_hist"))
def _fused_4way_chunk(qi, qt, ri, rt, ql, rl, k, n_bins, dist_fn, use_hist):
    """All four validation directions in ONE compiled program: the
    relevance matrix / distance passes share inputs and XLA schedules
    them back-to-back — and, on a relay-attached host, one dispatch
    replaces four full host round trips per valid epoch."""
    if use_hist:
        f = lambda q, r: _map_chunk_hist(q, r, ql, rl, n_bins, dist_fn)
    else:
        f = lambda q, r: _map_chunk(q, r, ql, rl, k, dist_fn)
    return jnp.stack([f(qi, rt), f(qt, ri), f(qi, ri), f(qt, rt)])


def _try_fused_4way(qi, qt, ri, rt, q_labels, r_labels, *, k, method,
                    dist_fn, n_bins, mesh, pack_labels, shard_gallery):
    """The single-dispatch 4-way path when the shapes allow it: one chunk
    covers the queries, the 4 concurrent [Q, N] working sets fit the
    chunk budget, and neither gallery sharding nor label packing (the
    million-item regimes, which chunk/stage differently) is in play.
    Returns None to fall back to four sequential calc_map calls."""
    import numpy as onp

    use_hist = (method == "hist") or (method == "auto" and k is None)
    num_query, num_gallery = int(qi.shape[0]), int(ri.shape[0])
    ndev = int(mesh.devices.size) if mesh is not None else 1
    if shard_gallery or (shard_gallery is None and mesh is not None
                         and use_hist and ndev > 1
                         and num_gallery >= 1 << 20):
        return None
    if pack_labels or (pack_labels is None and
                       num_gallery * int(r_labels.shape[1])
                       >= _PACK_LABEL_ELEMS):
        return None
    # all four [Q, N] working sets are live in one program
    if 4 * num_query * num_gallery > _chunk_budget_elems():
        return None
    if n_bins is None:
        n_bins = int(qi.shape[1]) + 1

    pad = (-num_query) % ndev    # query sharding needs a device multiple
    qs = [qi, qt]
    ql = (q_labels.astype(jnp.float32) if isinstance(q_labels, jax.Array)
          else onp.asarray(q_labels, onp.float32))
    if pad:
        def _pad(x):
            xp = jnp if isinstance(x, jax.Array) else onp
            return xp.concatenate(
                [x, xp.zeros((pad,) + tuple(x.shape[1:]), x.dtype)])

        qs = [_pad(x) for x in qs]
        ql = _pad(ql)    # zero labels -> tsum 0 -> AP 0, excluded below
    rl = (r_labels.astype(jnp.float32) if isinstance(r_labels, jax.Array)
          else onp.asarray(r_labels, onp.float32))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ccmh.parallel.mesh import global_device_put

        q_shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        qs = [global_device_put(x, q_shard) for x in qs]
        ql = global_device_put(ql, q_shard)
        ri = global_device_put(ri if jax.process_count() == 1
                               else onp.asarray(ri), repl)
        rt = global_device_put(rt if jax.process_count() == 1
                               else onp.asarray(rt), repl)
        rl = global_device_put(rl, repl)
    totals = _fused_4way_chunk(qs[0], qs[1], ri, rt, ql, rl,
                               k, n_bins, dist_fn, use_hist)
    out = totals / num_query
    return out[0], out[1], out[2], out[3]


def calc_map_4way(
    query_img: jax.Array, query_txt: jax.Array,
    retrieval_img: jax.Array, retrieval_txt: jax.Array,
    q_labels: jax.Array, r_labels: jax.Array,
    k: Optional[int] = None,
    chunk: Optional[int] = None,
    method: str = "auto",
    dist_fn=None,
    n_bins: Optional[int] = None,
    mesh=None,
    pack_labels: Optional[bool] = None,
    shard_gallery: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(i2t, t2i, i2i, t2t) mAP — the reference's validation quartet
    (train/base.py:259-262).

    When one chunk covers the queries (every trainer-scale valid), the
    quartet computes in a SINGLE fused dispatch (`_fused_4way_chunk`) —
    numerically identical to the four sequential calls (same
    subcomputations, pinned by test) and 4x fewer host round trips.
    Million-item regimes (gallery sharding, label packing, multi-chunk)
    fall back to four `calc_map` calls.
    """
    if chunk is None:
        fused = _try_fused_4way(
            query_img, query_txt, retrieval_img, retrieval_txt,
            q_labels, r_labels, k=k, method=method, dist_fn=dist_fn,
            n_bins=n_bins, mesh=mesh, pack_labels=pack_labels,
            shard_gallery=shard_gallery)
        if fused is not None:
            return fused
    kw = dict(k=k, chunk=chunk, method=method, dist_fn=dist_fn,
              n_bins=n_bins, mesh=mesh, pack_labels=pack_labels,
              shard_gallery=shard_gallery)
    i2t = calc_map(query_img, retrieval_txt, q_labels, r_labels, **kw)
    t2i = calc_map(query_txt, retrieval_img, q_labels, r_labels, **kw)
    i2i = calc_map(query_img, retrieval_img, q_labels, r_labels, **kw)
    t2t = calc_map(query_txt, retrieval_txt, q_labels, r_labels, **kw)
    return i2t, t2i, i2i, t2t
