"""On-device precision-recall curves for Hamming retrieval.

The reference never computes PR curves — it dumps the raw code/label
matrices to ``PR_cruve/*.mat`` (train/base.py:328-349, the directory the
misspelling is preserved from) for users to plot *externally* with their
own numpy scripts.  This module computes the two standard hashing-paper
curves directly on device from those same inputs:

* :func:`pr_curve` — precision/recall at every Hamming radius r in
  [0, K]: the ranking collapses to K+1 tie groups, so both curves are
  exact closed forms over the per-bin histograms (``_bin_counts``, shared
  with the sort-free mAP path).  P(r) = relevant retrieved / retrieved
  within distance <= r (0 when nothing is retrieved), R(r) = relevant
  retrieved / total relevant; both averaged over queries with at least
  one relevant item (the skip-empty convention of calc_map_k,
  utils/calc_utils.py:33-35).
* :func:`precision_at_n` — topN-precision curve P@N.  Within a tie group
  the expectation over random tie permutations is exact: a group with
  A_d items (R_d relevant) spanning ranks (L_d, L_d + A_d] contributes
  R_d * clip(N - L_d, 0, A_d) / A_d expected relevant items to the top
  N — the same tie semantics as the histogram mAP (McSherry & Najork).
  For tie-free rankings this IS the exact P@N.

CLI — consume a reference-layout code dump and write plottable curves::

    python -m ccmh.ops.pr_curve PR_cruve/64-ours-coco-i2t.mat \
        --direction i2t -o curves.mat
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccmh.ops.hamming import hamming_distance
from ccmh.ops.map_metric import _bin_counts, _gnd_matrix


@functools.partial(jax.jit, static_argnames=("n_bins", "dist_fn"))
def _chunk_hists(q_codes, r_codes, q_labels, r_labels, n_bins: int,
                 dist_fn=None):
    """(A, R) per-bin histograms [C, n_bins] + tsum [C] for one chunk."""
    dist = (dist_fn or hamming_distance)(q_codes, r_codes)
    gnd = _gnd_matrix(q_labels, r_labels).astype(jnp.float32)
    A, R = _bin_counts(dist, gnd, n_bins)
    return A, R, jnp.sum(R, axis=1)


def compute_hists(q_codes, r_codes, q_labels, r_labels,
                  chunk: Optional[int] = None, dist_fn=None,
                  max_dist: Optional[int] = None):
    """(A, R, tsum) per-query distance histograms — the shared input of
    both curves.  Compute once and pass as ``hists=`` to :func:`pr_curve`
    AND :func:`precision_at_n` to avoid repeating the Q x N distance pass
    (the dominant cost at gallery scale)."""
    q_codes = np.asarray(q_codes)
    q_labels = np.asarray(q_labels)
    if max_dist is None:
        if dist_fn is not None:
            raise ValueError("custom dist_fn requires max_dist")
        max_dist = q_codes.shape[1]                 # Hamming dist in [0, K]
    n_bins = max_dist + 1
    if q_codes.shape[0] == 0:
        z = np.zeros((0, n_bins), np.float32)
        return z, z.copy(), np.zeros((0,), np.float32)
    if chunk is None or chunk <= 0:
        # None / 0 / negative -> auto: size the [chunk, N] working set from
        # the device memory budget, like the mAP path (a hardcoded 2048
        # OOMs at 1M galleries where calc_map on the same inputs succeeds)
        from ccmh.ops.map_metric import _chunk_budget_elems

        # .shape avoids np.asarray()'s device->host copy of a resident gallery
        n = r_codes.shape[0] if hasattr(r_codes, "shape") else len(r_codes)
        chunk = max(64, min(2048, _chunk_budget_elems() // max(n, 1)))
    chunk = min(chunk, q_codes.shape[0])
    r_dev = jax.device_put(jnp.asarray(r_codes))
    rl_dev = jax.device_put(jnp.asarray(r_labels, jnp.float32))
    parts = []
    for s in range(0, q_codes.shape[0], chunk):
        qc, ql = q_codes[s:s + chunk], q_labels[s:s + chunk]
        real = qc.shape[0]
        if real < chunk:  # zero-pad: every chunk runs ONE compiled program
            qc = np.concatenate(
                [qc, np.zeros((chunk - real,) + qc.shape[1:], qc.dtype)])
            ql = np.concatenate(
                [ql, np.zeros((chunk - real,) + ql.shape[1:], ql.dtype)])
        out = _chunk_hists(jnp.asarray(qc), r_dev,
                           jnp.asarray(ql, jnp.float32), rl_dev,
                           n_bins, dist_fn)
        parts.append([np.asarray(x)[:real] for x in out])
    A = np.concatenate([p[0] for p in parts])       # [Q, n_bins]
    R = np.concatenate([p[1] for p in parts])
    tsum = np.concatenate([p[2] for p in parts])    # [Q]
    return A, R, tsum


def _all_hists(q_codes, r_codes, q_labels, r_labels, chunk, dist_fn,
               max_dist, hists):
    if hists is not None:
        return hists
    return compute_hists(q_codes, r_codes, q_labels, r_labels, chunk,
                         dist_fn, max_dist)


def pr_curve(
    q_codes, r_codes, q_labels, r_labels, *, chunk: Optional[int] = None,
    dist_fn=None, max_dist: Optional[int] = None, hists=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(precision [K+1], recall [K+1]) at Hamming radii 0..K.

    Codes are ±1 [Q, K]/[N, K]; labels multi-hot.  Mean over queries with
    tsum > 0; a query retrieving nothing within radius r contributes
    precision 0 at r (the usual hashing-paper convention).  ``dist_fn``
    (+ ``max_dist``) replaces plain Hamming — e.g. DPSIH's multi-embed
    min-distance ranking; it must return int32 distances in [0, max_dist].
    """
    A, R, tsum = _all_hists(q_codes, r_codes, q_labels, r_labels, chunk,
                            dist_fn, max_dist, hists)
    valid = tsum > 0
    ret = np.cumsum(A, axis=1)                      # retrieved within <= r
    rel = np.cumsum(R, axis=1)                      # relevant within <= r
    prec_q = rel / np.maximum(ret, 1.0)
    rec_q = rel / np.maximum(tsum, 1.0)[:, None]
    n_valid = max(int(valid.sum()), 1)
    precision = (prec_q * valid[:, None]).sum(0) / n_valid
    recall = (rec_q * valid[:, None]).sum(0) / n_valid
    return precision, recall


def precision_at_n(
    q_codes, r_codes, q_labels, r_labels, ns: Sequence[int],
    *, chunk: Optional[int] = None, dist_fn=None,
    max_dist: Optional[int] = None, hists=None,
) -> np.ndarray:
    """Mean P@N for each N in ``ns`` (expected value over random tie
    permutations; exact when the ranking is tie-free).  Queries with no
    relevant items are skipped, matching :func:`pr_curve`."""
    A, R, tsum = _all_hists(q_codes, r_codes, q_labels, r_labels, chunk,
                            dist_fn, max_dist, hists)
    valid = tsum > 0
    L = np.cumsum(A, axis=1) - A                    # items strictly closer
    ns_arr = np.asarray(list(ns), np.float64)       # [M]
    # expected relevant among top N: sum_d R_d * clip(N - L_d, 0, A_d) / A_d
    incl = np.clip(ns_arr[:, None, None] - L[None], 0.0, A[None])  # [M, Q, bins]
    frac = np.divide(incl, A[None], out=np.zeros_like(incl), where=A[None] > 0)
    exp_rel = (frac * R[None]).sum(axis=2)          # [M, Q]
    n_valid = max(int(valid.sum()), 1)
    return (exp_rel * valid[None, :]).sum(axis=1) / (ns_arr * n_valid)


def _main(argv=None) -> int:
    import argparse

    import scipy.io as scio

    ap = argparse.ArgumentParser(
        description="PR / topN-precision curves from a reference-layout "
                    "PR_cruve .mat code dump")
    ap.add_argument("mat", help="q_img/q_txt/r_img/r_txt/q_l/r_l layout "
                                "(train/base.py:328-349)")
    ap.add_argument("--direction", choices=["i2t", "t2i"], default="i2t")
    ap.add_argument("--topn", type=str, default="",
                    help="comma-separated N list for the P@N curve "
                         "(default: 12 log-spaced points up to the gallery)")
    ap.add_argument("-o", "--out", default="",
                    help="write curves to this .mat (default: print)")
    args = ap.parse_args(argv)

    mat = scio.loadmat(args.mat)
    qf, rf = ("q_img", "r_txt") if args.direction == "i2t" else ("q_txt", "r_img")
    qB, rB, qL, rL = mat[qf], mat[rf], mat["q_l"], mat["r_l"]
    hists = compute_hists(qB, rB, qL, rL)   # one distance pass, both curves
    precision, recall = pr_curve(qB, rB, qL, rL, hists=hists)
    if args.topn:
        ns = [int(x) for x in args.topn.split(",")]
    else:
        n = rB.shape[0]
        ns = sorted({int(x) for x in np.logspace(0, np.log10(n), 12)})
    p_at_n = precision_at_n(qB, rB, qL, rL, ns, hists=hists)
    if args.out:
        scio.savemat(args.out, {
            "radius": np.arange(len(precision)), "precision": precision,
            "recall": recall, "topn": np.asarray(ns), "p_at_n": p_at_n})
        print(f"wrote {args.out}")
    else:
        for r, (p, c) in enumerate(zip(precision, recall)):
            print(f"radius {r:3d}: P={p:.4f} R={c:.4f}")
        for n, p in zip(ns, p_at_n):
            print(f"P@{n}: {p:.4f}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(_main())
