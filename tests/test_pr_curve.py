"""PR / topN-precision curves (ops/pr_curve.py) vs direct numpy oracles.

The reference only dumps raw codes for external plotting
(train/base.py:328-349); these tests pin ccmh's on-device curves to the
standard definitions those external scripts implement.
"""

import numpy as np
import pytest

from ccmh.ops.pr_curve import pr_curve, precision_at_n


def random_case(q=23, n=67, k=16, c=6, seed=0):
    rng = np.random.RandomState(seed)
    qB = np.sign(rng.randn(q, k)).astype(np.float32)
    rB = np.sign(rng.randn(n, k)).astype(np.float32)
    qL = (rng.rand(q, c) < 0.3).astype(np.float32)
    rL = (rng.rand(n, c) < 0.3).astype(np.float32)
    qL[0] = 0  # a query with no labels -> tsum 0 -> skipped
    return qB, rB, qL, rL


def dist_gnd(qB, rB, qL, rL):
    k = qB.shape[1]
    dist = ((k - qB @ rB.T) / 2).astype(np.int64)
    gnd = (qL @ rL.T) > 0
    return dist, gnd


def oracle_pr(qB, rB, qL, rL):
    dist, gnd = dist_gnd(qB, rB, qL, rL)
    k = qB.shape[1]
    P = np.zeros(k + 1)
    R = np.zeros(k + 1)
    n_valid = 0
    for q in range(qB.shape[0]):
        tsum = gnd[q].sum()
        if tsum == 0:
            continue
        n_valid += 1
        for r in range(k + 1):
            m = dist[q] <= r
            ret = m.sum()
            rel = (m & gnd[q]).sum()
            P[r] += rel / max(ret, 1)
            R[r] += rel / tsum
    return P / n_valid, R / n_valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pr_curve_matches_oracle(seed):
    qB, rB, qL, rL = random_case(seed=seed)
    precision, recall = pr_curve(qB, rB, qL, rL, chunk=7)  # multi-chunk path
    want_p, want_r = oracle_pr(qB, rB, qL, rL)
    np.testing.assert_allclose(precision, want_p, atol=1e-6)
    np.testing.assert_allclose(recall, want_r, atol=1e-6)
    # invariants: recall is nondecreasing and reaches 1 at radius K
    assert np.all(np.diff(recall) >= -1e-9)
    np.testing.assert_allclose(recall[-1], 1.0, atol=1e-6)


def test_precision_at_n_expected_ties():
    """P@N must equal the exact expectation over random tie-break
    permutations: Monte-Carlo with stable-by-random-key sorts."""
    qB, rB, qL, rL = random_case(q=6, n=40, k=8, seed=3)
    dist, gnd = dist_gnd(qB, rB, qL, rL)
    ns = [1, 5, 17, 40]
    got = precision_at_n(qB, rB, qL, rL, ns)

    rng = np.random.RandomState(0)
    trials = 3000
    acc = np.zeros(len(ns))
    valid = [q for q in range(qB.shape[0]) if gnd[q].sum() > 0]
    for _ in range(trials):
        for q in valid:
            tie = rng.permutation(dist.shape[1])
            order = np.lexsort((tie, dist[q]))
            hits = gnd[q][order]
            for j, n in enumerate(ns):
                acc[j] += hits[:n].sum() / n
    mc = acc / (trials * len(valid))
    np.testing.assert_allclose(got, mc, atol=0.01)


def test_precision_at_n_single_tie_group_closed_form():
    """All-equal distances: one tie group, so P@N == (total relevant)/N *
    min(N, A)/A ... == R_total/A for every N <= A, exactly."""
    q, n, c = 3, 32, 4
    qB = np.ones((q, 8), np.float32)
    rB = np.ones((n, 8), np.float32)      # every distance is 0
    rng = np.random.RandomState(1)
    qL = np.eye(c, dtype=np.float32)[rng.randint(c, size=q)]
    rL = np.eye(c, dtype=np.float32)[rng.randint(c, size=n)]
    dist, gnd = dist_gnd(qB, rB, qL, rL)
    assert (dist == 0).all()
    ns = [1, 4, 16, 32]
    got = precision_at_n(qB, rB, qL, rL, ns)
    want = np.mean([gnd[i].sum() / n for i in range(q)])
    np.testing.assert_allclose(got, [want] * len(ns), atol=1e-9)


def test_shared_hists_match_direct_and_ragged_chunks():
    """compute_hists once -> both curves identical to the direct calls, and
    a ragged final chunk (zero-padded to the fixed chunk program) changes
    nothing."""
    from ccmh.ops.pr_curve import compute_hists, precision_at_n

    qB, rB, qL, rL = random_case(q=23)
    hists = compute_hists(qB, rB, qL, rL, chunk=7)   # 23 = 7+7+7+2 ragged
    p1, r1 = pr_curve(qB, rB, qL, rL)
    p2, r2 = pr_curve(qB, rB, qL, rL, hists=hists)
    np.testing.assert_allclose(p2, p1, atol=1e-6)
    np.testing.assert_allclose(r2, r1, atol=1e-6)
    ns = [1, 5, 20]
    np.testing.assert_allclose(
        precision_at_n(qB, rB, qL, rL, ns, hists=hists),
        precision_at_n(qB, rB, qL, rL, ns), atol=1e-6)


def test_pr_curve_empty_queries():
    qB, rB, qL, rL = random_case(q=4)
    p, r = pr_curve(qB[:0], rB, qL[:0], rL)
    assert p.shape == r.shape == (qB.shape[1] + 1,)
    assert np.all(p == 0) and np.all(r == 0)


def test_pr_curve_chunk_zero_means_auto():
    """chunk=0 historically meant 'use the default' (`chunk or 2048`); the
    memory-budget rewrite must keep treating non-positive as auto instead
    of raising range(step=0)."""
    qB, rB, qL, rL = random_case(q=6)
    want_p, want_r = pr_curve(qB, rB, qL, rL)
    for c in (0, -1):
        p, r = pr_curve(qB, rB, qL, rL, chunk=c)
        np.testing.assert_allclose(p, want_p)
        np.testing.assert_allclose(r, want_r)


def test_pr_curve_cli_roundtrip(tmp_path):
    import scipy.io as scio

    from ccmh.ops.pr_curve import _main

    qB, rB, qL, rL = random_case(seed=5)
    mat = str(tmp_path / "dump.mat")
    scio.savemat(mat, {"q_img": qB, "r_txt": rB, "q_txt": qB.copy(),
                       "r_img": rB.copy(), "q_l": qL, "r_l": rL})
    out = str(tmp_path / "curves.mat")
    assert _main([mat, "--direction", "i2t", "--topn", "1,10,50",
                  "-o", out]) == 0
    got = scio.loadmat(out)
    want_p, want_r = oracle_pr(qB, rB, qL, rL)
    np.testing.assert_allclose(got["precision"].ravel(), want_p, atol=1e-6)
    np.testing.assert_allclose(got["recall"].ravel(), want_r, atol=1e-6)
    assert got["p_at_n"].ravel().shape == (3,)
    assert ((got["p_at_n"] >= 0) & (got["p_at_n"] <= 1)).all()


def test_pr_curve_custom_dist_fn():
    """dist_fn + max_dist (the DPSIH multi-embed eval hook): curves match
    the oracle computed with the same distance."""
    import jax.numpy as jnp

    qB, rB, qL, rL = random_case(q=9, n=31, k=8, seed=7)

    def shifted(q, r):  # still integer, bounded by k (min over a fake axis)
        k = q.shape[1]
        d = ((k - q @ r.T) / 2).astype(jnp.int32)
        return jnp.minimum(d + 1, k)

    got_p, got_r = pr_curve(qB, rB, qL, rL, dist_fn=shifted, max_dist=8)
    dist = np.minimum(((8 - qB @ rB.T) / 2).astype(np.int64) + 1, 8)
    gnd = (qL @ rL.T) > 0
    P = np.zeros(9); R = np.zeros(9); nv = 0
    for q in range(qB.shape[0]):
        tsum = gnd[q].sum()
        if tsum == 0:
            continue
        nv += 1
        for r in range(9):
            m = dist[q] <= r
            P[r] += (m & gnd[q]).sum() / max(m.sum(), 1)
            R[r] += (m & gnd[q]).sum() / tsum
    np.testing.assert_allclose(got_p, P / nv, atol=1e-6)
    np.testing.assert_allclose(got_r, R / nv, atol=1e-6)

    with pytest.raises(ValueError, match="max_dist"):
        pr_curve(qB, rB, qL, rL, dist_fn=shifted)
