"""TwDH hash-center generator (ccmh/data/builders/twdh_centers.py).

The reference ships TwDH's class centers as pre-computed pickles for
exactly three datasets and no generator (train/TwDH/center/, loaded at
model/TwDH.py:113-138); this tool makes TwDH runnable on ANY dataset.
These tests pin the construction properties (Hadamard separation, exact
trans vertex reproduction — the reference's own coco trans measures
99.84%) and drive a full TwDH train/valid epoch from generated assets.
"""

import numpy as np
import pytest

from ccmh.data.builders.twdh_centers import (
    argmax_pair_agreement, fit_trans, gen_centers, generate_assets,
    hadamard, pair_encode,
)


def _min_hamming(c: np.ndarray) -> float:
    d = (c.shape[1] - c @ c.T) / 2
    np.fill_diagonal(d, np.inf)
    return float(d.min())


def test_hadamard_orthogonal():
    for n in (2, 16, 64):
        h = hadamard(n)
        np.testing.assert_array_equal(h @ h.T, n * np.eye(n))
        assert set(np.unique(h)) == {-1.0, 1.0}


def test_gen_centers_separation():
    # C <= K: pure Hadamard rows, every pairwise distance exactly K/2
    c = gen_centers(12, 16, seed=0)
    assert c.shape == (12, 16) and set(np.unique(c)) == {-1.0, 1.0}
    assert _min_hamming(c) == 8.0
    # C > K: greedy fill keeps a healthy margin (>= K/4 at this scale)
    c = gen_centers(40, 16, seed=0)
    assert c.shape == (40, 16)
    assert _min_hamming(c) >= 4.0
    # no antipodal pairs (they would make trans-derived shorts infeasible)
    gram = c @ c.T
    assert gram.min() > -16.0


def test_pair_encode_layout():
    """Matches hash_convert (train/TwDH/hash_train.py:84-101): bit -1 ->
    column 2b, bit +1 -> column 2b+1."""
    c = np.array([[1.0, -1.0], [-1.0, 1.0]], np.float32)
    want = np.array([[0, 1, 1, 0], [1, 0, 0, 1]], np.float32)
    np.testing.assert_array_equal(pair_encode(c), want)


def test_fit_trans_exact_when_underdetermined():
    """C < 2K: the min-norm LSQ interpolates every class vertex."""
    rng = np.random.RandomState(3)
    long_c = gen_centers(10, 16, seed=1)
    short_c = (rng.randint(0, 2, (10, 8)) * 2 - 1).astype(np.float32)
    t = fit_trans(long_c, short_c)
    assert t.shape == (32, 16)
    assert argmax_pair_agreement(long_c, short_c, t) == 1.0


def test_generate_assets_exact_in_overflow_regime():
    """C >= 2K at the smallest long length (40 classes, long=16): shorts
    switch to the projection construction and every trans still
    reproduces its short centers exactly on all class vertices."""
    assets = generate_assets(40, long_dims=[16, 32], short_dims=[8], seed=0)
    assert set(assets) == {"long/16", "long/32", "short/8",
                           "trans/16/8", "trans/32/8"}
    for kl in (16, 32):
        agree = argmax_pair_agreement(assets[f"long/{kl}"], assets["short/8"],
                                      assets[f"trans/{kl}/{8}"])
        assert agree == 1.0, (kl, agree)
    assert _min_hamming(assets["short/8"]) >= 1.0


def test_cli_writes_loadable_npz(tmp_path):
    from ccmh.data.builders.twdh_centers import main
    from ccmh.losses.twdh import load_twdh_assets

    out = str(tmp_path / "centers.npz")
    assert main(["--nclass", "8", "--long-dims", "16", "--short-dims", "8",
                 "--seed", "0", "--out", out]) == 0
    assets = load_twdh_assets("anydataset", 16, out)
    assert assets["long_center"].shape == (8, 16)
    assert assets["short_center"][8].shape == (8, 8)
    assert assets["trans"][8].shape == (32, 16)


@pytest.mark.slow
def test_twdh_e2e_with_generated_centers(tmp_path):
    """Full TwDH train/valid epoch from GENERATED centers — a dataset the
    reference cannot run TwDH on at all (no vendored pickles)."""
    import jax

    from ccmh.clip.model import init_clip_params
    from ccmh.data.split import split_data
    from ccmh.data.synthetic import synthetic_arrays
    from ccmh.train.trainer import Trainer
    from tests.test_train_e2e import TINY, tiny_cfg

    out = str(tmp_path / "gen_centers.npz")
    np.savez(out, **generate_assets(8, long_dims=[16], short_dims=[8], seed=0))

    cfg = tiny_cfg("TwDH", tmp_path / "fresh")
    cfg.twdh.center_path = out
    raw = synthetic_arrays(n=64, n_class=8, resolution=TINY.image_resolution)
    splits = split_data(raw, query_num=cfg.query_num, train_num=cfg.train_num,
                        seed=cfg.seed)
    tr = Trainer(cfg, splits=splits, clip_cfg=TINY,
                 clip_params=init_clip_params(jax.random.PRNGKey(0), TINY))
    tr.train_epoch(0)
    maps = tr.valid(0)
    for v in maps:
        assert 0.0 <= v <= 1.0
