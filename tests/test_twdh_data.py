"""TwDH target construction parity + batch iterator behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.data.dataset import BatchIterator, CrossModalDataset
from ccmh.data.synthetic import synthetic_arrays
from ccmh.losses.twdh import bce, hash_center_targets, soft_argmax_hash_loss

torch = pytest.importorskip("torch")


def ref_hash_center_targets(labels, centers):
    """Numpy shim of train/TwDH/hash_train.py:84-122 (hash_convert +
    hash_center_multilables) for the tie-free case."""
    out = []
    for lab in labels:
        mean = centers[lab == 1].mean(axis=0)
        sign = np.where(mean < 0, -1.0, np.where(mean > 0, 1.0, 0.0))
        assert not np.any(sign == 0), "test data must avoid zero means"
        bits = (sign > 0).astype(int)
        pairs = np.zeros((len(bits), 2))
        pairs[np.arange(len(bits)), bits] = 1
        out.append(pairs.reshape(-1))
    return np.stack(out)


def test_hash_center_targets_parity():
    rng = np.random.RandomState(0)
    C, K, B = 6, 16, 10
    centers = (rng.randint(0, 2, (C, K)) * 2 - 1).astype(np.float32)
    # single-label rows -> means are exactly ±1, never zero
    labels = np.zeros((B, C), np.float32)
    labels[np.arange(B), rng.randint(0, C, B)] = 1.0
    expected = ref_hash_center_targets(labels, centers)
    got = np.asarray(hash_center_targets(
        jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(centers)))
    np.testing.assert_array_equal(got, expected)


def test_bce_matches_torch():
    rng = np.random.RandomState(1)
    p = rng.rand(8, 32).astype(np.float32) * 0.98 + 0.01
    t = (rng.rand(8, 32) < 0.5).astype(np.float32)
    expected = float(torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)))
    got = float(bce(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - expected) < 1e-6


def test_soft_argmax_hash_loss():
    code = jnp.asarray([[0.5, 0.5, 1.0, 0.0]])
    # 1 - mean((2c-1)^2): pairs at (0.5, 0.5) give 1; (1, 0) give 0
    assert abs(float(soft_argmax_hash_loss(code)) - 0.5) < 1e-6


# ---------------------------------------------------------------------------
# batch iterator
# ---------------------------------------------------------------------------

def make_dataset(n=25):
    raw = synthetic_arrays(n=n, n_class=4, resolution=16)
    return CrossModalDataset(raw, is_train=False, max_words=16, resolution=16)


def test_batch_iterator_covers_all_indices_with_wrap_padding():
    ds = make_dataset(25)
    it = BatchIterator(ds, batch_size=8, shuffle=False, num_workers=2)
    assert len(it) == 4
    seen = []
    for batch in it:
        assert batch["image"].shape[0] == 8      # fixed shape incl. last
        seen.extend(batch["index"][batch["valid"]].tolist())
    assert sorted(seen) == list(range(25))


def test_batch_iterator_shuffle_deterministic_by_seed():
    ds = make_dataset(16)
    o1 = [b["index"].tolist() for b in BatchIterator(ds, 8, shuffle=True, seed=3)]
    o2 = [b["index"].tolist() for b in BatchIterator(ds, 8, shuffle=True, seed=3)]
    # same seed, first epoch -> same order; epochs advance the rng
    assert o1[0] == o2[0]


def test_batch_shapes_and_dtypes():
    ds = make_dataset(8)
    batch = next(iter(BatchIterator(ds, 4, shuffle=False)))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["image"].dtype == np.float32
    assert batch["text"].shape == (4, 16)
    assert batch["text"].dtype == np.int32
    assert batch["label"].shape == (4, 4)
