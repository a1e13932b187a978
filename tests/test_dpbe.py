"""DPBE parity: closed-form diagonal GGN vs the vendored stochman engine."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

STOCHMAN_ROOT = "/root/reference/train/DPBE/stochman"
if STOCHMAN_ROOT not in sys.path:
    sys.path.insert(0, STOCHMAN_ROOT)

D, K, B = 32, 16, 12
rng = np.random.RandomState(0)
X = rng.randn(B, D).astype(np.float32)


@pytest.fixture(scope="module")
def stochman_head():
    nnj = pytest.importorskip("stochman.nnj")
    torch.manual_seed(0)
    return nnj.Sequential(nnj.Linear(D, K), nnj.L2Norm(), add_hooks=True)


def to_params(head):
    lin = head._modules_list[0]
    return {
        "w": jnp.asarray(lin.weight.detach().numpy().T),
        "b": jnp.asarray(lin.bias.detach().numpy()),
    }


def test_forward_parity(stochman_head):
    from ccmh.losses.dpbe import l2norm_head_apply

    with torch.no_grad():
        expected = stochman_head(torch.from_numpy(X)).numpy()
    got = np.asarray(l2norm_head_apply(to_params(stochman_head), jnp.asarray(X)))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


def test_ggn_diag_parity(stochman_head):
    """Closed form vs stochman's generic _jTmjp (MSE calculator semantics:
    identity metric, diagonal, batch mean — stochman/hessian.py:75-95)."""
    from ccmh.losses.dpbe import head_ggn_diag

    with torch.no_grad():
        stochman_head(torch.from_numpy(X))  # populate feature_maps hooks
        jt_j = stochman_head._jTmjp(
            torch.from_numpy(X), None, None,
            wrt="weight", to_diag=True, diag_backprop=False)
        expected = torch.mean(jt_j, dim=0).numpy()   # [K*D + K] params

    got = head_ggn_diag(to_params(stochman_head), jnp.asarray(X))
    # stochman vectorizes as [W row-major (K, D), b]
    got_vec = np.concatenate([
        np.asarray(got["w"]).T.reshape(-1),           # [K, D] row-major
        np.asarray(got["b"]),
    ])
    np.testing.assert_allclose(got_vec, expected, atol=1e-5, rtol=1e-3)


def test_laplace_sampling_stats():
    from ccmh.losses.dpbe import posterior_scale, sample_head

    mu = {"w": jnp.zeros((D, K)), "b": jnp.zeros((K,))}
    hessian = {"w": jnp.full((D, K), 3.0), "b": jnp.full((K,), 3.0)}
    sigma = posterior_scale(hessian)
    expected_sigma = 1.0 / (np.sqrt(3.0 + 1.0) + 1e-6)
    np.testing.assert_allclose(np.asarray(sigma["w"])[0, 0], expected_sigma, rtol=1e-6)

    samples = [sample_head(jax.random.PRNGKey(i), mu, sigma) for i in range(200)]
    ws = np.stack([np.asarray(s["w"]) for s in samples])
    assert abs(ws.std() - expected_sigma) < 0.05 * expected_sigma


@pytest.mark.slow
def test_loss_and_hessian_update_finite():
    from ccmh.losses.dpbe import dpbe_sampled_loss

    mu = {"w": jnp.asarray(rng.randn(D, K) * 0.05, jnp.float32),
          "b": jnp.zeros((K,))}
    hessian = jax.tree.map(lambda t: 100.0 * jnp.ones_like(t), mu)
    label = jnp.asarray((rng.rand(B, 6) < 0.4).astype(np.float32))

    def f(mu_i):
        loss, h_i, h_t = dpbe_sampled_loss(
            jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(X), label,
            mu_i, mu, hessian, hessian,
            n_samples=3, max_pairs=100, train_num=64)
        return loss, (h_i, h_t)

    (loss, (h_i, h_t)), grads = jax.value_and_grad(f, has_aux=True)(mu)
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(grads["w"]))) > 0
    for h in jax.tree.leaves((h_i, h_t)):
        assert np.all(np.asarray(h) >= 0) or np.all(np.isfinite(np.asarray(h)))


def test_n_triplets_matches_reference_miner():
    """n_triplets must equal len(TripletMinner(labels)[0]) bit-for-bit —
    including the uint8 wrap where matches[a,p] * diffs[a,n] is a nonzero
    multiple of 256 and torch.where drops the triplet
    (train/DPBE/triplet_miner.py:24-26).  Labels are crafted so both the
    plain regime and the wrap regime occur (overlaps of 16 x (16^1=17?) —
    we force pairs with overlap 16 and 17 so 16*16=256 -> 0)."""
    sys.path.insert(0, "/root/reference/train/DPBE")
    try:
        from triplet_miner import TripletMinner
    finally:
        sys.path.pop(0)
    from ccmh.losses.dpbe import n_triplets

    cases = []
    r = np.random.RandomState(7)
    # generic multi-label batch
    cases.append((r.rand(14, 80) < 0.15).astype(np.float32))
    # wrap-heavy batch: big shared blocks -> overlaps 16/32/64 appear, and
    # diffs = overlap^1 gives odd values; products hit exact 256 multiples
    wrap = np.zeros((10, 80), np.float32)
    wrap[:, :16] = 1.0                       # everyone shares 16 labels
    wrap[::2, 16:32] = 1.0                   # evens share 16 more (overlap 32)
    wrap[1, 32] = 1.0
    cases.append(wrap)
    # overlap > 255 regime (nclass 291-like): byte() wraps the match count
    big = np.zeros((6, 300), np.float32)
    big[:, :260] = 1.0                       # overlap 260 -> byte 4
    big[0, 260:] = 1.0
    cases.append(big)

    miner = TripletMinner()
    for label in cases:
        want = len(miner(torch.from_numpy(label))[0])
        got = int(n_triplets(jnp.asarray(label)))
        assert got == want, (got, want)
