"""DHaPH parity: Poincaré math and self-paced MS loss vs reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_module

torch = pytest.importorskip("torch")

rng = np.random.RandomState(0)
B, K = 16, 16
X = (rng.randn(B, K) * 0.4).astype(np.float32)
Y = (rng.randn(12, K) * 0.4).astype(np.float32)
LABEL = (rng.rand(B, 6) < 0.3).astype(np.float32)
LABEL[np.arange(B), rng.randint(0, 6, B)] = 1.0


@pytest.fixture(scope="module")
def ref_pmath():
    return load_reference_module("train/DHaPH/pmath.py")


def test_expmap0_project(ref_pmath):
    from ccmh.losses import pmath

    c = 0.1
    expected = ref_pmath.project(ref_pmath.expmap0(torch.from_numpy(X), c=c), c=c).numpy()
    got = np.asarray(pmath.project(pmath.expmap0(jnp.asarray(X), c), c))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_dist_matrix(ref_pmath):
    from ccmh.losses import pmath

    c = 0.1
    xp = ref_pmath.project(ref_pmath.expmap0(torch.from_numpy(X), c=c), c=c)
    yp = ref_pmath.project(ref_pmath.expmap0(torch.from_numpy(Y), c=c), c=c)
    expected = ref_pmath.dist_matrix(xp, yp, c=c).numpy()
    got = np.asarray(pmath.dist_matrix(
        pmath.project(pmath.expmap0(jnp.asarray(X), c), c),
        pmath.project(pmath.expmap0(jnp.asarray(Y), c), c), c))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_riemannian_gradient(ref_pmath):
    from ccmh.losses import pmath

    c = 0.1
    x = torch.from_numpy(X).requires_grad_(True)
    ref_pmath.RiemannianGradient.c = c
    out = ref_pmath.RiemannianGradient.apply(x)
    out.sum().backward()
    expected = x.grad.numpy()

    rgrad = pmath.make_riemannian_gradient(c)
    got = np.asarray(jax.grad(lambda t: jnp.sum(rgrad(t)))(jnp.asarray(X)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_artanh_gradient(ref_pmath):
    from ccmh.losses.pmath import artanh

    vals = np.asarray([-0.99, -0.5, 0.0, 0.3, 0.999999, 1.5], np.float32)
    x = torch.from_numpy(vals).requires_grad_(True)
    out = ref_pmath.artanh(x)
    out.sum().backward()
    np.testing.assert_allclose(np.asarray(artanh(jnp.asarray(vals))),
                               out.detach().numpy(), atol=1e-5)
    got_grad = np.asarray(jax.grad(lambda t: jnp.sum(artanh(t)))(jnp.asarray(vals)))
    np.testing.assert_allclose(got_grad, x.grad.numpy(), atol=1e-2, rtol=1e-4)


@pytest.mark.parametrize("epoch", [1, 30, 150])
def test_ms_loss_parity(epoch):
    ref = load_reference_module("train/DHaPH/MSLoss.py")
    msl = ref.MSLoss(temperature=0.3, totalepoch=200, self_paced=True)
    with torch.no_grad():
        expected = float(msl(torch.from_numpy(X), torch.from_numpy(X),
                             torch.from_numpy(LABEL), epoch))
    from ccmh.losses.dhaph import ms_loss

    got = float(ms_loss(jnp.asarray(X), jnp.asarray(X), jnp.asarray(LABEL),
                        jnp.asarray(epoch), temperature=0.3, total_epoch=200))
    assert abs(got - expected) < 1e-5, (got, expected)


@pytest.mark.slow
def test_hp_loss_runs_and_grads():
    """HPLoss has inherent sampling randomness; check finiteness + grads flow
    to lcas and hpmodel."""
    from ccmh.config import DHaPHConfig
    from ccmh.losses.dhaph import dhaph_loss, init_hp_model, init_lcas

    mcfg = DHaPHConfig(n_proxies=32, topk=5)
    key = jax.random.PRNGKey(0)
    extra = {
        "hpmodel": init_hp_model(key, K, K),
        "lcas": init_lcas(jax.random.fold_in(key, 1), mcfg, K),
    }

    def f(extra):
        loss, _ = dhaph_loss(jax.random.PRNGKey(2), jnp.asarray(X), jnp.asarray(X),
                             jnp.asarray(LABEL), extra, jnp.asarray(3),
                             mcfg, total_epoch=10)
        return loss

    loss, grads = jax.value_and_grad(f)(extra)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)
