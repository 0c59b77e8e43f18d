import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.ops import kernels
from tests import oracle_numpy as oracle


def test_rbf_matches_oracle():
    rng = np.random.RandomState(0)
    X = rng.randn(7, 2)
    Z = rng.randn(5, 2)
    got = kernels.rbf(jnp.asarray(X), jnp.asarray(Z), jnp.asarray([0.7, 1.3]), 2.1)
    expect = oracle.rbf(X, Z, np.array([0.7, 1.3]), 2.1)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-10)


def test_K_batched_shapes_and_values():
    rng = np.random.RandomState(1)
    Q, N, M, Dx = 3, 11, 6, 2
    X = rng.randn(N, Dx)
    Z = rng.randn(Q, M, Dx)
    ls = np.abs(rng.randn(Q, 1)) + 0.5
    var = np.abs(rng.randn(Q)) + 0.5
    got = kernels.K_batched("rbf", jnp.asarray(X), jnp.asarray(Z),
                            jnp.asarray(ls), jnp.asarray(var))
    assert got.shape == (Q, N, M)
    for q in range(Q):
        expect = oracle.rbf(X, Z[q], np.full(Dx, ls[q, 0]), var[q])
        np.testing.assert_allclose(np.asarray(got)[q], expect, atol=1e-10)


def test_gram_is_symmetric_psd():
    rng = np.random.RandomState(2)
    Z = rng.randn(2, 10, 1)
    K = np.asarray(kernels.K_gram_batched("rbf", jnp.asarray(Z),
                                          jnp.ones((2, 1)), jnp.ones(2)))
    for q in range(2):
        np.testing.assert_allclose(K[q], K[q].T, atol=1e-12)
        evals = np.linalg.eigvalsh(K[q])
        assert evals.min() > -1e-10


def test_kdiag_equals_variance():
    X = jnp.zeros((4, 1))
    got = kernels.Kdiag_batched("rbf", X, jnp.asarray([1.5, 2.5]))
    np.testing.assert_allclose(np.asarray(got),
                               [[1.5] * 4, [2.5] * 4], atol=0)


def test_matern_families_smoke():
    rng = np.random.RandomState(3)
    X = rng.randn(5, 2)
    for kind in ("matern32", "matern52"):
        f = kernels.kern_fn(kind)
        K = np.asarray(f(jnp.asarray(X), jnp.asarray(X), jnp.ones(2), 1.0))
        np.testing.assert_allclose(np.diag(K), np.ones(5), atol=1e-6)
        assert np.linalg.eigvalsh(K).min() > -1e-8


def test_lmc_coregionalization_diag():
    W = jnp.asarray([[1.0, -2.0], [0.5, 3.0]])
    kappa = jnp.asarray([[0.1, 0.0], [0.0, 0.2]])
    B = kernels.lmc_coregionalization(W, kappa)
    np.testing.assert_allclose(np.asarray(B), [[1.1, 4.0], [0.25, 9.2]])


def test_extra_kernel_families():
    rng = np.random.RandomState(4)
    X = rng.randn(6, 2)
    for kind in ("exponential", "rq"):
        f = kernels.kern_fn(kind)
        K = np.asarray(f(jnp.asarray(X), jnp.asarray(X), jnp.ones(2), 1.3))
        np.testing.assert_allclose(np.diag(K), 1.3 * np.ones(6), atol=1e-6)
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        assert np.linalg.eigvalsh(K).min() > -1e-8
