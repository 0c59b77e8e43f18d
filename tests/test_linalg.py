import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from hetmogp_tpu.ops import linalg


def _spd(key_seed, q, m):
    rng = np.random.RandomState(key_seed)
    A = rng.randn(q, m, m)
    return A @ np.swapaxes(A, -1, -2) + m * np.eye(m)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    L = np.tril(rng.randn(3, 5, 5))
    flat = linalg.pack_tril(jnp.asarray(L))
    assert flat.shape == (3, 15)
    back = linalg.unpack_tril(flat, 5)
    np.testing.assert_allclose(back, L, rtol=0, atol=0)


def test_pack_order_matches_row_major_tril():
    # (0,0),(1,0),(1,1),(2,0)... — GPy choleskies enumeration
    L = np.zeros((3, 3))
    L[np.tril_indices(3)] = np.arange(1, 7)
    flat = linalg.pack_tril(jnp.asarray(L))
    np.testing.assert_array_equal(np.asarray(flat), np.arange(1, 7))


def test_jitchol_matches_numpy_on_spd():
    K = _spd(1, 4, 16)
    L = linalg.jitchol(jnp.asarray(K))
    Lnp = np.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), Lnp, atol=1e-10)


def test_jitchol_recovers_semidefinite():
    # rank-deficient: plain Cholesky fails, adaptive jitter must recover
    rng = np.random.RandomState(2)
    A = rng.randn(2, 8, 3)
    K = A @ np.swapaxes(A, -1, -2)  # rank 3 < 8
    L = linalg.jitchol(jnp.asarray(K))
    assert np.isfinite(np.asarray(L)).all()
    rec = np.asarray(L @ jnp.swapaxes(L, -1, -2))
    np.testing.assert_allclose(rec, K, atol=1e-3)


def test_cho_solve_batched():
    K = _spd(3, 2, 10)
    L = jnp.asarray(np.linalg.cholesky(K))
    B = np.random.RandomState(4).randn(2, 10, 7)
    X = linalg.cho_solve_batched(L, jnp.asarray(B))
    for q in range(2):
        expect = sla.cho_solve((np.asarray(L)[q], True), B[q])
        np.testing.assert_allclose(np.asarray(X)[q], expect, atol=1e-9)


def test_logdet_from_chol():
    K = _spd(5, 3, 6)
    L = jnp.asarray(np.linalg.cholesky(K))
    ld = linalg.logdet_from_chol(L)
    expect = np.array([np.linalg.slogdet(K[q])[1] for q in range(3)])
    np.testing.assert_allclose(np.asarray(ld), expect, atol=1e-9)


def test_quad_diag():
    rng = np.random.RandomState(6)
    A = rng.randn(2, 9, 4)
    L = np.tril(rng.randn(2, 4, 4))
    got = linalg.quad_diag(jnp.asarray(A), jnp.asarray(L))
    for q in range(2):
        S = L[q] @ L[q].T
        expect = np.diag(A[q] @ S @ A[q].T)
        np.testing.assert_allclose(np.asarray(got)[q], expect, atol=1e-9)


def test_newton_schulz_inv_sqrt_f64():
    rng = np.random.RandomState(9)
    A = rng.randn(2, 32, 8)
    K = A @ np.swapaxes(A, -1, -2) / 8 + 0.05 * np.eye(32)
    R = np.asarray(linalg.newton_schulz_inv_sqrt(jnp.asarray(K), iters=32))
    for q in range(2):
        np.testing.assert_allclose(R[q] @ K[q] @ R[q], np.eye(32), atol=1e-8)
        np.testing.assert_allclose(R[q], R[q].T, atol=1e-12)


def test_chol_mixed_value_and_gradient():
    """chol_mixed must equal plain Cholesky in value and VJP (f64 case is
    exactly the same computation, so the hand-written pullback is validated
    against jax's own)."""
    rng = np.random.RandomState(11)
    A = rng.randn(3, 10, 4)
    K = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(10)
    L_ref = np.linalg.cholesky(K)
    L_got = np.asarray(linalg.chol_mixed(jnp.asarray(K)))
    np.testing.assert_allclose(L_got, L_ref, atol=1e-10)

    g = rng.randn(3, 10, 10)

    def f_ref(K):
        return jnp.sum(jnp.linalg.cholesky(K) * g)

    def f_got(K):
        return jnp.sum(linalg.chol_mixed(K) * g)

    gr = np.asarray(jax.grad(f_ref)(jnp.asarray(K)))
    gg = np.asarray(jax.grad(f_got)(jnp.asarray(K)))
    np.testing.assert_allclose(gg, gr, atol=1e-8)
