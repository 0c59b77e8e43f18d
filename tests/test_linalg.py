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


def test_chol_cached_matches_autodiff():
    """chol_cached: forward returns the cached factor; backward is the exact
    Cholesky pullback via matmuls against the cached inverse.  Against jax's
    own cholesky VJP in f64 both must agree to roundoff."""
    rng = np.random.RandomState(3)
    A = rng.randn(2, 12, 12)
    K = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(12)
    K = jnp.asarray(K)
    L = jnp.linalg.cholesky(K)
    iL = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(jnp.eye(12, dtype=L.dtype), L.shape), lower=True)
    co = jnp.asarray(rng.randn(2, 12, 12))

    np.testing.assert_allclose(np.asarray(linalg.chol_cached(K, L, iL)),
                               np.asarray(L))
    g_ref = jax.grad(lambda K: jnp.sum(jnp.linalg.cholesky(K) * co))(K)
    g_new = jax.grad(lambda K: jnp.sum(linalg.chol_cached(K, L, iL) * co))(K)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-10)


def test_solve_tri_cached_matches_autodiff():
    """solve_tri_cached: value = iL @ B; adjoints (Lbar, Bbar) match jax's
    triangular-solve VJP to roundoff in f64."""
    rng = np.random.RandomState(4)
    A = rng.randn(2, 12, 12)
    K = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(12)
    L = jnp.linalg.cholesky(jnp.asarray(K))
    iL = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(jnp.eye(12, dtype=L.dtype), L.shape), lower=True)
    B = jnp.asarray(rng.randn(2, 12, 5))
    co = jnp.asarray(rng.randn(2, 12, 5))

    def f_ref(L, B):
        return jnp.sum(jax.scipy.linalg.solve_triangular(L, B, lower=True) * co)

    def f_new(L, B):
        return jnp.sum(linalg.solve_tri_cached(L, B, iL) * co)

    np.testing.assert_allclose(
        np.asarray(linalg.solve_tri_cached(L, B, iL)),
        np.asarray(jax.scipy.linalg.solve_triangular(L, B, lower=True)),
        atol=1e-10)
    gL_ref, gB_ref = jax.grad(f_ref, argnums=(0, 1))(L, B)
    gL_new, gB_new = jax.grad(f_new, argnums=(0, 1))(L, B)
    np.testing.assert_allclose(np.asarray(gL_new),
                               np.asarray(jnp.tril(gL_ref)), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gB_new), np.asarray(gB_ref),
                               atol=1e-10)


def test_fast_projection_matmuls_pin_highest_precision():
    """REGRESSION (round-1 '75% gradient error'): applying the cached
    triangular inverse with DEFAULT-precision TPU matmuls rounds operands
    to bfloat16 per pass and destroys P = Kfu @ iLuu^T (measured 1.5e0
    relative error at M=1024, cond(Kuu)~1e6, vs 2.3e-4 at HIGHEST — the
    solve path measures 1.6e-4).  The failure is TPU-specific (CPU matmuls
    ignore the flag), so pin the HIGHEST flag in the emitted jaxpr."""
    from hetmogp_tpu import Bernoulli, HetGaussian, ModelConfig
    from hetmogp_tpu.models import elbo as elbo_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli()), num_latent=2,
                      num_inducing=8, input_dim=1, dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None],
                         lengthscale=0.3, variance=0.8, q_mu_scale=0.3)
    Luu = elbo_mod.prior_cholesky(params, cfg)
    iLuu = jax.scipy.linalg.solve_triangular(
        Luu, jnp.broadcast_to(jnp.eye(8, dtype=Luu.dtype), Luu.shape),
        lower=True)
    X = jnp.asarray(rng.rand(10, 1), jnp.float32)

    for cache_grad in (False, True):
        jaxpr = str(jax.make_jaxpr(
            lambda p: elbo_mod.latent_projections(
                p, cfg, Luu, X, iLuu=iLuu, cache_grad=cache_grad))(params))
        assert "Precision.HIGHEST" in jaxpr, (
            "fast-projection matmul lost its HIGHEST precision pin "
            f"(cache_grad={cache_grad})")


def test_elbo_cache_grad_matches_plain_hyper_gradients():
    """VM fast path: hyper gradients through chol_cached/solve_tri_cached
    equal plain autodiff through the fresh factorization (f64)."""
    from hetmogp_tpu import Bernoulli, HetGaussian, ModelConfig
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models import elbo as elbo_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli()), num_latent=2,
                      num_inducing=8, input_dim=1, dtype="float64",
                      jitter=1e-6, adaptive_jitter=False)
    X_list = [rng.rand(20, 1), rng.rand(15, 1)]
    Y_list = [rng.randn(20, 1), (rng.rand(15, 1) > .5).astype(float)]
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None],
                         lengthscale=0.3, variance=0.8, q_mu_scale=0.3)
    Luu = elbo_mod.prior_cholesky(params, cfg)
    iLuu = jax.scipy.linalg.solve_triangular(
        Luu, jnp.broadcast_to(jnp.eye(8, dtype=Luu.dtype), Luu.shape),
        lower=True)
    sc = jnp.asarray(scales)

    hp = dict(log_lengthscale=params.log_lengthscale,
              log_variance=params.log_variance, Z=params.Z, W=params.W,
              kappa=params.kappa)

    def loss_plain(hp):
        return -elbo_mod.elbo_fn(params.replace(**hp), data, sc, cfg)[0]

    def loss_cached(hp):
        return -elbo_mod.elbo_fn(params.replace(**hp), data, sc, cfg,
                                 Luu=Luu, iLuu=iLuu, cache_grad=True)[0]

    v1, g1 = jax.jit(jax.value_and_grad(loss_plain))(hp)
    v2, g2 = jax.jit(jax.value_and_grad(loss_cached))(hp)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-12)
    for k in hp:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-9, atol=1e-10)


class TestBlockedKernels:
    """Blocked Cholesky / recursive triangular inverse (MXU path for the
    O(M^3) factorization work; docs/DESIGN.md §7b)."""

    def _spd(self, q=2, m=256, dtype=jnp.float64, seed=0, jitter=1e-6):
        rng = np.random.RandomState(seed)
        x = rng.rand(q, m, 1)
        d2 = (x[:, :, None, 0] - x[:, None, :, 0]) ** 2
        K = np.exp(-0.5 * d2 / 0.01) + jitter * np.eye(m)
        return jnp.asarray(K, dtype)

    def test_blocked_cholesky_matches_stock_f64(self):
        K = self._spd()
        L_blk = linalg.blocked_cholesky(K, nb=128)
        L_ref = jnp.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L_blk), np.asarray(L_ref),
                                   atol=1e-10)

    def test_blocked_cholesky_residual_f32(self):
        # 1e-4 jitter: the trainer's fixed-jitter floor for f32 throughput
        # mode (TrainConfig/DESIGN §7) — 1e-6 is below f32 resolution at
        # this conditioning for ANY Cholesky, stock included
        K = self._spd(dtype=jnp.float32, jitter=1e-4)
        L = np.asarray(linalg.blocked_cholesky(K, nb=128))
        Kn = np.asarray(K)
        for i in range(K.shape[0]):
            res = np.abs(L[i] @ L[i].T - Kn[i]).max() / np.abs(Kn[i]).max()
            assert res < 2e-5, res  # stock f32 measures ~7e-6 at this cond

    def test_blocked_cholesky_fallback_small_or_ragged(self):
        # m <= nb and m % nb != 0 must take the stock kernel bit-for-bit
        for m in (64, 200):
            K = self._spd(m=m)
            np.testing.assert_array_equal(
                np.asarray(linalg.blocked_cholesky(K, nb=128)),
                np.asarray(jnp.linalg.cholesky(K)))

    def test_rec_tri_inverse_residual(self):
        for dtype, jit_, tol in ((jnp.float64, 1e-6, 1e-10),
                                 (jnp.float32, 1e-4, 2e-3)):
            L = jnp.linalg.cholesky(self._spd(m=256, dtype=dtype, jitter=jit_))
            iL = np.asarray(linalg.rec_tri_inverse(L, leaf=64))
            Ln = np.asarray(L)
            for i in range(Ln.shape[0]):
                res = np.abs(Ln[i] @ iL[i] - np.eye(256)).max()
                assert res < tol, res

    def test_rec_tri_inverse_matches_solve(self):
        L = jnp.linalg.cholesky(self._spd(m=256))
        iL_rec = np.asarray(linalg.rec_tri_inverse(L, leaf=64))
        iL_ref = np.asarray(jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(jnp.eye(256, dtype=L.dtype), L.shape),
            lower=True))
        np.testing.assert_allclose(iL_rec, iL_ref, atol=1e-9)

    def test_prior_cholesky_blocked_gate(self):
        """blocked=True must match the fixed-jitter jitchol factor."""
        from hetmogp_tpu.config import ModelConfig
        from hetmogp_tpu import likelihoods as Lk
        from hetmogp_tpu.models import elbo as elbo_mod
        from hetmogp_tpu.models.params import init_params

        cfg = ModelConfig(likelihoods=(Lk.Gaussian(),), num_latent=2,
                          num_inducing=256, input_dim=1, dtype="float64",
                          adaptive_jitter=False)
        params = init_params(jax.random.PRNGKey(0), cfg,
                             np.linspace(0, 1, 256)[:, None], lengthscale=0.3)
        L_blk = elbo_mod.prior_cholesky(params, cfg, blocked=True)
        L_ref = elbo_mod.prior_cholesky(params, cfg)
        np.testing.assert_allclose(np.asarray(L_blk), np.asarray(L_ref),
                                   atol=1e-10)


class TestTriangularMatmuls:
    """Blocked triangular-structure-aware matmuls == their dense forms.

    These carry the VE fast path's dominant op (P = Kfu @ iLuu^T,
    models/elbo.py latent_projections) and the VM cached adjoints
    (solve_tri_cached / chol_cached backward) — skipping the triangular
    operand's structurally-zero blocks is exact, not an approximation.
    """

    def _mats(self, m, q=3, n=41, seed=0):
        rng = np.random.RandomState(seed)
        A = jnp.asarray(rng.randn(q, n, m))
        L = jnp.tril(jnp.asarray(rng.randn(q, m, m)))
        B = jnp.asarray(rng.randn(q, m, 17))
        return A, L, B

    def test_blocked_forms_match_dense(self):
        # m=1024 exercises the blocked path (nb=256); m=100 the fallback
        for m in (1024, 100):
            A, L, B = self._mats(m)
            np.testing.assert_allclose(
                np.asarray(linalg.matmul_tril_t(A, L)),
                np.asarray(jnp.einsum("qnm,qkm->qnk", A, L)),
                rtol=1e-12, atol=1e-9)
            np.testing.assert_allclose(
                np.asarray(linalg.matmul_tril(A, L)), np.asarray(A @ L),
                rtol=1e-12, atol=1e-9)
            np.testing.assert_allclose(
                np.asarray(linalg.tril_matmul(L, B)), np.asarray(L @ B),
                rtol=1e-12, atol=1e-9)
            np.testing.assert_allclose(
                np.asarray(linalg.tril_t_matmul(L, B)),
                np.asarray(jnp.swapaxes(L, -1, -2) @ B),
                rtol=1e-12, atol=1e-9)

    def test_blocked_forms_differentiable(self):
        A, L, _ = self._mats(512, n=7)

        def f(a, l):
            return jnp.sum(jnp.square(linalg.matmul_tril_t(a, jnp.tril(l))))

        ga, gl = jax.grad(f, argnums=(0, 1))(A, L)

        def f_dense(a, l):
            lt = jnp.tril(l)
            return jnp.sum(jnp.square(jnp.einsum("qnm,qkm->qnk", a, lt)))

        ga_d, gl_d = jax.grad(f_dense, argnums=(0, 1))(A, L)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_d),
                                   rtol=1e-10, atol=1e-9)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_d),
                                   rtol=1e-10, atol=1e-9)


def test_blocked_cholesky_inverse_matches_separate_kernels():
    """Fused (L, iL) == stock cholesky + triangular solve, incl. fallback."""
    rng = np.random.RandomState(11)
    for m in (256, 100):
        A = rng.randn(3, m, 2 * m)
        K = jnp.asarray(A @ A.transpose(0, 2, 1) / m + 3.0 * np.eye(m))
        L, iL = linalg.blocked_cholesky_inverse(K, nb=128)
        L_ref = np.linalg.cholesky(np.asarray(K))
        np.testing.assert_allclose(np.asarray(L), L_ref, atol=1e-9)
        for q in range(3):
            np.testing.assert_allclose(
                np.asarray(iL[q]) @ L_ref[q], np.eye(m), atol=1e-8)
        # iL is exactly lower triangular (zero blocks are structural)
        assert np.all(np.triu(np.asarray(iL), 1) == 0.0)


def test_quad_diag_forward_mode_and_upper_grad():
    """quad_diag supports jacfwd (custom_jvp, not custom_vjp) and its
    gradient w.r.t. strictly-upper L entries is exactly zero — consistent
    with the value function, which never reads them."""
    rng = np.random.RandomState(3)
    A = jnp.asarray(rng.randn(2, 5, 4))
    L0 = jnp.asarray(rng.randn(2, 4, 4))

    def f(l):
        return jnp.sum(linalg.quad_diag(A, jnp.tril(l)))

    np.testing.assert_allclose(np.asarray(jax.jacfwd(f)(L0)),
                               np.asarray(jax.grad(f)(L0)), atol=1e-10)
    g = jax.grad(lambda l: jnp.sum(linalg.quad_diag(A, l)))(L0)
    assert np.all(np.triu(np.asarray(g), 1) == 0.0)


def test_quad_diag_train_matches_quad_diag_and_grads():
    """quad_diag_train: identical values to quad_diag and identical
    reverse-mode gradients (its custom VJP computes the cotangents via
    structure-aware half-flop matmuls); t_matmul_tril_out == tril(A^T B)
    at blocked and unblocked sizes."""
    import jax

    rng = np.random.RandomState(0)
    for m in (8, 512):  # unblocked and blocked (_TRI_NB = 256)
        A = jnp.asarray(rng.randn(2, 24, m))
        B = jnp.asarray(rng.randn(2, 24, m))
        want = np.tril(np.einsum("qnm,qnk->qmk", np.asarray(A),
                                 np.asarray(B)))
        got = np.asarray(linalg.t_matmul_tril_out(A, B))
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert (np.triu(got, 1) == 0).all()

        L = jnp.asarray(np.tril(rng.randn(2, m, m)))
        v0 = np.asarray(linalg.quad_diag(A, L))
        v1 = np.asarray(linalg.quad_diag_train(A, L))
        np.testing.assert_allclose(v1, v0, atol=1e-12)

        w = jnp.asarray(rng.rand(2, 24))

        def f0(a, l):
            return jnp.sum(w * linalg.quad_diag(a, l))

        def f1(a, l):
            return jnp.sum(w * linalg.quad_diag_train(a, l))

        g0 = jax.grad(f0, argnums=(0, 1))(A, L)
        g1 = jax.grad(f1, argnums=(0, 1))(A, L)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   atol=1e-11)
        # quad_diag's JVP-transpose L-grad is already tril-masked; the
        # custom VJP must agree exactly on the lower triangle and be zero
        # above it
        np.testing.assert_allclose(np.asarray(g1[1]),
                                   np.asarray(jnp.tril(g0[1])), atol=1e-11)
        assert (np.triu(np.asarray(g1[1]), 1) == 0).all()


def test_logdet_from_chol_value_grad_and_no_scatter():
    """logdet_from_chol matches the jnp.diagonal formulation exactly AND
    its gradient program contains no gather/scatter: diagonal's strided
    gather has a scatter-add transpose that on TPU relays out the full
    (Q, M, M) cotangent five times per trainer step (docs/DESIGN.md §7k —
    the 737 -> 829 steps/s fix).  This pins the scatter-free lowering so a
    refactor back to jnp.diagonal fails here before it reaches a bench."""
    import re

    rng = np.random.RandomState(3)
    L = jnp.asarray(np.tril(rng.randn(4, 32, 32)) + 5.0 * np.eye(32),
                    jnp.float32)

    def old(Lq):
        d = jnp.diagonal(Lq, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(jnp.abs(d)), axis=-1)

    np.testing.assert_array_equal(np.asarray(linalg.logdet_from_chol(L)),
                                  np.asarray(old(L)))
    g_new = jax.grad(lambda x: jnp.sum(linalg.logdet_from_chol(x)))(L)
    g_old = jax.grad(lambda x: jnp.sum(old(x)))(L)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_old))

    # KL-shaped scalar: trace + logdet of tril(L), reverse mode
    def kl_like(x):
        Lq = jnp.tril(x)
        return (jnp.sum(jnp.square(Lq))
                - jnp.sum(linalg.logdet_from_chol(Lq)))

    txt = jax.jit(jax.grad(kl_like)).lower(L).compile().as_text()
    assert not re.findall(r"= \S+ (?:scatter|gather)\(", txt)
    # Honesty probe, not a guard: the jnp.diagonal form historically emits
    # gather/scatter (that lowering is what §7k removed).  If a future XLA
    # learns to rewrite it too, the library path above is still correct —
    # warn instead of failing the regression test (round-4 advisor).
    txt_old = jax.jit(
        jax.grad(lambda x: jnp.sum(jnp.square(jnp.tril(x)))
                 - jnp.sum(old(jnp.tril(x))))).lower(L).compile().as_text()
    if not re.findall(r"= \S+ (?:scatter|gather)\(", txt_old):
        import warnings
        warnings.warn(
            "XLA now lowers jnp.diagonal's VJP without gather/scatter; "
            "the logdet_from_chol custom path may no longer be needed")
