"""Binomial / ZeroInflatedPoisson / LogNormal / Weibull — likelihood families
beyond the reference's eight (and beyond its three stubs), each anchored to
(a) an independent NumPy logpdf, (b) the engine's GH identities, and (c) an
exact reduction to a reference-parity distribution at a boundary setting:
Binomial(n=1) == Bernoulli, Weibull(k=1) == Exponential, ZIP(pi -> 0) ==
Poisson, LogNormal's analytic var_exp == the generic quadrature engine.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as ssp

from hetmogp_tpu.likelihoods import (Bernoulli, Binomial, Exponential,
                                     LogNormal, Poisson, Weibull,
                                     ZeroInflatedPoisson)
from tests import oracle_numpy as oracle


def np_logpdf_binomial(F, y, n=5):
    p = np.clip(1.0 / (1.0 + np.exp(-F[:, 0])), 1e-9, 1 - 1e-9)
    return (ssp.gammaln(n + 1.0) - ssp.gammaln(y[:, 0] + 1.0)
            - ssp.gammaln(n - y[:, 0] + 1.0)
            + y[:, 0] * np.log(p) + (n - y[:, 0]) * np.log1p(-p))


def np_logpdf_zip(F, y):
    lam = np.clip(np.exp(F[:, 0]), 1e-9, 1e9)
    pi = np.clip(1.0 / (1.0 + np.exp(-F[:, 1])), 1e-9, 1 - 1e-9)
    pois = y[:, 0] * F[:, 0] - lam - ssp.gammaln(y[:, 0] + 1.0)
    zero = np.logaddexp(np.log(pi), np.log1p(-pi) - lam)
    return np.where(y[:, 0] == 0, zero, np.log1p(-pi) + pois)


def np_logpdf_lognormal(F, y, sigma=0.5):
    ly = np.log(y[:, 0])
    return (-ly - np.log(sigma) - 0.5 * np.log(2 * np.pi)
            - 0.5 * (ly - F[:, 0]) ** 2 / sigma ** 2)


def np_logpdf_weibull(F, y, k=1.5):
    b = np.clip(np.exp(-F[:, 0]), 1e-9, 1e9)
    return (np.log(k) - np.log(b) + (k - 1.0) * np.log(y[:, 0] / b)
            - (y[:, 0] / b) ** k)


CASES = [
    (Binomial(n=5), lambda F, y: np_logpdf_binomial(F, y, 5),
     lambda rng, n: rng.binomial(5, 0.4, (n, 1)).astype(float), 1, 20),
    (ZeroInflatedPoisson(),
     np_logpdf_zip,
     lambda rng, n: (rng.poisson(2.0, (n, 1))
                     * (rng.rand(n, 1) > 0.3)).astype(float), 2, 10),
    (LogNormal(sigma=0.5), np_logpdf_lognormal,
     lambda rng, n: np.exp(0.5 * rng.randn(n, 1)), 1, 20),
    (Weibull(k=1.5), np_logpdf_weibull,
     lambda rng, n: rng.weibull(1.5, (n, 1)) + 1e-3, 1, 20),
]
IDS = ["Binomial", "ZeroInflatedPoisson", "LogNormal", "Weibull"]


@pytest.mark.parametrize("lik,olp,gen,j,t", CASES, ids=IDS)
def test_logpdf_matches_numpy(lik, olp, gen, j, t):
    rng = np.random.RandomState(0)
    n = 11
    F = 0.7 * rng.randn(n, j)
    Y = gen(rng, n)
    got = np.asarray(lik.logpdf_batch(jnp.asarray(F), jnp.asarray(Y)))
    np.testing.assert_allclose(got, olp(F, Y), atol=1e-10)


@pytest.mark.parametrize("lik,olp,gen,j,t", CASES, ids=IDS)
def test_var_exp_matches_numpy_quadrature(lik, olp, gen, j, t):
    rng = np.random.RandomState(1)
    n = 7
    m = 0.5 * rng.randn(n, j)
    v = 0.4 * rng.rand(n, j) + 0.05
    Y = gen(rng, n)
    got = np.asarray(lik.var_exp(jnp.asarray(Y), jnp.asarray(m),
                                 jnp.asarray(v)))
    expect = oracle.gh_var_exp(olp, Y, m, v, t)
    np.testing.assert_allclose(got, expect, atol=1e-9)


@pytest.mark.parametrize("lik,olp,gen,j,t", CASES, ids=IDS)
def test_var_exp_derivative_identities(lik, olp, gen, j, t):
    """dm = d(ve)/dm and dv = 0.5 d^2(ve)/dm^2 hold exactly on GH grids
    (and exactly, not just to quadrature error, for the analytic LogNormal)."""
    rng = np.random.RandomState(2)
    n = 5
    m = 0.5 * rng.randn(n, j)
    v = 0.3 * rng.rand(n, j) + 0.1
    Y = jnp.asarray(gen(rng, n))
    dm, dv = jax.jit(lik.var_exp_derivatives)(Y, jnp.asarray(m),
                                              jnp.asarray(v))

    ve_j = jax.jit(lik.var_exp)
    h = 1e-5
    for d in range(j):
        mp, mm = m.copy(), m.copy()
        mp[:, d] += h
        mm[:, d] -= h
        vp = np.asarray(ve_j(Y, jnp.asarray(mp), jnp.asarray(v)))
        vm = np.asarray(ve_j(Y, jnp.asarray(mm), jnp.asarray(v)))
        v0 = np.asarray(ve_j(Y, jnp.asarray(m), jnp.asarray(v)))
        np.testing.assert_allclose(np.asarray(dm)[:, d], (vp - vm) / (2 * h),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(dv)[:, d],
                                   0.5 * (vp - 2 * v0 + vm) / h ** 2,
                                   atol=5e-4)


@pytest.mark.parametrize("lik,olp,gen,j,t", CASES, ids=IDS)
def test_predictive_and_sampler_moments(lik, olp, gen, j, t):
    """predictive shapes/finiteness + the sampler's empirical mean/variance
    at a fixed f match conditional_moments (law of the distribution)."""
    rng = np.random.RandomState(3)
    n = 8
    m = jnp.asarray(0.5 * rng.randn(n, j))
    v = jnp.asarray(0.3 * rng.rand(n, j) + 0.05)
    mp, vp = lik.predictive(m, v)
    assert mp.shape == (n, lik.dim_p) and vp.shape == (n, lik.dim_p)
    assert np.isfinite(np.asarray(mp)).all()
    assert (np.asarray(vp) > -1e-9).all()

    f0 = jnp.asarray([[0.4] * j])
    cm, cv = lik.conditional_moments(f0[0])
    S = 200_000
    s = np.asarray(lik.sample(jax.random.PRNGKey(0),
                              jnp.tile(f0, (S, 1))))[:, 0]
    np.testing.assert_allclose(s.mean(), float(cm[0]),
                               rtol=0.04, atol=0.01)
    np.testing.assert_allclose(s.var(), float(cv[0]), rtol=0.06, atol=0.01)


def test_binomial_n1_is_bernoulli():
    rng = np.random.RandomState(4)
    F = jnp.asarray(2.0 * rng.randn(13, 1))
    Y = jnp.asarray((rng.rand(13, 1) > 0.5).astype(float))
    b1 = Binomial(n=1)
    ber = Bernoulli()
    np.testing.assert_allclose(np.asarray(b1.logpdf_batch(F, Y)),
                               np.asarray(ber.logpdf_batch(F, Y)), atol=1e-12)
    m = jnp.asarray(0.5 * rng.randn(13, 1))
    v = jnp.asarray(0.3 * rng.rand(13, 1) + 0.05)
    np.testing.assert_allclose(np.asarray(b1.var_exp(Y, m, v)),
                               np.asarray(ber.var_exp(Y, m, v)), atol=1e-12)
    with pytest.raises(ValueError, match="positive integer"):
        Binomial(n=0)


def test_weibull_k1_is_exponential():
    rng = np.random.RandomState(5)
    F = jnp.asarray(rng.randn(13, 1))
    Y = jnp.asarray(rng.exponential(1.0, (13, 1)) + 1e-3)
    w1 = Weibull(k=1.0)
    ex = Exponential()
    np.testing.assert_allclose(np.asarray(w1.logpdf_batch(F, Y)),
                               np.asarray(ex.logpdf_batch(F, Y)), atol=1e-10)
    cmw, cvw = w1.conditional_moments(jnp.asarray([0.3]))
    cme, cve = ex.conditional_moments(jnp.asarray([0.3]))
    np.testing.assert_allclose(float(cmw[0]), float(cme[0]), rtol=1e-9)
    np.testing.assert_allclose(float(cvw[0]), float(cve[0]), rtol=1e-9)
    with pytest.raises(ValueError, match="k must be"):
        Weibull(k=0.0)


def test_zip_pi0_is_poisson():
    """f2 -> -inf turns the inflation off; the ZIP logpdf collapses to the
    plain Poisson on every count (including zeros)."""
    rng = np.random.RandomState(6)
    n = 15
    f1 = 0.5 * rng.randn(n, 1)
    F = jnp.asarray(np.concatenate([f1, np.full((n, 1), -30.0)], axis=1))
    Y = jnp.asarray(rng.poisson(1.0, (n, 1)).astype(float))
    zip_lp = np.asarray(ZeroInflatedPoisson().logpdf_batch(F, Y))
    poi_lp = np.asarray(Poisson().logpdf_batch(jnp.asarray(f1), Y))
    np.testing.assert_allclose(zip_lp, poi_lp, atol=1e-8)


def test_zip_zero_mass():
    """P(y=0) = pi + (1-pi) e^{-lam} exactly, and the sampler reproduces it."""
    lam, pi_logit = 1.2, 0.5
    pi = 1.0 / (1.0 + np.exp(-pi_logit))
    want = pi + (1.0 - pi) * np.exp(-lam)
    lik = ZeroInflatedPoisson()
    lp0 = float(lik.logpdf(jnp.asarray([np.log(lam), pi_logit]),
                           jnp.asarray([0.0])))
    np.testing.assert_allclose(np.exp(lp0), want, rtol=1e-9)
    S = 200_000
    F = jnp.tile(jnp.asarray([[np.log(lam), pi_logit]]), (S, 1))
    s = np.asarray(lik.sample(jax.random.PRNGKey(2), F))
    np.testing.assert_allclose((s == 0).mean(), want, atol=0.01)


def test_lognormal_analytic_var_exp_matches_engine():
    """The analytic override equals the generic GH engine run on the same
    logpdf — and stays analytic (exactly differentiable) through theta."""
    from hetmogp_tpu.ops import quadrature

    lik = LogNormal(sigma=0.7)
    rng = np.random.RandomState(7)
    n = 9
    Y = jnp.asarray(np.exp(0.5 * rng.randn(n, 1)))
    m = jnp.asarray(0.5 * rng.randn(n, 1))
    v = jnp.asarray(0.3 * rng.rand(n, 1) + 0.05)
    engine = quadrature.make_var_exp(lik.logpdf, J=1, T=30)
    np.testing.assert_allclose(np.asarray(lik.var_exp(Y, m, v)),
                               np.asarray(engine(Y, m, v)), atol=1e-9)
    # theta path: var_exp(theta) equals a fresh instance at that sigma
    th = jnp.asarray([np.log(0.33)])
    np.testing.assert_allclose(
        np.asarray(LogNormal(sigma=0.7, learn_sigma=True).var_exp(Y, m, v, th)),
        np.asarray(LogNormal(sigma=0.33).var_exp(Y, m, v)), atol=1e-12)
    assert abs(lik.with_theta(np.log([0.9])).sigma - 0.9) < 1e-12
    with pytest.raises(ValueError, match="sigma must be"):
        LogNormal(sigma=-0.1)


def test_lognormal_predictive_closed_form_matches_mc():
    lik = LogNormal(sigma=0.4)
    m = jnp.asarray([[0.2]])
    v = jnp.asarray([[0.3]])
    mp, vp = lik.predictive(m, v)
    # MC over f ~ N(m, v), y ~ LogNormal(f, sigma)
    key = jax.random.PRNGKey(3)
    S = 400_000
    f = 0.2 + np.sqrt(0.3) * np.asarray(jax.random.normal(key, (S, 1)))
    s = np.asarray(lik.sample(jax.random.PRNGKey(4), jnp.asarray(f)))
    np.testing.assert_allclose(float(mp[0, 0]), s.mean(), rtol=0.02)
    np.testing.assert_allclose(float(vp[0, 0]), s.var(), rtol=0.06)


def test_weibull_learn_k_theta_path():
    """logpdf_t at theta = [log k'] equals a fresh instance at k'."""
    rng = np.random.RandomState(8)
    F = jnp.asarray(0.5 * rng.randn(7, 1))
    Y = jnp.asarray(rng.weibull(2.0, (7, 1)) + 1e-3)
    lik = Weibull(k=1.5, learn_k=True)
    assert lik.n_theta == 1
    th = jnp.asarray([np.log(2.2)])
    got = np.asarray(jax.vmap(lambda f, y: lik.logpdf_t(f, y, th))(F, Y))
    want = np.asarray(Weibull(k=2.2).logpdf_batch(F, Y))
    np.testing.assert_allclose(got, want, atol=1e-12)
    m = jnp.asarray(0.3 * rng.randn(7, 1))
    v = jnp.asarray(0.2 * rng.rand(7, 1) + 0.05)
    np.testing.assert_allclose(
        np.asarray(lik.var_exp(Y, m, v, th)),
        np.asarray(Weibull(k=2.2).var_exp(Y, m, v)), atol=1e-10)
    assert abs(lik.with_theta(np.log([2.2])).k - 2.2) < 1e-12


def test_mixed_new_likelihoods_in_model():
    """A 3-task model mixing ZIP (dim_f=2), Binomial, and LogNormal trains
    end-to-end and predicts finitely — the heterogeneous dispatcher handles
    the new families like any reference ones."""
    from hetmogp_tpu import ModelConfig, SVMOGP, TrainConfig

    rng = np.random.RandomState(9)
    n = 40
    Xs = [np.sort(rng.rand(n, 1), 0) for _ in range(3)]
    Y_zip = (rng.poisson(2.0, (n, 1)) * (rng.rand(n, 1) > 0.3)).astype(float)
    Y_bin = rng.binomial(4, 0.4, (n, 1)).astype(float)
    Y_ln = np.exp(0.4 * rng.randn(n, 1))
    cfg = ModelConfig(
        likelihoods=(ZeroInflatedPoisson(), Binomial(n=4), LogNormal()),
        num_latent=2, num_inducing=6, input_dim=1, dtype="float64")
    model = SVMOGP(cfg, Xs, [Y_zip, Y_bin, Y_ln],
                   np.linspace(0, 1, 6)[:, None],
                   key=jax.random.PRNGKey(0), lengthscale=0.3)
    e0 = model.log_likelihood()
    model.fit_svi(batch_size=20, num_steps=30,
                  train_config=TrainConfig(optimizer="adam", step_rate=0.05))
    assert model.log_likelihood() > e0
    mp, vp = model.predictive(Xs)
    for m_t, v_t in zip(mp, vp):
        assert np.isfinite(np.asarray(m_t)).all()
        assert (np.asarray(v_t) > -1e-9).all()
