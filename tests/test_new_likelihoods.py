"""Student-t / Ordinal / Dirichlet — full implementations of the
distributions the reference only stubbed ("to be released", README.md:8).

No reference equations exist, so the oracle here is an independent NumPy
logpdf + the engine's own exactness identities:
  dm VE = d/dm of the quadrature sum (exact identity),
  dv VE = 0.5 d^2/dm^2 of the quadrature sum (exact identity for GH grids).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as ssp

from hetmogp_tpu.likelihoods import (Dirichlet, NegativeBinomial, Ordinal,
                                     StudentT)
from tests import oracle_numpy as oracle


def np_logpdf_student(F, y, df=4.0):
    scale = np.exp(F[:, 1])
    r = (y[:, 0] - F[:, 0]) / scale
    return (ssp.gammaln((df + 1) / 2) - ssp.gammaln(df / 2)
            - 0.5 * np.log(df * np.pi) - F[:, 1]
            - (df + 1) / 2 * np.log1p(r ** 2 / df))


def np_logpdf_ordinal(F, y, K=3):
    b = np.linspace(-(K - 2) / 2, (K - 2) / 2, K - 1)
    cdf = 1 / (1 + np.exp(-(b[None, :] - F)))
    cdf = np.concatenate([np.zeros((F.shape[0], 1)), cdf,
                          np.ones((F.shape[0], 1))], axis=1)
    p = np.clip(np.diff(cdf, axis=1), 1e-9, 1.0)
    out = np.zeros(F.shape[0])
    for k in range(K):
        out += (y[:, 0] == k + 1) * np.log(p[:, k])
    return out


def np_logpdf_dirichlet(F, y):
    a = np.clip(np.exp(F), 1e-9, 1e9)
    return (ssp.gammaln(a.sum(1)) - ssp.gammaln(a).sum(1)
            + ((a - 1) * np.log(y)).sum(1))


def _simplex(rng, n, K):
    g = rng.gamma(2.0, 1.0, (n, K))
    return g / g.sum(1, keepdims=True)


def np_logpdf_negbin(F, y, r=2.0):
    mu = np.clip(np.exp(F[:, 0]), 1e-9, 1e9)
    return (ssp.gammaln(y[:, 0] + r) - ssp.gammaln(r)
            - ssp.gammaln(y[:, 0] + 1.0)
            + r * np.log(r / (r + mu)) + y[:, 0] * np.log(mu / (r + mu)))


CASES = [
    (StudentT(df=4.0), np_logpdf_student,
     lambda rng, n: rng.randn(n, 1), 2, 20),
    (NegativeBinomial(r=2.0), np_logpdf_negbin,
     lambda rng, n: rng.poisson(2.0, (n, 1)).astype(float), 1, 20),
    (Ordinal(K=4), lambda F, y: np_logpdf_ordinal(F, y, 4),
     lambda rng, n: rng.randint(1, 5, (n, 1)).astype(float), 1, 20),
    # analytic=False pins the tensor-grid ENGINE against the NumPy grid
    # oracle (the default analytic reduction is pinned separately in
    # test_analytic_var_exp.py::test_dirichlet_analytic_reduction)
    (Dirichlet(K=3, analytic=False), np_logpdf_dirichlet,
     lambda rng, n: _simplex(rng, n, 3), 3, 5),
]
IDS = ["StudentT", "NegativeBinomial", "Ordinal", "Dirichlet"]


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
    got = np.asarray(lik.var_exp(jnp.asarray(Y), jnp.asarray(m), jnp.asarray(v)))
    expect = oracle.gh_var_exp(olp, Y, m, v, t)
    np.testing.assert_allclose(got, expect, atol=1e-9)


@pytest.mark.parametrize("lik,olp,gen,j,t", CASES, ids=IDS)
def test_var_exp_derivative_identities(lik, olp, gen, j, t):
    """dm = d(ve)/dm and dv = 0.5 d^2(ve)/dm^2 hold exactly on GH grids."""
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
def test_predictive_and_samples(lik, olp, gen, j, t):
    rng = np.random.RandomState(3)
    n = 8
    m = jnp.asarray(0.5 * rng.randn(n, j))
    v = jnp.asarray(0.3 * rng.rand(n, j) + 0.05)
    mp, vp = lik.predictive(m, v)
    assert mp.shape == (n, lik.dim_p) and vp.shape == (n, lik.dim_p)
    assert np.isfinite(np.asarray(mp)).all()
    assert (np.asarray(vp) > -1e-9).all()
    s = lik.sample(jax.random.PRNGKey(0), jnp.asarray(0.3 * rng.randn(n, j)))
    assert s.shape == (n, lik.dim_y)


def test_ordinal_probs_sum_to_one():
    lik = Ordinal(K=5)
    f = jnp.asarray([0.3])
    p = lik._class_probs(f)
    np.testing.assert_allclose(float(jnp.sum(p)), 1.0, atol=1e-9)
    assert (np.asarray(p) > 0).all()


def test_dirichlet_predictive_mean_on_simplex():
    lik = Dirichlet(K=3)
    rng = np.random.RandomState(4)
    m = jnp.asarray(0.4 * rng.randn(6, 3))
    v = jnp.asarray(0.2 * rng.rand(6, 3) + 0.05)
    mp, _ = lik.predictive(m, v)
    np.testing.assert_allclose(np.asarray(mp).sum(1), 1.0, atol=1e-8)


def test_student_in_model():
    """StudentT slots into the full model like any other likelihood."""
    from hetmogp_tpu import ModelConfig, SVMOGP, TrainConfig

    rng = np.random.RandomState(5)
    n = 50
    X = np.sort(rng.rand(n, 1), 0)
    Y = np.sin(5 * X) + 0.2 * rng.standard_t(4.0, (n, 1))
    cfg = ModelConfig(likelihoods=(StudentT(df=4.0),), num_latent=2,
                      num_inducing=6, input_dim=1, dtype="float64")
    model = SVMOGP(cfg, [X], [Y], np.linspace(0, 1, 6)[:, None],
                   key=jax.random.PRNGKey(0), lengthscale=0.3)
    e0 = model.log_likelihood()
    model.fit_svi(batch_size=25, num_steps=40,
                  train_config=TrainConfig(optimizer="adam", step_rate=0.05))
    assert model.log_likelihood() > e0


def test_dirichlet_predictive_scales_with_K():
    """T_pred follows the K-scaled node count (no 20^K grid), and the
    mc_samples escape hatch keeps K=8 predictive cheap."""
    lik3 = Dirichlet(K=3)
    assert lik3.T_pred == lik3.T_var_exp == 5  # 125 nodes, not 8000
    n = 4
    rng = np.random.RandomState(0)
    M = jnp.asarray(rng.randn(n, 3) * 0.3)
    V = jnp.asarray(rng.rand(n, 3) * 0.2 + 0.05)
    mp, vp = lik3.predictive(M, V)
    assert np.isfinite(mp).all() and (np.asarray(vp) >= 0).all()
    np.testing.assert_allclose(np.asarray(mp).sum(-1), 1.0, atol=1e-6)

    lik8 = Dirichlet(K=8, mc_samples=64)
    M8 = jnp.asarray(rng.randn(n, 8) * 0.3)
    V8 = jnp.asarray(rng.rand(n, 8) * 0.2 + 0.05)
    mp8, vp8 = lik8.predictive(M8, V8)  # 64 nodes, not 5^8=390k
    assert mp8.shape == (n, 8) and np.isfinite(mp8).all()
    np.testing.assert_allclose(np.asarray(mp8).sum(-1), 1.0, atol=1e-3)


def test_negbinomial_poisson_limit_and_overdispersion():
    """NB2 sanity: r -> inf recovers the Poisson logpdf; at finite r the
    sampler's variance matches mu + mu^2/r (overdispersed), and
    conditional_moments agree."""
    from hetmogp_tpu.likelihoods import Poisson

    rng = np.random.RandomState(0)
    F = jnp.asarray(0.5 * rng.randn(9, 1))
    Y = jnp.asarray(rng.poisson(2.0, (9, 1)).astype(float))
    big = NegativeBinomial(r=1e7)
    pois = Poisson()
    np.testing.assert_allclose(np.asarray(big.logpdf_batch(F, Y)),
                               np.asarray(pois.logpdf_batch(F, Y)),
                               atol=1e-5)

    lik = NegativeBinomial(r=1.5)
    mu = 3.0
    Fs = jnp.full((200_000, 1), np.log(mu))
    s = np.asarray(lik.sample(jax.random.PRNGKey(1), Fs))
    want_var = mu + mu ** 2 / 1.5
    assert abs(s.mean() - mu) < 0.05 * mu
    assert abs(s.var() - want_var) < 0.05 * want_var
    cm, cv = lik.conditional_moments(jnp.asarray([np.log(mu)]))
    np.testing.assert_allclose(float(cm[0]), mu, rtol=1e-6)
    np.testing.assert_allclose(float(cv[0]), want_var, rtol=1e-6)

    import pytest

    with pytest.raises(ValueError, match="r must be"):
        NegativeBinomial(r=-1.0)


def test_negbinomial_learn_r_end_to_end():
    """learn_r=True: theta = [log r] trains through the theta machinery on
    overdispersed counts and moves a mis-specified dispersion toward the
    truth; with_theta bakes it for prediction."""
    from hetmogp_tpu.config import ModelConfig, TrainConfig
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params

    lik = NegativeBinomial(r=50.0, learn_r=True)  # truth is r=1.5
    assert lik.n_theta == 1
    assert abs(lik.with_theta(np.log([3.0])).r - 3.0) < 1e-12
    rng = np.random.RandomState(4)
    n, M, Q = 150, 6, 1
    cfg = ModelConfig(likelihoods=(lik,), num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64")
    X = np.sort(rng.rand(n, 1), 0)
    f_true = np.log(3.0) + 0.5 * np.sin(4 * X)
    true = NegativeBinomial(r=1.5)
    Y = np.asarray(true.sample(jax.random.PRNGKey(0), jnp.asarray(f_true)))
    params = init_params(jax.random.PRNGKey(1), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=0.3, with_lik_theta=True)
    data, scales = full_batch([X], [Y], dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    tc = TrainConfig(optimizer="adam", step_rate=0.05, learn_lik_params=True)
    step = train_mod.make_svi_step(cfg, tc, vem=False)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt)
    e0 = None
    for _ in range(300):
        state, m = step(state, data, scales)
        e0 = float(m["elbo"]) if e0 is None else e0
    assert float(m["elbo"]) > e0
    r_learned = float(np.exp(np.asarray(state.params.lik_theta[0])[0]))
    assert r_learned < 25.0  # moved decisively off the r=50 init
    cfg2 = cfg.with_trained_likelihoods(state.params)
    assert abs(cfg2.likelihoods[0].r - r_learned) < 1e-9
