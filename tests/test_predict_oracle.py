"""Oracle tests for every public prediction entry point.

Round-1 left the prediction paths validated only behaviorally; here each one
is checked against the NumPy re-derivation of the reference equations:

* ``predict_f_projected`` vs the GPy-Posterior Woodbury projection
  (reference svmogp.py:255-278: woodbury_vector/woodbury_inv/Kx/|var|),
  whitened and un-whitened.
* observation-space ``predictive`` vs GH law-of-total-variance moments
  (reference het_likelihood.py:133-148).
* Monte-Carlo log-predictive / NLPD vs the reference formula
  (het_likelihood.py:150-164, incl. the 1/num_samples scaling quirk),
  with shared injected normal draws so the comparison is exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import likelihoods as L
from hetmogp_tpu.config import ModelConfig
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models import predict as predict_mod
from hetmogp_tpu.models.params import SVMOGPParams
from tests import oracle_numpy as oracle


def _setup(seed=0, M=6, Q=2):
    rng = np.random.RandomState(seed)
    liks = (L.Gaussian(sigma=0.6), L.HetGaussian(), L.Bernoulli())
    D = 4  # 1 + 2 + 1
    Z = np.linspace(0, 1, M)[None, :, None] + 0.02 * rng.randn(Q, M, 1)
    W = rng.randn(Q, D)
    ls = 0.15 + 0.1 * rng.rand(Q, 1)
    var = 0.5 + rng.rand(Q)
    m_u = rng.randn(Q, M)
    L_u = np.tril(0.3 * rng.randn(Q, M, M)) + np.eye(M)[None]
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, whiten=False, dtype="float64")
    params = SVMOGPParams(
        Z=jnp.asarray(Z), q_mu=jnp.asarray(m_u), q_sqrt=jnp.asarray(L_u),
        log_lengthscale=jnp.log(jnp.asarray(ls)),
        log_variance=jnp.log(jnp.asarray(var)),
        W=jnp.asarray(W), kappa=jnp.zeros((Q, D)))
    oa = dict(Z=Z, W=W, kappa=np.zeros((Q, D)), lengthscales=ls,
              variances=var, m_u=m_u, L_u=L_u)
    return cfg, params, oa


def _whitened_copy(cfg, params):
    cfg_w = dataclasses.replace(cfg, whiten=True)
    # whiten the SAME posterior: v-space params such that u = Luu v
    p_w = elbo_mod.whiten_params(params, cfg)
    return cfg_w, p_w


def test_projected_prediction_matches_woodbury_oracle():
    cfg, params, oa = _setup()
    rng = np.random.RandomState(5)
    # small, well-separated training sets keep the N x N prior Gram the
    # projection inverts well-conditioned (near-coincident or many points
    # make it numerically singular — at N=20 random cond ~1e17 and the
    # reference path itself returns roundoff noise)
    Xtrain = [np.linspace(0, 1, 8)[:, None] + 0.01 * rng.randn(8, 1),
              np.linspace(0, 1, 7)[:, None] + 0.01 * rng.randn(7, 1),
              np.linspace(0, 1, 8)[:, None] + 0.01 * rng.randn(8, 1)]
    Xnew = rng.rand(11, 1)
    cfg_w, params_w = _whitened_copy(cfg, params)
    for d in range(cfg.num_output_functions):
        t = cfg.function_index[d]
        em, ev = oracle.raw_predict_f(
            Xtrain[t], Xnew, oa["Z"], oa["W"], oa["kappa"],
            oa["lengthscales"], oa["variances"], oa["m_u"], oa["L_u"], d)
        for c, p in ((cfg, params), (cfg_w, params_w)):
            m, v = predict_mod.predict_f_projected(p, c, Xtrain, Xnew, d)
            np.testing.assert_allclose(np.asarray(m), em, atol=1e-8,
                                       err_msg=f"mean d={d} whiten={c.whiten}")
            np.testing.assert_allclose(np.asarray(v), ev, atol=1e-8,
                                       err_msg=f"var d={d} whiten={c.whiten}")


def test_predict_f_stochastic_minibatch_anchor_matches_oracle():
    """predict_f_stochastic (reference _raw_predict_stochastic,
    svmogp.py:308-331 — char-for-char identical to _raw_predict_f there):
    with the full anchors it equals predict_f_projected; with a MINIBATCH
    anchor it matches the Woodbury oracle evaluated on that anchor set."""
    cfg, params, oa = _setup(seed=3)
    rng = np.random.RandomState(8)
    Xtrain = [np.linspace(0, 1, 8)[:, None] + 0.01 * rng.randn(8, 1),
              np.linspace(0, 1, 7)[:, None] + 0.01 * rng.randn(7, 1),
              np.linspace(0, 1, 8)[:, None] + 0.01 * rng.randn(8, 1)]
    Xbatch = [x[::2] for x in Xtrain]  # the "current minibatch" anchors
    Xnew = rng.rand(9, 1)
    for d in range(cfg.num_output_functions):
        t = cfg.function_index[d]
        # full anchors == the projected path (reference: identical methods)
        m0, v0 = predict_mod.predict_f_projected(params, cfg, Xtrain, Xnew, d)
        m1, v1 = predict_mod.predict_f_stochastic(params, cfg, Xtrain, Xnew, d)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
        # minibatch anchors == oracle on the batch anchor set
        em, ev = oracle.raw_predict_f(
            Xbatch[t], Xnew, oa["Z"], oa["W"], oa["kappa"],
            oa["lengthscales"], oa["variances"], oa["m_u"], oa["L_u"], d)
        mb, vb = predict_mod.predict_f_stochastic(params, cfg, Xbatch, Xnew, d)
        np.testing.assert_allclose(np.asarray(mb), em, atol=1e-8)
        np.testing.assert_allclose(np.asarray(vb), ev, atol=1e-8)


def test_observation_space_predictive_matches_oracle():
    """predictive() == oracle qf_moments -> GH law-of-total-variance, per
    likelihood (analytic Gaussian, 2-D-grid HetGaussian, GH Bernoulli)."""
    cfg, params, oa = _setup()
    rng = np.random.RandomState(6)
    X_list = [rng.rand(9, 1), rng.rand(8, 1), rng.rand(7, 1)]
    m_pred, v_pred = predict_mod.predictive(params, cfg, X_list)

    def moments(t, dim_f, d0):
        mF = np.stack([oracle.qf_moments(X_list[t], oa["Z"], oa["W"],
                                         oa["kappa"], oa["lengthscales"],
                                         oa["variances"], oa["m_u"],
                                         oa["L_u"], d0 + j)[0]
                       for j in range(dim_f)], -1)
        vF = np.stack([oracle.qf_moments(X_list[t], oa["Z"], oa["W"],
                                         oa["kappa"], oa["lengthscales"],
                                         oa["variances"], oa["m_u"],
                                         oa["L_u"], d0 + j)[1]
                       for j in range(dim_f)], -1)
        return mF, vF

    # task 0: Gaussian — analytic (m, sigma^2 + v), reference gaussian.py:64-67
    mF, vF = moments(0, 1, 0)
    np.testing.assert_allclose(np.asarray(m_pred[0]), mF, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_pred[0]), 0.6 ** 2 + vF, atol=1e-9)

    # task 1: HetGaussian — GH over (f1, f2), cond moments (f1, e^{f2})
    mF, vF = moments(1, 2, 1)
    em, ev = oracle.gh_predictive(
        lambda F: (F[:, :1], np.exp(F[:, 1:2])), mF, vF, T=20)
    np.testing.assert_allclose(np.asarray(m_pred[1]), em, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_pred[1]), ev, atol=1e-9)

    # task 2: Bernoulli — GH over f, cond moments (p, p(1-p))
    mF, vF = moments(2, 1, 3)

    def bern_moments(F):
        p = np.clip(np.exp(F) / (1 + np.exp(F)), 1e-9, 1 - 1e-9)
        return p, p * (1 - p)

    em, ev = oracle.gh_predictive(bern_moments, mF, vF, T=20)
    np.testing.assert_allclose(np.asarray(m_pred[2]), em, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_pred[2]), ev, atol=1e-9)


def test_nlpd_matches_oracle_with_shared_draws():
    """Per-likelihood MC log-predictive equals the reference formula
    (logsumexp average + the 1/S scaling quirk) given identical draws, and
    with reference_scaling=False the plain sum."""
    rng = np.random.RandomState(7)
    n, S = 12, 64
    cases = [
        (L.Gaussian(sigma=0.6), oracle.logpdf_gaussian, 1,
         rng.randn(n, 1)),
        (L.HetGaussian(), oracle.logpdf_hetgaussian, 2, rng.randn(n, 1)),
        (L.Bernoulli(), oracle.logpdf_bernoulli, 1,
         (rng.rand(n, 1) > 0.5).astype(float)),
        (L.Poisson(), oracle.logpdf_poisson, 1,
         rng.poisson(2.0, (n, 1)).astype(float)),
    ]
    for lik, olp, J, Y in cases:
        M_ = 0.5 * rng.randn(n, J)
        V_ = 0.1 + 0.3 * rng.rand(n, J)
        eps = rng.randn(n, S, J)
        for scaling in (True, False):
            got = lik.log_predictive(jax.random.PRNGKey(0), jnp.asarray(Y),
                                     jnp.asarray(M_), jnp.asarray(V_), S,
                                     reference_scaling=scaling, eps=eps)
            want = oracle.mc_log_predictive(olp, eps, Y, M_, V_,
                                            reference_scaling=scaling)
            np.testing.assert_allclose(float(got), want, rtol=1e-10,
                                       err_msg=f"{type(lik).__name__}")
