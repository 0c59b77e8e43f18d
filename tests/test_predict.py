"""Prediction paths vs the NumPy oracle + reference-semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import likelihoods as L
from hetmogp_tpu.config import ModelConfig
from hetmogp_tpu.models import predict as predict_mod
from hetmogp_tpu.models.params import SVMOGPParams
from hetmogp_tpu.models.svmogp import SVMOGP
from tests import oracle_numpy as oracle


def _setup(seed=0, M=6, Q=2):
    rng = np.random.RandomState(seed)
    liks = (L.Gaussian(sigma=0.6), L.Bernoulli())
    D = 2
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


def test_predict_f_matches_oracle_qf_moments():
    """predictive_new semantics == q(f_d) moments at Xnew (the reference's
    Woodbury round-trip is the identity; svmogp.py:280-306)."""
    cfg, params, oa = _setup()
    rng = np.random.RandomState(3)
    Xnew = rng.rand(15, 1)
    for d in range(2):
        m, v = predict_mod.predict_f(params, cfg, Xnew, d)
        em, ev = oracle.qf_moments(Xnew, oa["Z"], oa["W"], oa["kappa"],
                                   oa["lengthscales"], oa["variances"],
                                   oa["m_u"], oa["L_u"], d)
        np.testing.assert_allclose(np.asarray(m), em, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v), ev, atol=1e-9)


def test_predict_latent_u_prior_limit():
    """With q(u) = prior (m=0, S=Kuu in unwhitened coords), the latent-u
    posterior at any X must reduce to the prior: mean 0, var = Kdiag."""
    cfg, params, oa = _setup()
    Q, M = 2, 6
    _, Luu, _ = oracle.latent_funs_cov(oa["Z"], oa["lengthscales"],
                                       oa["variances"])
    params_prior = params.replace(q_mu=jnp.zeros((Q, M)),
                                  q_sqrt=jnp.asarray(Luu))
    Xnew = np.random.RandomState(4).rand(9, 1)
    mean, var = predict_mod.predict_latent_u(params_prior, cfg, Xnew)
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var),
                               np.tile(oa["variances"][None, :], (9, 1)),
                               atol=1e-9)


def test_whitened_predictions_match_unwhitened():
    import dataclasses

    from hetmogp_tpu.models import elbo as elbo_mod

    cfg, params, oa = _setup()
    cfg_w = dataclasses.replace(cfg, whiten=True)
    params_w = elbo_mod.whiten_params(params, cfg)
    Xnew = np.random.RandomState(5).rand(11, 1)
    for d in range(2):
        m_u_, v_u_ = predict_mod.predict_f(params, cfg, Xnew, d)
        m_w, v_w = predict_mod.predict_f(params_w, cfg_w, Xnew, d)
        np.testing.assert_allclose(np.asarray(m_w), np.asarray(m_u_), atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_u_), atol=1e-9)


def test_model_class_end_to_end_api():
    rng = np.random.RandomState(6)
    n = 40
    X_list = [np.sort(rng.rand(n, 1), 0), np.sort(rng.rand(n, 1), 0)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) < 0.5).astype(float)]
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=0.6), L.Bernoulli()),
                      num_latent=2, num_inducing=6, input_dim=1,
                      dtype="float64")
    model = SVMOGP(cfg, X_list, Y_list, np.linspace(0, 1, 6)[:, None],
                   key=jax.random.PRNGKey(0), lengthscale=0.3)
    assert np.isfinite(model.log_likelihood())

    md = model.Y_metadata
    np.testing.assert_array_equal(md["function_index"], [0, 1])

    Xp = np.linspace(0, 1, 20)[:, None]
    m, v = model.predictive_new(Xp, output_function_ind=1)
    assert m.shape == (20, 1) and (v >= 0).all()

    mp, vp = model.predictive([Xp, Xp])
    assert mp[0].shape == (20, 1) and mp[1].shape == (20, 1)
    # Gaussian observation variance >= sigma^2
    assert (np.asarray(vp[0]) >= 0.6 ** 2 - 1e-9).all()

    nlpd = model.negative_log_predictive([Xp, Xp],
                                         [np.zeros((20, 1)),
                                          np.ones((20, 1))], num_samples=64)
    assert np.isfinite(nlpd)

    mu, vu = model.predict_u(Xp)
    assert mu.shape == (20, 2) and (vu >= 0).all()


def test_projected_prediction_identity_at_training_inputs():
    """Projecting the training-input posterior back onto the SAME inputs is
    the identity (Kx = K), so predict_f_projected must reduce to the direct
    q(f_d) moments with the full-covariance diagonal."""
    cfg, params, oa = _setup()
    rng = np.random.RandomState(7)
    X = rng.rand(12, 1)
    for d in range(2):
        m_dir, v_dir = predict_mod.predict_f(params, cfg, X, d)
        m_prj, v_prj = predict_mod.predict_f_projected(params, cfg,
                                                       [X, X], X, d)
        np.testing.assert_allclose(np.asarray(m_prj), np.asarray(m_dir),
                                   atol=1e-7)
        # projected variance includes the full-cov diagonal == direct diag
        np.testing.assert_allclose(np.asarray(v_prj), np.asarray(v_dir),
                                   atol=1e-6)


def test_projected_prediction_whiten_consistency():
    import dataclasses

    from hetmogp_tpu.models import elbo as elbo_mod

    cfg, params, oa = _setup()
    cfg_w = dataclasses.replace(cfg, whiten=True)
    params_w = elbo_mod.whiten_params(params, cfg)
    rng = np.random.RandomState(8)
    Xtr = [rng.rand(10, 1), rng.rand(9, 1)]
    Xs = rng.rand(6, 1)
    for d in range(2):
        m_u_, v_u_ = predict_mod.predict_f_projected(params, cfg, Xtr, Xs, d)
        m_w, v_w = predict_mod.predict_f_projected(params_w, cfg_w, Xtr, Xs, d)
        np.testing.assert_allclose(np.asarray(m_w), np.asarray(m_u_), atol=1e-7)
        np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_u_), atol=1e-7)


def test_model_validation_errors():
    import pytest

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(L.Gaussian(), L.Bernoulli()), num_latent=2,
                      num_inducing=4, input_dim=1, dtype="float64")
    X = [rng.rand(5, 1), rng.rand(4, 1)]
    Y = [rng.randn(5, 1), rng.randn(4, 1)]
    Z = np.linspace(0, 1, 4)[:, None]

    with pytest.raises(ValueError, match="one per task"):
        SVMOGP(cfg, X[:1], Y, Z, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="input_dim"):
        SVMOGP(cfg, [rng.rand(5, 2), X[1]], Y, Z, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="rows but Y"):
        SVMOGP(cfg, X, [Y[0][:3], Y[1]], Z, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_inducing"):
        SVMOGP(cfg, X, Y, np.linspace(0, 1, 8).reshape(4, 2),
               key=jax.random.PRNGKey(0))


def test_full_cov_diag_matches_marginal_var():
    """diag(full posterior covariance) == marginal variances, for latent u
    and every output f_d, in both parameterizations."""
    import dataclasses

    for whiten in (False, True):
        cfg, params, _ = _setup()
        cfg = dataclasses.replace(cfg, whiten=whiten)
        rng = np.random.RandomState(7)
        Xnew = rng.rand(12, 1)

        mean, cov = predict_mod.predict_latent_u(params, cfg, Xnew,
                                                 full_cov=True)
        mean_d, var_d = predict_mod.predict_latent_u(params, cfg, Xnew)
        assert cov.shape == (cfg.num_latent, 12, 12)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_d),
                                   atol=1e-10)
        for q in range(cfg.num_latent):
            c = np.asarray(cov[q])
            np.testing.assert_allclose(c, c.T, atol=1e-10)  # symmetric
            np.testing.assert_allclose(np.diag(c), np.asarray(var_d[:, q]),
                                       atol=1e-9)
            assert np.linalg.eigvalsh(c).min() > -1e-8  # PSD up to roundoff

        for d in range(cfg.num_output_functions):
            m_f, cov_f = predict_mod.predict_f(params, cfg, Xnew, d,
                                               full_cov=True)
            m_d, v_d = predict_mod.predict_f(params, cfg, Xnew, d)
            assert cov_f.shape == (12, 12)
            np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_d),
                                       atol=1e-10)
            np.testing.assert_allclose(np.diag(np.asarray(cov_f)),
                                       np.asarray(v_d), atol=1e-9)


def test_sample_f_moments_match_full_cov():
    """Correlated f samples have the full-cov mean/covariance (MC check)."""
    cfg, params, _ = _setup()
    Xnew = np.linspace(0, 1, 10)[:, None]
    mu, cov = predict_mod.predict_f(params, cfg, Xnew, 0, full_cov=True)
    S = predict_mod.sample_f(params, cfg, jax.random.PRNGKey(0), Xnew, 0,
                             num_samples=20000)
    assert S.shape == (20000, 10)
    emp_mu = np.asarray(S).mean(0)
    emp_cov = np.cov(np.asarray(S).T)
    np.testing.assert_allclose(emp_mu, np.asarray(mu), atol=0.05)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.05)


def test_prediction_input_validation():
    """Mis-shaped Xnew must raise, not silently broadcast (the kernels
    broadcast a wrong column count into finite-but-wrong covariances)."""
    import pytest

    cfg, params, _ = _setup()
    X_list = [np.random.rand(12, cfg.input_dim) for _ in range(cfg.num_tasks)]
    bad = np.random.rand(5, cfg.input_dim + 1)
    with pytest.raises(ValueError, match="prediction inputs"):
        predict_mod.predict_f(params, cfg, bad, 0)
    with pytest.raises(ValueError, match="prediction inputs"):
        predict_mod.predict_latent_u(params, cfg, bad)
    with pytest.raises(ValueError, match="prediction inputs"):
        predict_mod.predictive(params, cfg, [bad for _ in X_list])
    with pytest.raises(ValueError, match="prediction inputs"):
        predict_mod.predict_f_projected(params, cfg, X_list, bad, 0)


def test_full_cov_kappa_consistency():
    """With kappa != 0 the full-covariance path must still agree with the
    marginal path on the diagonal (kappa contributes kappa*K(X,X), whose
    diagonal is kappa*kdiag — regression for the white-noise-kappa bug)."""
    from hetmogp_tpu.models import elbo as elbo_mod

    cfg, params, _ = _setup()
    params = params.replace(kappa=0.3 * jnp.ones_like(params.kappa))
    Xp = jnp.asarray(np.random.RandomState(0).rand(6, cfg.input_dim),
                     cfg.np_dtype)
    Luu = elbo_mod.prior_cholesky(params, cfg)
    mF, covF = elbo_mod.task_qf_full_cov(params, cfg, Luu, Xp, 0)
    mF2, vF2 = elbo_mod.task_qf_moments(params, cfg, Luu, Xp, 0,
                                        clip_variance=False)
    np.testing.assert_allclose(np.asarray(mF), np.asarray(mF2), atol=1e-10)
    diag = np.diagonal(np.asarray(covF), axis1=-2, axis2=-1).T
    np.testing.assert_allclose(diag, np.asarray(vF2), atol=1e-8)
    # and the off-diagonals are NOT white (kappa K has off-diagonal mass)
    off = np.asarray(covF)[0] - np.diag(np.diag(np.asarray(covF)[0]))
    assert np.abs(off).max() > 1e-3


def test_projected_task_matches_per_d():
    """The task-batched projection must give each d's moments exactly."""
    cfg, params, _ = _setup()
    X_list = [np.random.RandomState(2).rand(15, cfg.input_dim)
              for _ in range(cfg.num_tasks)]
    Xs = np.random.RandomState(1).rand(9, cfg.input_dim)
    for t in range(cfg.num_tasks):
        mu_t, var_t = predict_mod.predict_f_projected_task(
            params, cfg, X_list, Xs, t)
        start, stop = cfg.task_function_slices[t]
        for j, d in enumerate(range(start, stop)):
            mu_d, var_d = predict_mod.predict_f_projected(
                params, cfg, X_list, Xs, d)
            np.testing.assert_array_equal(np.asarray(mu_d),
                                          np.asarray(mu_t)[j])
            np.testing.assert_array_equal(np.asarray(var_d),
                                          np.asarray(var_t)[j])


def test_pallas_forced_off_tpu_warns():
    """An explicit use_pallas=True that cannot be honored must warn."""
    import warnings as _w

    from hetmogp_tpu.ops import pallas_dispatch

    X = jnp.zeros((4, 1), jnp.float32)
    Z = jnp.zeros((2, 3, 1), jnp.float32)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = pallas_dispatch.should_use_pallas(True, X, Z)
    assert out is False  # CPU test host
    assert any("XLA kernel instead" in str(r.message) for r in rec)


def test_serving_predictive_matches_predictive():
    """make_serving_predictive (cached-inverse fast path) matches the
    solve-path predictive at production-like conditioning (fixed jitter
    floor; the explicit inverse degrades with cond(Kuu), which the
    factory docstring documents)."""
    import jax

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig
    from hetmogp_tpu.models import predict as predict_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(4)
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=16, input_dim=1, dtype="float64",
                      jitter=1e-6, adaptive_jitter=False)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 16)[:, None], lengthscale=0.15)
    X = [rng.rand(25, 1), rng.rand(17, 1)]
    m_ref, v_ref = predict_mod.predictive(params, cfg, X)
    for t in range(2):
        f = predict_mod.make_serving_predictive(params, cfg, t)
        m, v = f(np.asarray(X[t]))
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref[t]),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref[t]),
                                   rtol=1e-6, atol=1e-8)
