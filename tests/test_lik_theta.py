"""Trainable likelihood parameters (params.lik_theta; e.g. Ordinal
cut-points).

The reference has NO trainable likelihood parameters anywhere (Gaussian
sigma fixed, gaussian.py:21-24; Ordinal is a constructor stub) — this is a
framework extension, default-off for parity: lik_theta=None and
TrainConfig.learn_lik_params=False reproduce the static behavior exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import likelihoods as L
from hetmogp_tpu import train as train_mod
from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.data import full_batch
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models.params import default_lik_theta, init_params


def test_theta_roundtrip_and_default_parity():
    lik = L.Ordinal(K=4, thresholds=(-1.0, 0.2, 1.5))
    th = lik.default_theta()
    b = np.asarray(lik._b_from_theta(jnp.asarray(th)))
    np.testing.assert_allclose(b, [-1.0, 0.2, 1.5], rtol=1e-12)
    # with_theta round-trips to an equivalent static instance
    lik2 = lik.with_theta(th)
    np.testing.assert_allclose(lik2.thresholds, lik.thresholds, rtol=1e-12)
    # var_exp with default theta == static var_exp
    rng = np.random.RandomState(0)
    Y = rng.randint(1, 5, (7, 1)).astype(float)
    M = rng.randn(7, 1)
    V = 0.3 + rng.rand(7, 1)
    a = np.asarray(lik.var_exp(jnp.asarray(Y), jnp.asarray(M), jnp.asarray(V)))
    b2 = np.asarray(lik.var_exp(jnp.asarray(Y), jnp.asarray(M),
                                jnp.asarray(V), theta=jnp.asarray(th)))
    np.testing.assert_allclose(b2, a, rtol=1e-10)


def test_theta_gradient_matches_finite_differences():
    lik = L.Ordinal(K=3)
    th = jnp.asarray(lik.default_theta())
    rng = np.random.RandomState(1)
    Y = rng.randint(1, 4, (9, 1)).astype(float)
    M = jnp.asarray(rng.randn(9, 1))
    V = jnp.asarray(0.2 + rng.rand(9, 1))
    Ya = jnp.asarray(Y)

    def f(t):
        return jnp.sum(lik.var_exp(Ya, M, V, theta=t))

    g = np.asarray(jax.grad(f)(th))
    eps = 1e-6
    for i in range(len(th)):
        e = np.zeros(len(th))
        e[i] = eps
        fd = (float(f(th + e)) - float(f(th - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5, atol=1e-8)


def _ordinal_problem():
    rng = np.random.RandomState(3)
    n, M, Q, K = 120, 8, 2, 4
    lik = L.Ordinal(K=K)
    cfg = ModelConfig(likelihoods=(lik,), num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64")
    X = np.sort(rng.rand(n, 1), 0)
    # ground truth uses UNEVEN cut-points, so learning them should help
    f = 2.0 * np.sin(5 * X)
    true = L.Ordinal(K=K, thresholds=(-1.6, -1.2, 0.9))
    Y = np.asarray(true.sample(jax.random.PRNGKey(0), jnp.asarray(f)))
    params = init_params(jax.random.PRNGKey(1), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.2,
                         q_mu_scale=0.5, with_lik_theta=True)
    return cfg, params, [X], [Y]


def test_learned_thresholds_move_and_improve():
    cfg, params, X_list, Y_list = _ordinal_problem()
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    th0 = np.asarray(params.lik_theta[0])

    def run(learn):
        tc = TrainConfig(optimizer="adam", step_rate=0.05,
                         learn_lik_params=learn)
        step = train_mod.make_svi_step(cfg, tc, vem=True)
        opt = train_mod.make_optimizer(tc)
        state = train_mod.init_train_state(
            jax.tree_util.tree_map(jnp.array, params), cfg, opt)
        for _ in range(60):
            state, m = step(state, data, scales)
        return state.params, float(m["elbo"])

    p_frozen, e_frozen = run(False)
    # frozen: theta must not move (reference parity default)
    np.testing.assert_array_equal(np.asarray(p_frozen.lik_theta[0]), th0)

    p_learn, e_learn = run(True)
    assert np.abs(np.asarray(p_learn.lik_theta[0]) - th0).max() > 1e-3
    # learning the mis-specified cut-points must not hurt (data came from
    # uneven thresholds; the default init is even)
    assert e_learn > e_frozen - 1e-6
    # learned thresholds stay strictly increasing by construction
    b = np.asarray(L.Ordinal(K=4)._b_from_theta(p_learn.lik_theta[0]))
    assert np.all(np.diff(b) > 0)

    # prediction path: absorb theta into a static config
    cfg2 = cfg.with_trained_likelihoods(p_learn)
    assert cfg2.likelihoods[0].thresholds is not None
    m_F, v_F = elbo_mod.batch_qf_moments(p_learn, cfg2, [X_list[0]])[0]
    mp, vp = cfg2.likelihoods[0].predictive(m_F, v_F)
    assert np.isfinite(np.asarray(mp)).all()
    probs = np.asarray(mp)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-6)


def test_lik_theta_none_is_inert_in_masks_and_elbo():
    """lik_theta=None (the default everywhere) leaves masks, ELBO, and the
    scan trainer exactly as before."""
    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=0.5), L.Ordinal(K=3)),
                      num_latent=2, num_inducing=6, input_dim=1,
                      dtype="float64")
    X_list = [np.sort(rng.rand(40, 1), 0)] * 2
    Y_list = [rng.randn(40, 1), rng.randint(1, 4, (40, 1)).astype(float)]
    p_none = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 6)[:, None])
    assert p_none.lik_theta is None
    p_theta = p_none.replace(lik_theta=default_lik_theta(cfg))
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    e1 = float(elbo_mod.elbo_fn(p_none, data, scales, cfg)[0])
    e2 = float(elbo_mod.elbo_fn(p_theta, data, scales, cfg)[0])
    np.testing.assert_allclose(e2, e1, rtol=1e-12)


def test_svmogp_model_level_learned_thresholds():
    """User-level flow: SVMOGP + TrainConfig(learn_lik_params=True)
    materializes lik_theta, trains it, and observation-space prediction
    absorbs the learned cut-points (pred_config)."""
    from hetmogp_tpu import SVMOGP

    cfg, params, X_list, Y_list = _ordinal_problem()
    m = SVMOGP(cfg, X_list, Y_list, np.linspace(0, 1, 8)[:, None],
               key=jax.random.PRNGKey(2), lengthscale=0.2)
    assert m.params.lik_theta is None
    tc = TrainConfig(optimizer="adam", step_rate=0.05, learn_lik_params=True)
    m.fit_svi(batch_size=64, num_steps=40, train_config=tc)
    assert m.params.lik_theta is not None
    th0 = np.asarray(L.Ordinal(K=4).default_theta())
    assert np.abs(np.asarray(m.params.lik_theta[0]) - th0).max() > 1e-4
    # prediction uses the trained cut-points
    pc = m.pred_config
    assert pc.likelihoods[0].thresholds is not None
    mp, vp = m.predictive([X_list[0]])
    np.testing.assert_allclose(np.asarray(mp[0]).sum(axis=1), 1.0, atol=1e-5)
    nlpd = m.negative_log_predictive([X_list[0][:20]], [Y_list[0][:20]],
                                     num_samples=100, tasks=[0])
    assert np.isfinite(nlpd)
