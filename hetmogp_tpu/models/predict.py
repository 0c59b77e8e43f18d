"""Prediction paths: latent u, latent f, observation space, NLPD.

Replaces the reference's Woodbury-object detour (svmogp.py:219-370 +
GPy Posterior): the reference builds a GPy ``Posterior`` from (mean, cov, K)
at the training inputs and re-projects through N x N solves per output
function — ``predictive_new`` (svmogp.py:280-306) is algebraically the
identity projection, i.e. exactly the q(f_d) moments at Xnew.  Here those
moments are computed directly from the inducing-point posterior: no N x N
matrices, no re-running inference per output (the reference re-runs FULL
inference per ``_raw_predict_f`` call, svmogp.py:263-266).

Predictive variances are non-negative by construction (the reference wraps
everything in np.abs, svmogp.py:253,278,306 "# corregir").
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hetmogp_tpu.config import ModelConfig
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models.params import SVMOGPParams


@functools.lru_cache(maxsize=None)
def jitted_elbo(config: ModelConfig):
    """Cached jitted (elbo, aux) evaluator for a model config.

    Eager evaluation pays per-op dispatch (crippling over a remote TPU
    tunnel: ~60s vs ~40ms observed for the demo workload); every public
    entry point goes through one of these cached jits instead.
    """
    return jax.jit(lambda p, d, s: elbo_mod.elbo_fn(p, d, s, config))


@functools.lru_cache(maxsize=None)
def _jitted_latent_u(config: ModelConfig):
    def f(params, X):
        Luu = elbo_mod.prior_cholesky(params, config)
        mean_q, gamma_q, _ = elbo_mod.latent_projections(params, config, Luu, X)
        return mean_q.T, jnp.maximum(gamma_q, 0.0).T

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_task_moments(config: ModelConfig):
    def f(params, X, t):
        Luu = elbo_mod.prior_cholesky(params, config)
        return elbo_mod.task_qf_moments(params, config, Luu, X, t)

    return jax.jit(f, static_argnums=2)


@functools.lru_cache(maxsize=None)
def _jitted_likelihood_predictive(lik):
    return jax.jit(lambda m, v: lik.predictive(m, v))


def predict_latent_u(params: SVMOGPParams, config: ModelConfig,
                     Xnew, latent_ind: Optional[int] = None):
    """Posterior moments of the latent GPs u_q at Xnew.

    Reference ``_raw_predict`` (svmogp.py:219-253).  Returns (mean, var)
    each (N, Q) — or (N,) pair if ``latent_ind`` is given.
    """
    X = jnp.asarray(Xnew, config.np_dtype)
    mean, var = _jitted_latent_u(config)(params, X)
    if latent_ind is not None:
        return mean[:, latent_ind], var[:, latent_ind]
    return mean, var


def predict_f(params: SVMOGPParams, config: ModelConfig, Xnew,
              output_function_ind: int = 0):
    """Posterior moments of one output parameter function f_d at Xnew.

    Reference ``predictive_new`` (svmogp.py:280-306) — whose Woodbury
    round-trip reduces to the direct q(f_d) moments (see module docstring).
    Returns (mean, var), each (N,).
    """
    d = output_function_ind
    t = config.function_index[d]
    j = config.d_index[d]
    X = jnp.asarray(Xnew, config.np_dtype)
    m_F, v_F = _jitted_task_moments(config)(params, X, t)
    return m_F[:, j], v_F[:, j]


def predict_f_all(params: SVMOGPParams, config: ModelConfig,
                  X_list: Sequence) -> list:
    """q(f) moments for every task: [(m_F_t, v_F_t)] with (N_t, F_t) arrays."""
    f = _jitted_task_moments(config)
    return [f(params, jnp.asarray(X_t, config.np_dtype), t)
            for t, X_t in enumerate(X_list)]


def predictive(params: SVMOGPParams, config: ModelConfig, X_list: Sequence):
    """Observation-space predictive moments per task.

    Reference ``SVMOGP.predictive`` (svmogp.py:333-351): latent moments
    pushed through each likelihood's quadrature moments.
    Returns (m_pred, v_pred): lists of (N_t, dim_p) arrays.
    """
    moments = predict_f_all(params, config, X_list)
    m_pred, v_pred = [], []
    for lik, (m_F, v_F) in zip(config.likelihoods, moments):
        m, v = _jitted_likelihood_predictive(lik)(m_F, v_F)
        m_pred.append(m)
        v_pred.append(v)
    return m_pred, v_pred


def negative_log_predictive(params: SVMOGPParams, config: ModelConfig,
                            key, Xtest: Sequence, Ytest: Sequence,
                            num_samples: int = 1000):
    """Test NLPD via per-task Monte-Carlo logsumexp.

    Reference ``negative_log_predictive`` (svmogp.py:353-370 →
    het_likelihood.py:150-164), including its 1/num_samples scaling quirk.
    """
    moments = predict_f_all(params, config, Xtest)
    keys = jax.random.split(key, config.num_tasks)
    total = 0.0
    for t, (lik, (m_F, v_F)) in enumerate(zip(config.likelihoods, moments)):
        Y_t = jnp.asarray(Ytest[t], config.np_dtype)
        if Y_t.ndim == 1:
            Y_t = Y_t[:, None]
        total = total + _jitted_log_predictive(lik, num_samples)(
            keys[t], Y_t, m_F, v_F)
    return -total


@functools.lru_cache(maxsize=None)
def _jitted_log_predictive(lik, num_samples: int):
    return jax.jit(lambda key, y, m, v: lik.log_predictive(key, y, m, v,
                                                           num_samples))
