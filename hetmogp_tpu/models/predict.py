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


@functools.lru_cache(maxsize=None)
def _jitted_latent_u_full(config: ModelConfig):
    def f(params, X):
        Luu = elbo_mod.prior_cholesky(params, config)
        return elbo_mod.latent_projections_full(params, config, Luu, X)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_task_full_cov(config: ModelConfig):
    def f(params, X, t):
        Luu = elbo_mod.prior_cholesky(params, config)
        return elbo_mod.task_qf_full_cov(params, config, Luu, X, t)

    return jax.jit(f, static_argnums=2)


def predict_latent_u(params: SVMOGPParams, config: ModelConfig,
                     Xnew, latent_ind: Optional[int] = None,
                     full_cov: bool = False):
    """Posterior moments of the latent GPs u_q at Xnew.

    Reference ``_raw_predict`` (svmogp.py:219-253), including its implied
    ``full_cov`` option (svmogp.py:219) that the reference never finishes.
    Returns (mean, var) each (N, Q) — or (N,) pair if ``latent_ind`` is
    given.  With ``full_cov=True`` the second element is the full (Q, N, N)
    posterior covariance (or (N, N) for one latent); full covariances are
    not clamped (their diagonals are non-negative up to roundoff by
    construction).
    """
    X = jnp.asarray(Xnew, config.np_dtype)
    if full_cov:
        mean_q, cov_q = _jitted_latent_u_full(config)(params, X)
        if latent_ind is not None:
            return mean_q[latent_ind], cov_q[latent_ind]
        return mean_q.T, cov_q
    mean, var = _jitted_latent_u(config)(params, X)
    if latent_ind is not None:
        return mean[:, latent_ind], var[:, latent_ind]
    return mean, var


def predict_f(params: SVMOGPParams, config: ModelConfig, Xnew,
              output_function_ind: int = 0, full_cov: bool = False):
    """Posterior moments of one output parameter function f_d at Xnew.

    Reference ``predictive_new`` (svmogp.py:280-306) — whose Woodbury
    round-trip reduces to the direct q(f_d) moments (see module docstring).
    Returns (mean, var), each (N,) — or (mean, cov (N, N)) with
    ``full_cov=True``, enabling correlated f* sampling.
    """
    d = output_function_ind
    t = config.function_index[d]
    j = config.d_index[d]
    X = jnp.asarray(Xnew, config.np_dtype)
    if full_cov:
        m_F, cov_F = _jitted_task_full_cov(config)(params, X, t)
        return m_F[:, j], cov_F[j]
    m_F, v_F = _jitted_task_moments(config)(params, X, t)
    return m_F[:, j], v_F[:, j]


def sample_f(params: SVMOGPParams, config: ModelConfig, key, Xnew,
             output_function_ind: int = 0, num_samples: int = 1,
             jitter: float = 1e-8):
    """Correlated posterior samples of f_d at Xnew: (num_samples, N).

    Draws from the full-covariance q(f_d) — the reason full_cov exists; the
    diagonal-only path would sample each point independently.
    """
    mu, cov = predict_f(params, config, Xnew, output_function_ind,
                        full_cov=True)
    from hetmogp_tpu.ops import linalg

    L = linalg.jitchol(cov[None], jitter=jitter, adaptive=True)[0]
    eps = jax.random.normal(key, (num_samples, mu.shape[0]), mu.dtype)
    return mu[None, :] + eps @ L.T


def predict_f_projected(params: SVMOGPParams, config: ModelConfig,
                        Xtrain_list: Sequence, Xnew,
                        output_function_ind: int = 0):
    """Reference ``_raw_predict_f`` semantics — jitted wrapper, see
    ``_predict_f_projected_impl`` for the algebra."""
    d = output_function_ind
    t = config.function_index[d]
    X = jnp.asarray(Xtrain_list[t], config.np_dtype)
    Xs = jnp.asarray(Xnew, config.np_dtype)
    return _jitted_f_projected(config)(params, X, Xs, d)


@functools.lru_cache(maxsize=None)
def _jitted_f_projected(config: ModelConfig):
    return jax.jit(
        lambda params, X, Xs, d: _predict_f_projected_impl(
            params, config, X, Xs, d),
        static_argnums=3)


def _predict_f_projected_impl(params: SVMOGPParams, config: ModelConfig,
                              X, Xs, output_function_ind: int = 0):
    """Reference ``_raw_predict_f`` semantics (svmogp.py:255-278): form the
    q(f_d) posterior at the task's TRAINING inputs, then re-project it to
    Xnew through the function-space prior Kfdfd (a GPy ``Posterior``
    Woodbury projection).

    This is O(N^3) in the training size and is NOT the recommended path —
    ``predict_f`` computes the inducing-point posterior at Xnew directly —
    but it reproduces the reference's numbers for `predictive()`/NLPD
    comparisons on small data.  Variances are clamped non-negative (the
    reference wraps them in np.abs, svmogp.py:278).
    """
    from hetmogp_tpu.ops import kernels, linalg

    d = output_function_ind
    Luu = elbo_mod.prior_cholesky(params, config)

    # full q(f_d) moments at the training inputs
    Kfu = kernels.K_batched(config.kernel, X, params.Z, params.lengthscale,
                            params.variance)  # (Q, N, M)
    Lq = jnp.tril(params.q_sqrt)
    R = linalg.solve_tri(Luu, jnp.swapaxes(Kfu, -1, -2))  # (Q, M, N)
    if config.whiten:
        P = jnp.swapaxes(R, -1, -2)
    else:
        P = jnp.swapaxes(linalg.solve_tri(Luu, R, trans=True), -1, -2)
        # un-whitened: mean/cov contraction against Kuf, not Luu^-1 Kuf
    w = params.W[:, d]  # (Q,)
    B_dd = jnp.square(w) + params.kappa[:, d]
    mean_q = jnp.einsum("qnm,qm->qn", P, params.q_mu)
    m_fd = jnp.einsum("q,qn->n", w, mean_q)

    kfn = kernels.kern_fn(config.kernel)
    Kq_full = jnp.stack([
        kfn(X, X, params.lengthscale[q], params.variance[q])
        for q in range(config.num_latent_eff)])  # (Q, N, N)
    PL = P @ Lq  # (Q, N, M)
    if config.whiten:
        G = PL @ jnp.swapaxes(PL, -1, -2) - P @ jnp.swapaxes(P, -1, -2)
    else:
        # A S A^T - A Kuf  with A = P in un-whitened coordinates
        G = (PL @ jnp.swapaxes(PL, -1, -2)
             - jnp.einsum("qnm,qkm->qnk", P, Kfu))
    S_fd = jnp.einsum("q,qnk->nk", B_dd, Kq_full) + jnp.einsum(
        "q,qnk->nk", jnp.square(w), G)

    # prior at training inputs / cross / new diag for output d
    Kdd = jnp.einsum("q,qnk->nk", B_dd, Kq_full)
    Kx = jnp.stack([
        kfn(X, Xs, params.lengthscale[q], params.variance[q])
        for q in range(config.num_latent_eff)])
    Kx_d = jnp.einsum("q,qns->ns", B_dd, Kx)
    # stationary kernels: Kdiag = variance
    kxx_diag = jnp.einsum("q,q->", B_dd, params.variance) * jnp.ones(
        (Xs.shape[0],), X.dtype)

    LK = linalg.jitchol(Kdd[None], jitter=config.jitter,
                        adaptive=True)[0]
    wv = linalg.cho_solve_batched(LK[None], m_fd[None, :, None])[0, :, 0]
    tmp = linalg.cho_solve_batched(LK[None], Kx_d[None])[0]  # K^-1 Kx
    mu = Kx_d.T @ wv
    var = (kxx_diag - jnp.sum(tmp * Kx_d, axis=0)
           + jnp.sum(tmp * (S_fd @ tmp), axis=0))
    return mu, jnp.maximum(var, 0.0)


def predict_f_all(params: SVMOGPParams, config: ModelConfig,
                  X_list: Sequence) -> list:
    """q(f) moments for every task: [(m_F_t, v_F_t)] with (N_t, F_t) arrays."""
    f = _jitted_task_moments(config)
    return [f(params, jnp.asarray(X_t, config.np_dtype), t)
            for t, X_t in enumerate(X_list)]


def predictive(params: SVMOGPParams, config: ModelConfig, X_list: Sequence,
               Xtrain_list: Optional[Sequence] = None,
               projected: bool = False):
    """Observation-space predictive moments per task.

    Reference ``SVMOGP.predictive`` (svmogp.py:333-351): latent moments
    pushed through each likelihood's quadrature moments.  The reference
    routes the latent moments through ``_raw_predict_f`` (the O(N^3)
    training-set projection); pass ``projected=True`` with ``Xtrain_list``
    for those exact semantics — the default uses the direct inducing-point
    moments (``predictive_new`` semantics).
    Returns (m_pred, v_pred): lists of (N_t, dim_p) arrays.
    """
    if projected:
        if Xtrain_list is None:
            raise ValueError("projected=True requires Xtrain_list")
        moments = []
        for t, lik in enumerate(config.likelihoods):
            cols_m, cols_v = [], []
            start, stop = config.task_function_slices[t]
            for d in range(start, stop):
                m_d, v_d = predict_f_projected(params, config, Xtrain_list,
                                               X_list[t], d)
                cols_m.append(m_d)
                cols_v.append(v_d)
            moments.append((jnp.stack(cols_m, -1), jnp.stack(cols_v, -1)))
    else:
        moments = predict_f_all(params, config, X_list)
    m_pred, v_pred = [], []
    for lik, (m_F, v_F) in zip(config.likelihoods, moments):
        m, v = _jitted_likelihood_predictive(lik)(m_F, v_F)
        m_pred.append(m)
        v_pred.append(v)
    return m_pred, v_pred


def negative_log_predictive(params: SVMOGPParams, config: ModelConfig,
                            key, Xtest: Sequence, Ytest: Sequence,
                            num_samples: int = 1000,
                            reference_scaling: bool = True):
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
        total = total + _jitted_log_predictive(lik, num_samples,
                                               reference_scaling)(
            keys[t], Y_t, m_F, v_F)
    return -total


@functools.lru_cache(maxsize=None)
def _jitted_log_predictive(lik, num_samples: int,
                           reference_scaling: bool = True):
    return jax.jit(lambda key, y, m, v: lik.log_predictive(
        key, y, m, v, num_samples, reference_scaling=reference_scaling))
