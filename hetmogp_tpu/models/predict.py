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


def make_serving_predictive(params: SVMOGPParams, config: ModelConfig,
                            task: int):
    """Serving-optimized observation-space predictive for one task.

    For a FIXED trained model, the prior factorization is constant across
    requests: this factory computes (Luu, Luu^{-1}) once (fused blocked
    forms) and closes over them, so each call replaces the per-chunk
    Cholesky + triangular solves with the cached-inverse matmul projection
    (linalg.matmul_tril_t at HIGHEST precision — the training fast path,
    whose accuracy matches the solve to ~2e-4 relative at the bench
    conditioning; see models/elbo.py latent_projections).  The explicit
    inverse's error grows with cond(Kuu) — keep a jitter floor
    (ModelConfig.jitter) for smooth kernels on dense inducing grids, and
    use ``predictive`` when solve-path exactness matters more than
    latency.

    Returns a jitted ``X -> (m_pred, v_pred)``, each (N, dim_p).
    """
    from hetmogp_tpu import train as train_mod

    Luu, iLuu = train_mod._prior_cholesky_inverse_jit(params, config)
    lik = config.likelihoods[task]

    def f(X):
        m_F, v_F = elbo_mod.task_qf_moments(params, config, Luu, X, task,
                                            iLuu=iLuu)
        return lik.predictive(m_F, v_F)

    return jax.jit(f)


def _as_inputs(Xnew, config: ModelConfig) -> jnp.ndarray:
    """Validate and convert prediction inputs.

    The kernels broadcast silently, so a mis-shaped X (wrong column count)
    would produce finite-but-wrong covariances; every public predict entry
    point validates here instead (training inputs are validated by
    SVMOGP.__init__)."""
    X = jnp.asarray(Xnew, config.np_dtype)
    if X.ndim != 2 or X.shape[-1] != config.input_dim:
        raise ValueError(
            f"prediction inputs must be (N, {config.input_dim}) for this "
            f"model (input_dim={config.input_dim}); got {X.shape}")
    return X


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
    X = _as_inputs(Xnew, config)
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
    X = _as_inputs(Xnew, config)
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
    """Reference ``_raw_predict_f`` semantics for ONE output function —
    computed via the task-batched projection (see
    ``_predict_f_projected_task``) and sliced."""
    d = output_function_ind
    t = config.function_index[d]
    j = config.d_index[d]
    mu, var = predict_f_projected_task(params, config, Xtrain_list, Xnew, t)
    return mu[j], var[j]


def predict_f_stochastic(params: SVMOGPParams, config: ModelConfig,
                         Xanchor_list: Sequence, Xnew,
                         output_function_ind: int = 0):
    """Reference ``_raw_predict_stochastic`` (svmogp.py:308-331): named
    mirror of the minibatch-posterior projection.

    In the reference this method is character-for-character identical to
    ``_raw_predict_f`` (svmogp.py:255-278) — both re-run full inference and
    Woodbury-project the posterior at the training inputs; only the
    trailing comment differs.  The name exists for minibatch-trained
    models, so the mirror makes the implied semantics usable:
    ``Xanchor_list`` may be the full training inputs (exact reference
    behavior, == ``predict_f_projected``) or any subset such as the current
    minibatch — the projection identity holds for any anchor set, and a
    B-row anchor cuts the O(N_t^3) re-projection to O(B^3).
    """
    return predict_f_projected(params, config, Xanchor_list, Xnew,
                               output_function_ind)


def predict_f_projected_task(params: SVMOGPParams, config: ModelConfig,
                             Xtrain_list: Sequence, Xnew, task: int):
    """Reference ``_raw_predict_f`` semantics for EVERY output function of
    one task at once: (mu (F_t, Ns), var (F_t, Ns)).

    The d-independent work (prior Cholesky, Kfu build, triangular solves,
    per-latent grams, posterior correction G) is shared across the task's
    F_t output functions and the per-d O(N^3) factorizations run as ONE
    batched Cholesky — the reference instead re-runs full inference per d
    (svmogp.py:263-266)."""
    t = task
    X = _as_inputs(Xtrain_list[t], config)
    Xs = _as_inputs(Xnew, config)
    return _jitted_f_projected_task(config)(params, X, Xs, t)


@functools.lru_cache(maxsize=None)
def _jitted_f_projected_task(config: ModelConfig):
    return jax.jit(
        lambda params, X, Xs, t: _predict_f_projected_task_impl(
            params, config, X, Xs, t),
        static_argnums=3)


def _predict_f_projected_task_impl(params: SVMOGPParams, config: ModelConfig,
                                   X, Xs, task: int):
    """Reference ``_raw_predict_f`` semantics (svmogp.py:255-278): form the
    q(f_d) posterior at the task's TRAINING inputs, then re-project it to
    Xnew through the function-space prior Kfdfd (a GPy ``Posterior``
    Woodbury projection) — batched over the task's output functions d.

    This is O(N^3) in the training size and is NOT the recommended path —
    ``predict_f`` computes the inducing-point posterior at Xnew directly —
    but it reproduces the reference's numbers for `predictive()`/NLPD
    comparisons on small data.  Variances are clamped non-negative (the
    reference wraps them in np.abs, svmogp.py:278).
    """
    from hetmogp_tpu.ops import kernels, linalg

    Qe = config.num_latent_eff
    Luu = elbo_mod.prior_cholesky(params, config)

    # ---- d-independent: q(f) ingredients at the training inputs
    Kfu = kernels.K_batched(config.kernel, X, params.Z, params.lengthscale,
                            params.variance)  # (Q, N, M)
    Lq = jnp.tril(params.q_sqrt)
    R = linalg.solve_tri(Luu, jnp.swapaxes(Kfu, -1, -2))  # (Q, M, N)
    if config.whiten:
        P = jnp.swapaxes(R, -1, -2)
    else:
        P = jnp.swapaxes(linalg.solve_tri(Luu, R, trans=True), -1, -2)
        # un-whitened: mean/cov contraction against Kuf, not Luu^-1 Kuf
    mean_q = jnp.einsum("qnm,qm->qn", P, params.q_mu)
    Kq_full = kernels.K_gram_batched(
        config.kernel, jnp.broadcast_to(X[None], (Qe,) + X.shape),
        params.lengthscale, params.variance)  # (Q, N, N)
    Kx = kernels.K_batched(config.kernel, X,
                           jnp.broadcast_to(Xs[None], (Qe,) + Xs.shape),
                           params.lengthscale, params.variance)  # (Q, N, Ns)
    PL = P @ Lq  # (Q, N, M)
    if config.whiten:
        G = PL @ jnp.swapaxes(PL, -1, -2) - P @ jnp.swapaxes(P, -1, -2)
    else:
        # A S A^T - A Kuf  with A = P in un-whitened coordinates
        G = (PL @ jnp.swapaxes(PL, -1, -2)
             - jnp.einsum("qnm,qkm->qnk", P, Kfu))

    # ---- per-output-function: O(Q)-sized mixing weights, batched over F_t
    start, stop = config.task_function_slices[task]
    Wt = params.W[:, start:stop]  # (Q, F)
    B = jnp.square(Wt) + params.kappa[:, start:stop]  # (Q, F)
    m_f = jnp.einsum("qf,qn->fn", Wt, mean_q)  # (F, N)
    Kdd = jnp.einsum("qf,qnk->fnk", B, Kq_full)  # (F, N, N)
    S_f = Kdd + jnp.einsum("qf,qnk->fnk", jnp.square(Wt), G)
    Kx_f = jnp.einsum("qf,qns->fns", B, Kx)  # (F, N, Ns)
    # stationary kernels: Kdiag = variance
    kxx_diag = jnp.einsum("qf,q->f", B, params.variance)[:, None] * jnp.ones(
        (1, Xs.shape[0]), X.dtype)  # (F, Ns)

    LK = linalg.jitchol(Kdd, jitter=config.jitter, adaptive=True)  # (F, N, N)
    wv = linalg.cho_solve_batched(LK, m_f[:, :, None])[..., 0]  # (F, N)
    tmp = linalg.cho_solve_batched(LK, Kx_f)  # (F, N, Ns): K^-1 Kx
    mu = jnp.einsum("fns,fn->fs", Kx_f, wv)
    var = (kxx_diag - jnp.einsum("fns,fns->fs", tmp, Kx_f)
           + jnp.einsum("fns,fns->fs", tmp, S_f @ tmp))
    return mu, jnp.maximum(var, 0.0)


def predict_f_all(params: SVMOGPParams, config: ModelConfig,
                  X_list: Sequence) -> list:
    """q(f) moments for every task: [(m_F_t, v_F_t)] with (N_t, F_t) arrays."""
    f = _jitted_task_moments(config)
    return [f(params, _as_inputs(X_t, config), t)
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
        for t in range(config.num_tasks):
            mu, var = predict_f_projected_task(params, config, Xtrain_list,
                                               X_list[t], t)
            moments.append((mu.T, var.T))  # (N, F_t) each
    else:
        moments = predict_f_all(params, config, X_list)
    m_pred, v_pred = [], []
    for lik, (m_F, v_F) in zip(config.likelihoods, moments):
        m, v = _jitted_likelihood_predictive(lik)(m_F, v_F)
        m_pred.append(m)
        v_pred.append(v)
    return m_pred, v_pred


@functools.lru_cache(maxsize=None)
def _sharded_predictive_task(config: ModelConfig, mesh, task: int):
    from hetmogp_tpu.parallel import sharding

    return sharding.make_sharded_predictive_task(config, mesh, task)


def predictive_sharded(params: SVMOGPParams, config: ModelConfig,
                       X_list: Sequence, mesh):
    """Observation-space predictive moments over a device mesh.

    Serving-scale variant of ``predictive`` (direct inducing-point moments
    path; same values): each task's prediction rows are sharded over the
    mesh's 'data' axis so throughput scales with chips.  Rows are padded
    (repeating the last row) to a multiple of the data-axis size and the
    pad is dropped from the returned arrays.  On a 2-D ('data','latent')
    mesh pass params already placed with ``parallel.shard_state`` /
    ``param_shardings`` so the per-latent algebra stays on the latent
    axis; on a 1-D data mesh params are replicated by the jit itself.

    Returns (m_pred, v_pred): lists of (N_t, dim_p) arrays.
    """
    nd = mesh.shape["data"]
    m_pred, v_pred = [], []
    for t in range(config.num_tasks):
        X = _as_inputs(X_list[t], config)
        Ns = int(X.shape[0])
        pad = (-Ns) % nd
        if pad:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[-1:], (pad, X.shape[1]))])
        m, v = _sharded_predictive_task(config, mesh, t)(params, X)
        m_pred.append(m[:Ns])
        v_pred.append(v[:Ns])
    return m_pred, v_pred


def negative_log_predictive(params: SVMOGPParams, config: ModelConfig,
                            key, Xtest: Sequence, Ytest: Sequence,
                            num_samples: int = 1000,
                            reference_scaling: bool = True,
                            tasks: Optional[Sequence[int]] = None):
    """Test NLPD via per-task Monte-Carlo logsumexp.

    Reference ``negative_log_predictive`` (svmogp.py:353-370 →
    het_likelihood.py:150-164), including its 1/num_samples scaling quirk.

    tasks: optional task indices to evaluate (Xtest/Ytest aligned to this
    list) — e.g. ``tasks=[1]`` scores only task 1's held-out region
    without dummy inputs for the other tasks.
    """
    tasks = list(range(config.num_tasks)) if tasks is None else list(tasks)
    if len(Xtest) != len(tasks) or len(Ytest) != len(tasks):
        raise ValueError(
            f"Xtest/Ytest must have one entry per evaluated task "
            f"({len(tasks)}: tasks={tasks}); got {len(Xtest)}/{len(Ytest)}. "
            "Pass tasks=[...] to score a subset of tasks.")
    f = _jitted_task_moments(config)
    keys = jax.random.split(key, len(tasks))
    total = 0.0
    for i, t in enumerate(tasks):
        lik = config.likelihoods[t]
        m_F, v_F = f(params, _as_inputs(Xtest[i], config), t)
        Y_t = jnp.asarray(Ytest[i], config.np_dtype)
        if Y_t.ndim == 1:
            Y_t = Y_t[:, None]
        total = total + _jitted_log_predictive(lik, num_samples,
                                               reference_scaling)(
            keys[i], Y_t, m_F, v_F)
    return -total


@functools.lru_cache(maxsize=None)
def _jitted_log_predictive(lik, num_samples: int,
                           reference_scaling: bool = True):
    return jax.jit(lambda key, y, m, v: lik.log_predictive(
        key, y, m, v, num_samples, reference_scaling=reference_scaling))
