"""The evidence lower bound as a pure, differentiable function.

Replaces the reference's entire inference engine (svmogp_inf.py:21-250): the
ELBO value is the same mathematical object —

    ELBO = sum_t scale_t * sum_i E_{q(f)}[log p(y_ti | f_ti)]
           - sum_q KL(q(u_q) || p(u_q))                    (svmogp_inf.py:72-88)

— but all gradients come from ``jax.grad`` instead of ~400 lines of
hand-derived algebra (svmogp_inf.py:111-183, util.py:208-282).

Key structural improvements over the reference (documented deviations, all
value-preserving):

* Outputs of the same task share their inputs, so the per-latent projection
  A_tq = Kuu_q^{-1} K_{u_q f}(X_t) is computed ONCE per (task, latent) and
  scaled by the mixing weights afterwards; the reference recomputes it for
  every output function d (svmogp_inf.py:212-219) — a factor-F_t saving.
* The N x N matrix S_fd is never materialized (the reference builds it at
  svmogp_inf.py:209,219 but training only consumes its diagonal).
* No explicit Kuu^{-1} anywhere (reference util.py:199 dpotri): the whitened
  path uses one triangular solve; the un-whitened path uses Cholesky solves.
* Everything is batched over Q (batched Cholesky + batched matmuls -> MXU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hetmogp_tpu.config import ModelConfig
from hetmogp_tpu.models.params import SVMOGPParams
from hetmogp_tpu.ops import kernels, linalg

import os as _os

# MEASURED NEGATIVE (round 4, v5e, bench shapes): the structure-aware
# custom-VJP quad_diag backward (linalg.quad_diag_train — tril-output
# blocked gL at half the flops) is ~2% SLOWER end-to-end than the dense
# JVP-transpose backward (fused pure-VE 775.5 vs 790.3 steps/s, 4:1 mix
# 660/667 vs 676; repeated) — the one big dense 1-pass matmul at ~0.7 MFU
# beats four block einsums + zero-pads + concats.  Default OFF;
# HETMOGP_QUAD_VJP=1 re-enables for re-measurement on future hardware.
_QUAD_VJP = _os.environ.get("HETMOGP_QUAD_VJP", "0") == "1"

class TaskData(NamedTuple):
    """One task's (mini)batch. mask weights each datapoint's VE term (1/0);
    padding rows carry mask 0 so ragged tasks shard cleanly across devices."""

    X: jnp.ndarray  # (N_t, Dx)
    Y: jnp.ndarray  # (N_t, dim_y)
    mask: jnp.ndarray  # (N_t,)


def task_data(X, Y, mask=None, dtype=None) -> TaskData:
    X = jnp.asarray(X, dtype)
    Y = jnp.asarray(Y, dtype)
    if Y.ndim == 1:
        Y = Y[:, None]
    if mask is None:
        mask = jnp.ones((X.shape[0],), X.dtype)
    return TaskData(X=X, Y=Y, mask=jnp.asarray(mask, X.dtype))


# ---------------------------------------------------------------------------
# prior / posterior algebra
# ---------------------------------------------------------------------------

def prior_cholesky(params: SVMOGPParams, config: ModelConfig,
                   cached=None, blocked: bool = False) -> jnp.ndarray:
    """Luu: (Q, M, M) lower Cholesky factors of Kuu_q.

    Replaces ``latent_funs_cov`` (reference util.py:181-200) without the
    explicit inverse; jitter policy mirrors GPy's jitchol.

    cached: optional (Luu, iLuu) pair valid for the CURRENT hypers — the
    VM-step fast path: forward reuses the cached factor, backward runs the
    exact Cholesky pullback as matmuls against the cached inverse
    (linalg.chol_cached) instead of re-factorizing + triangular solves.

    blocked: route the factorization through ``linalg.blocked_cholesky``
    (the O(M^3) work as MXU matmuls, ~2x at M=1024 — the trainer's cache
    refresh uses this).  Only taken on the fixed-jitter, working-dtype
    path: adaptive jitter needs the while_loop re-factorization and the
    f64 island has its own mixed kernel.
    """
    Kuu = kernels.K_gram_batched(config.kernel, params.Z, params.lengthscale,
                                 params.variance)
    if cached is not None:
        eye = jnp.eye(Kuu.shape[-1], dtype=Kuu.dtype)
        return linalg.chol_cached(Kuu + config.jitter * eye, *cached)
    if config.chol_dtype == "float64" and Kuu.dtype != jnp.float64:
        # accuracy island: f64 forward / working-dtype backward Cholesky
        # (requires jax_enable_x64; fixed jitter only — see ModelConfig)
        eye = jnp.eye(Kuu.shape[-1], dtype=Kuu.dtype)
        return linalg.chol_mixed(Kuu + config.jitter * eye)
    if blocked and not config.adaptive_jitter:
        eye = jnp.eye(Kuu.shape[-1], dtype=Kuu.dtype)
        return linalg.blocked_cholesky(Kuu + config.jitter * eye)
    return linalg.jitchol(Kuu, jitter=config.jitter,
                          adaptive=config.adaptive_jitter)


def prior_cholesky_inverse(params: SVMOGPParams, config: ModelConfig):
    """(Luu, Luu^{-1}) for the fast-projection cache, fused when possible.

    On the fixed-jitter working-dtype path the factorization and the
    triangular inverse share their (nb, nb) panel inverses
    (linalg.blocked_cholesky_inverse); otherwise falls back to the
    separate prior_cholesky + rec_tri_inverse pair.
    """
    if (not config.adaptive_jitter) and config.chol_dtype != "float64":
        Kuu = kernels.K_gram_batched(config.kernel, params.Z,
                                     params.lengthscale, params.variance)
        eye = jnp.eye(Kuu.shape[-1], dtype=Kuu.dtype)
        return linalg.blocked_cholesky_inverse(Kuu + config.jitter * eye)
    Luu = prior_cholesky(params, config, blocked=True)
    return Luu, linalg.rec_tri_inverse(Luu)


def latent_projection_P(params: SVMOGPParams, config: ModelConfig,
                        Luu: jnp.ndarray, X: jnp.ndarray, iLuu=None):
    """(P, kdiag) with P = (Luu^{-1} K_uf)^T — the whitened projection
    operator itself, for callers that contract P directly (the
    natural-gradient step forms g_S = P^T diag(c) P and never needs the
    full (m, S) forward).  Same fast/solve paths and precision policy as
    ``latent_projections`` (see the load-bearing precision NOTE there)."""
    Kfu = kernels.K_batched(config.kernel, X, params.Z, params.lengthscale,
                            params.variance)  # (Q, N, M)
    kdiag = kernels.Kdiag_batched(config.kernel, X, params.variance)
    if iLuu is not None:
        prec = (jax.lax.Precision.HIGH
                if config.ve_fwd_precision == "high"
                else jax.lax.Precision.HIGHEST)
        P = linalg.matmul_tril_t(Kfu, iLuu, precision=prec)
    else:
        R = linalg.solve_tri(Luu, jnp.swapaxes(Kfu, -1, -2))
        P = jnp.swapaxes(R, -1, -2)  # (Q, N, M)
    return P, kdiag


def latent_projections(params: SVMOGPParams, config: ModelConfig,
                       Luu: jnp.ndarray, X: jnp.ndarray, iLuu=None,
                       q_moments=None, cache_grad: bool = False):
    """Shared per-latent projection terms at inputs X.

    Returns:
      mean_q:  (Q, N)  E[u_q-projection] = A_tq m_q (or whitened analogue)
      gamma_q: (Q, N)  kdiag_q + diag(A S A^T) - diag(A Kuf)  (the per-latent
               variance contribution before mixing-weight scaling)
      kdiag:   (Q, N)  prior diagonal per latent (for the kappa term)

    Whitened (config.whiten):  P = (Luu^{-1} Kuf)^T, f_d-contrib = w P m,
    variance term uses P L~ and P directly.  Un-whitened: A = Kuu^{-1} Kuf
    via two triangular solves (reference computed A with dpotrs at
    svmogp_inf.py:214).

    Args:
      q_moments: optional (m, S) with m: (Q, M) and S: (Q, M, M) full
        covariances — the natural-gradient path differentiates the ELBO with
        respect to (m, S) directly (train.natgrad_update), so the variance
        term contracts against S instead of the Cholesky factor.  None uses
        params.q_mu / tril(params.q_sqrt).
    """
    Kfu = kernels.K_batched(config.kernel, X, params.Z, params.lengthscale,
                            params.variance)  # (Q, N, M)
    kdiag = kernels.Kdiag_batched(config.kernel, X, params.variance)  # (Q, N)
    if q_moments is None:
        m_u, S, Lq = params.q_mu, None, jnp.tril(params.q_sqrt)
    else:
        m_u, S = q_moments
        Lq = None

    def _var_term(B):
        """diag(B S B^T) from either the factor or the full covariance.

        Fast path (iLuu present = the training projections): the
        custom-VJP quad_diag_train, whose backward computes the L- and
        B-cotangents as structure-aware half-flop matmuls (reverse-mode
        only — the solve/prediction paths keep the JVP form so forward
        differentiation stays available there).  Identical values.
        """
        if S is None:
            if iLuu is not None and _QUAD_VJP:
                return linalg.quad_diag_train(B, Lq)
            return linalg.quad_diag(B, Lq)
        return jnp.einsum("qnm,qmk,qnk->qn", B, S, B)

    if iLuu is not None and cache_grad:
        # VM-step fast path: same matmul as below, but through the
        # custom-VJP solve so gradients flow to Luu (and on to the hypers
        # via chol_cached's pullback) and to Kfu — all as HIGHEST-precision
        # matmuls against the cached inverse.
        R = linalg.solve_tri_cached(Luu, jnp.swapaxes(Kfu, -1, -2), iLuu)
        P = jnp.swapaxes(R, -1, -2)  # (Q, N, M)
    elif iLuu is not None:
        # VE-step fast path: explicit triangular inverse cached by the
        # trainer — the (Q, M, N)-sized triangular solves (~19 TFLOP/s on
        # v5e) become MXU matmuls.  precision=HIGHEST is load-bearing: at
        # default precision the TPU rounds the operands to bfloat16 per
        # pass, and iLuu's large-magnitude cancelling entries lose ~all
        # significance (measured P relative error 1.5e0 at M=1024,
        # cond(Kuu)~1e6 — the round-1 "75% gradient error"); at HIGHEST the
        # matmul matches the triangular solve's accuracy (2.3e-4 vs 1.6e-4
        # on the same inputs).  config.ve_fwd_precision="high" is the
        # measured large-M opt-in (see ModelConfig).
        prec = (jax.lax.Precision.HIGH
                if config.ve_fwd_precision == "high"
                else jax.lax.Precision.HIGHEST)
        # Kfu @ iLuu^T skipping iLuu's structurally-zero upper blocks
        # (1.52x on this op at bench shapes — linalg.matmul_tril_t)
        P = linalg.matmul_tril_t(Kfu, iLuu, precision=prec)
    else:
        R = linalg.solve_tri(Luu, jnp.swapaxes(Kfu, -1, -2))  # Luu^{-1} Kuf
        P = jnp.swapaxes(R, -1, -2)  # (Q, N, M)
    if config.whiten:
        mean_q = jnp.einsum("qnm,qm->qn", P, m_u)
        gamma_q = (kdiag
                   + _var_term(P)
                   - jnp.sum(jnp.square(P), axis=-1))
    else:
        if iLuu is not None:
            A = linalg.matmul_tril(P, iLuu,  # P @ iLuu = Kfu Kuu^-1
                                   precision=jax.lax.Precision.HIGHEST)
        else:
            A = jnp.swapaxes(
                linalg.solve_tri(Luu, jnp.swapaxes(P, -1, -2), trans=True),
                -1, -2)  # (Q, N, M)
        mean_q = jnp.einsum("qnm,qm->qn", A, m_u)
        gamma_q = (kdiag
                   + _var_term(A)
                   - jnp.sum(A * Kfu, axis=-1))
    return mean_q, gamma_q, kdiag


def task_qf_moments(params: SVMOGPParams, config: ModelConfig, Luu: jnp.ndarray,
                    X: jnp.ndarray, task: int, clip_variance: bool = True,
                    iLuu=None, q_moments=None, var_floor: float = 0.0,
                    cache_grad: bool = False):
    """Marginal moments of q(f_d) for every parameter function d of a task.

    Returns (m_F, v_F), each (N_t, F_t).  Mixing: m_fd = sum_q w_qd mean_q,
    v_fd = sum_q (w_qd^2 gamma_q + kappa_qd kdiag_q) — the reference's
    cross/function covariances (util.py:145-179) folded into two einsums.
    Variances are clamped non-negative by construction (the reference instead
    prints 'v negative!' at svmogp_inf.py:221-222 and np.abs()s at predict
    time, svmogp.py:253).
    """
    mean_q, gamma_q, kdiag = latent_projections(params, config, Luu, X,
                                                iLuu=iLuu, q_moments=q_moments,
                                                cache_grad=cache_grad)
    return _mix_task(mean_q, gamma_q, kdiag, params, config, task,
                     clip_variance=clip_variance, var_floor=var_floor)


def _mix_task(mean_q, gamma_q, kdiag, params, config, task,
              clip_variance: bool = True, var_floor: float = 0.0):
    """Coregionalization mixing of per-latent projections into one task's
    (m_F, v_F) — shared by the per-task and fused-rows ELBO paths."""
    start, stop = config.task_function_slices[task]
    Wt = params.W[:, start:stop]  # (Q, F_t)
    Kt = params.kappa[:, start:stop]
    m_F = jnp.einsum("qn,qj->nj", mean_q, Wt)
    v_F = (jnp.einsum("qn,qj->nj", gamma_q, jnp.square(Wt))
           + jnp.einsum("qn,qj->nj", kdiag, Kt))
    if clip_variance:
        v_F = jnp.maximum(v_F, var_floor)
    return m_F, v_F


def fused_task_moments(params: SVMOGPParams, config: ModelConfig, Luu,
                       data, iLuu=None, q_moments=None,
                       cache_grad: bool = False, var_floor: float = 0.0):
    """(m_F, v_F) for every task from ONE concatenated-rows projection.

    The config.fuse_task_rows fast path (docs/DESIGN.md §7g): all tasks'
    batch rows go through a single Kfu build / triangular matmul /
    quad_diag — the VE backward then forms one (Q, M, M) Lq-cotangent
    instead of one per task — and the per-task mixing + clipping happens on
    column slices.  Same math as per-task task_qf_moments (values equal to
    float rounding of the different matmul blocking).
    """
    X_all = jnp.concatenate([td.X for td in data], axis=0)
    mean_q, gamma_q, kdiag = latent_projections(
        params, config, Luu, X_all, iLuu=iLuu, q_moments=q_moments,
        cache_grad=cache_grad)
    out = []
    off = 0
    for t in range(config.num_tasks):
        sl = slice(off, off + data[t].X.shape[0])
        off = sl.stop
        out.append(_mix_task(mean_q[:, sl], gamma_q[:, sl], kdiag[:, sl],
                             params, config, t, var_floor=var_floor))
    return out


def latent_projections_full(params: SVMOGPParams, config: ModelConfig,
                            Luu: jnp.ndarray, X: jnp.ndarray):
    """Full-covariance analogue of latent_projections.

    Returns:
      mean_q: (Q, N) posterior means of the latent projections at X.
      cov_q:  (Q, N, N) full posterior covariances — the reference implies
        this path via ``_raw_predict(..., full_cov)`` (svmogp.py:219-253)
        but only ever returns diagonals; provided here so correlated f*
        samples can be drawn downstream.

    Whitened: cov = Kxx + P S P^T - P P^T with P = (Luu^{-1} Kuf)^T.
    Un-whitened: cov = Kxx + A S A^T - A Kuf with A = Kfu Kuu^{-1}.
    """
    Q = Luu.shape[0]
    Kfu = kernels.K_batched(config.kernel, X, params.Z, params.lengthscale,
                            params.variance)  # (Q, N, M)
    Kxx = kernels.K_gram_batched(
        config.kernel, jnp.broadcast_to(X[None], (Q,) + X.shape),
        params.lengthscale, params.variance)  # (Q, N, N)
    Lq = jnp.tril(params.q_sqrt)
    R = linalg.solve_tri(Luu, jnp.swapaxes(Kfu, -1, -2))  # (Q, M, N)
    P = jnp.swapaxes(R, -1, -2)
    if config.whiten:
        B = P
    else:
        B = jnp.swapaxes(
            linalg.solve_tri(Luu, R, trans=True), -1, -2)  # A (Q, N, M)
    mean_q = jnp.einsum("qnm,qm->qn", B, params.q_mu)
    BL = B @ Lq
    cov_q = Kxx + BL @ jnp.swapaxes(BL, -1, -2)
    if config.whiten:
        cov_q = cov_q - P @ jnp.swapaxes(P, -1, -2)
    else:
        cov_q = cov_q - jnp.einsum("qnm,qkm->qnk", B, Kfu)
    return mean_q, cov_q


def task_qf_full_cov(params: SVMOGPParams, config: ModelConfig,
                     Luu: jnp.ndarray, X: jnp.ndarray, task: int):
    """Full-covariance q(f_d) for every parameter function d of a task.

    Returns (m_F, cov_F): (N, F_t) means and (F_t, N, N) covariances —
    cov_fd = sum_q w_qd^2 cov_q + diag(sum_q kappa_qd kdiag_q).  The d-blocks
    are conditionally independent across d given the factorized q(u), so no
    cross-d covariance exists (same as the reference's per-d posteriors).
    """
    start, stop = config.task_function_slices[task]
    Wt = params.W[:, start:stop]  # (Q, F_t)
    Kt = params.kappa[:, start:stop]
    mean_q, cov_q = latent_projections_full(params, config, Luu, X)
    m_F = jnp.einsum("qn,qj->nj", mean_q, Wt)
    cov_F = jnp.einsum("qj,qnk->jnk", jnp.square(Wt), cov_q)
    # kappa contributes kappa_qd * k_q(X, X) to the PRIOR of f_d
    # (B_q = W W^T + diag(kappa) scales the full kernel, util.py:166-179),
    # with no posterior reduction (that component is not mixed through the
    # inducing points) — matching the marginal path's kappa * kdiag term
    # (diag(kappa K) == kappa kdiag), not a white-noise diagonal.
    Q = Luu.shape[0]
    Kxx = kernels.K_gram_batched(
        config.kernel, jnp.broadcast_to(X[None], (Q,) + X.shape),
        params.lengthscale, params.variance)  # (Q, N, N)
    cov_F = cov_F + jnp.einsum("qj,qnk->jnk", Kt, Kxx)
    return m_F, cov_F


def kl_divergence(params: SVMOGPParams, config: ModelConfig,
                  Luu: jnp.ndarray) -> jnp.ndarray:
    """sum_q KL(q(u_q) || p(u_q)) (reference svmogp_inf.py:227-250).

    Whitened: p(v) = N(0, I) so
      KL_q = 0.5 (||L~||_F^2 + ||m~||^2 - M - 2 sum log |diag L~|).
    Un-whitened, computed via Cholesky solves only:
      tr(Kuu^{-1} S) = ||Luu^{-1} L||_F^2,  m^T Kuu^{-1} m = ||Luu^{-1} m||^2.
    """
    M = config.num_inducing
    Lq = jnp.tril(params.q_sqrt)
    logdet_q = linalg.logdet_from_chol(Lq)  # (Q,)
    if config.whiten:
        tr = jnp.sum(jnp.square(Lq), axis=(-2, -1))
        mah = jnp.sum(jnp.square(params.q_mu), axis=-1)
        kl = 0.5 * (tr + mah - M - logdet_q)
    else:
        iLuu_L = linalg.solve_tri(Luu, Lq)  # (Q, M, M)
        iLuu_m = linalg.solve_tri(Luu, params.q_mu[..., None])  # (Q, M, 1)
        tr = jnp.sum(jnp.square(iLuu_L), axis=(-2, -1))
        mah = jnp.sum(jnp.square(iLuu_m), axis=(-2, -1))
        logdet_p = linalg.logdet_from_chol(Luu)
        kl = 0.5 * (tr + mah - M + logdet_p - logdet_q)
    return jnp.sum(kl)


# ---------------------------------------------------------------------------
# the bound
# ---------------------------------------------------------------------------

def elbo_fn(params: SVMOGPParams, data: Tuple[TaskData, ...],
            scales: jnp.ndarray, config: ModelConfig, Luu=None, iLuu=None,
            cache_grad: bool = False):
    """ELBO and per-task diagnostics.

    Args:
      data: one TaskData per task (static length T; per-task shapes static).
      scales: (T,) minibatch scales N_full_t / N_batch_t (reference
        svmogp.py:89-90, applied at svmogp_inf.py:75-78).
      Luu: optional precomputed prior Cholesky factors (Q, M, M).  Valid
        only while kernel hypers and Z are unchanged — the VE-step cache
        (train.py) exploits that 4 of 5 VEM steps freeze them, skipping
        ~half the step cost at M=1024.
      cache_grad: VM-step fast path — (Luu, iLuu) are value-correct caches
        for the CURRENT hypers, and hyper gradients should flow through
        them via the cached-inverse adjoints (linalg.chol_cached /
        solve_tri_cached: exact pullback algebra, MXU matmuls).  Requires
        the whitened parameterization.
    Returns:
      (elbo, aux) with aux = {'ve': (T,), 'kl': scalar}.
    """
    if cache_grad:
        if Luu is None or iLuu is None:
            raise ValueError("cache_grad=True needs both Luu and iLuu")
        if not config.whiten:
            raise ValueError("cache_grad fast path requires config.whiten")
        Luu = prior_cholesky(params, config, cached=(Luu, iLuu))
    elif Luu is None:
        Luu = prior_cholesky(params, config)
    # NOTE: fusing the per-task projections into one concatenated-rows SOLVE
    # was measured SLOWER on TPU v5e (154 vs 178 steps/s at bench shapes) —
    # the independent per-task solves overlap better.  With the round-3
    # matmul fast path (P = Kfu @ iLuu^T, no solves) the trade-off changed:
    # config.fuse_task_rows concatenates all tasks' rows into ONE projection
    # (one Kfu build, one triangular matmul, one quad_diag — so the VE
    # backward materializes ONE (Q, M, M) Lq-cotangent instead of T of
    # them), then slices per task for the mixing + likelihood quadrature.
    # The fused path is therefore gated on the cached inverse being present:
    # without iLuu the projection is a triangular SOLVE, where the fused
    # blocking is the measured regression above (iLuu is None at trace time,
    # so this is a static choice).
    fuse_rows = config.fuse_task_rows and iLuu is not None
    if fuse_rows:
        moments = fused_task_moments(params, config, Luu, data, iLuu=iLuu,
                                     cache_grad=cache_grad)
    ve_sums = []
    for t, lik in enumerate(config.likelihoods):
        X_t, Y_t, mask_t = data[t]
        if fuse_rows:
            m_F, v_F = moments[t]
        else:
            m_F, v_F = task_qf_moments(params, config, Luu, X_t, t,
                                       iLuu=iLuu, cache_grad=cache_grad)
        if params.lik_theta is not None and lik.n_theta:
            # trainable likelihood parameters (e.g. Ordinal cut-points)
            ve = lik.var_exp(Y_t, m_F, v_F, theta=params.lik_theta[t])
        else:
            ve = lik.var_exp(Y_t, m_F, v_F)  # (N_t,)
        ve_sums.append(scales[t] * jnp.sum(ve * mask_t))
    ve_total = functools.reduce(jnp.add, ve_sums)
    kl = kl_divergence(params, config, Luu)
    elbo = ve_total - kl
    aux = {"ve": jnp.stack(ve_sums), "kl": kl}
    return elbo, aux


def build_elbo(config: ModelConfig):
    """Close the static config over elbo_fn -> elbo(params, data, scales)."""

    def f(params, data, scales):
        return elbo_fn(params, data, scales, config)

    return f


def batch_qf_moments(params: SVMOGPParams, config: ModelConfig,
                     X_list: Sequence[jnp.ndarray],
                     tasks: Optional[Sequence[int]] = None):
    """q(f) moments for several tasks at once (prediction entry point)."""
    Luu = prior_cholesky(params, config)
    tasks = range(config.num_tasks) if tasks is None else tasks
    out = []
    for t, X_t in zip(tasks, X_list):
        out.append(task_qf_moments(params, config, Luu,
                                   jnp.asarray(X_t, config.np_dtype), t))
    return out


# ---------------------------------------------------------------------------
# whitening transforms (for oracle-parity comparisons)
# ---------------------------------------------------------------------------

def whiten_params(params: SVMOGPParams, config: ModelConfig) -> SVMOGPParams:
    """Map un-whitened (m, L) to the whitened coordinates v = Luu^{-1} u.

    ELBO is invariant under this reparameterization, which is what lets the
    whitened model hit the un-whitened oracle's numbers (SURVEY.md §7).
    """
    Luu = prior_cholesky(params, config)
    m_w = linalg.solve_tri(Luu, params.q_mu[..., None])[..., 0]
    L_w = linalg.solve_tri(Luu, jnp.tril(params.q_sqrt))
    return params.replace(q_mu=m_w, q_sqrt=L_w)


def unwhiten_params(params: SVMOGPParams, config: ModelConfig) -> SVMOGPParams:
    Luu = prior_cholesky(params, config)
    m_u = (Luu @ params.q_mu[..., None])[..., 0]
    L_u = Luu @ jnp.tril(params.q_sqrt)
    return params.replace(q_mu=m_u, q_sqrt=L_u)
