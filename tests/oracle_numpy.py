"""Independent NumPy oracle of the reference equations.

GPy is not installable in this environment, so the numerical oracle for the
golden tests is this file: a from-scratch NumPy implementation of the exact
equations the reference computes (un-whitened q(u), explicit inverses,
per-output-function loops, GH tensor grids with GPy's node counts).  It is
deliberately written in the reference's computational style — per-d Python
loops, dense inverses — and shares no code with the JAX package, so an
agreement to 1e-9 is a genuine cross-check of the math.

Equation sources (for auditing, not copied code):
  q(f_d) moments:     /root/reference/hetmogp/svmogp_inf.py:186-225
  KL divergence:      /root/reference/hetmogp/svmogp_inf.py:227-250
  ELBO assembly:      /root/reference/hetmogp/svmogp_inf.py:72-88
  covariances:        /root/reference/hetmogp/util.py:145-200
  GH quadrature:      /root/reference/likelihoods/*.py (T=20 default, T=10
                      multi-latent)
"""

from __future__ import annotations

import numpy as np
from scipy import linalg as sla
from scipy import special as ssp


# ---------------------------------------------------------------------------
# kernels / covariances
# ---------------------------------------------------------------------------

def rbf(X1, X2, lengthscale, variance):
    d = X1[:, None, :] / lengthscale - X2[None, :, :] / lengthscale
    return variance * np.exp(-0.5 * np.sum(d ** 2, axis=-1))


def latent_funs_cov(Z, lengthscales, variances):
    """Kuu, Luu, Kuui per latent GP (explicit inverse, like the reference)."""
    Q, M = Z.shape[0], Z.shape[1]
    Kuu = np.empty((Q, M, M))
    Luu = np.empty((Q, M, M))
    Kuui = np.empty((Q, M, M))
    for q in range(Q):
        Kuu[q] = rbf(Z[q], Z[q], lengthscales[q], variances[q])
        Luu[q] = np.linalg.cholesky(Kuu[q])
        ident = np.eye(M)
        Kuui[q] = sla.cho_solve((Luu[q], True), ident)
    return Kuu, Luu, Kuui


def qf_moments(X, Z, W, kappa, lengthscales, variances, m_u, L_u, d):
    """Mean/variance of q(f_d) at X — reference calculate_q_f equations."""
    Q, M = Z.shape[0], Z.shape[1]
    N = X.shape[0]
    Kuu, Luu, Kuui = latent_funs_cov(Z, lengthscales, variances)
    m_fd = np.zeros(N)
    v_fd = np.zeros(N)
    for q in range(Q):
        w = W[q, d]
        Kfdu_q = w * rbf(X, Z[q], lengthscales[q], variances[q])  # (N, M)
        kffdiag_q = (w ** 2 + kappa[q, d]) * variances[q] * np.ones(N)
        R = sla.cho_solve((Luu[q], True), Kfdu_q.T)  # (M, N) = Kuu^-1 Kuf
        m_fd += R.T @ m_u[q]
        S_q = L_u[q] @ L_u[q].T
        v_fd += kffdiag_q
        v_fd += np.einsum("mn,mk,kn->n", R, S_q, R)
        v_fd -= np.sum(R * Kfdu_q.T, axis=0)
    return m_fd, v_fd


def kl_divergence(Z, lengthscales, variances, m_u, L_u):
    """sum_q KL(q||p) with explicit inverses — reference calculate_KL."""
    Q, M = Z.shape[0], Z.shape[1]
    Kuu, Luu, Kuui = latent_funs_cov(Z, lengthscales, variances)
    kl = 0.0
    for q in range(Q):
        S = L_u[q] @ L_u[q].T
        kl += 0.5 * np.sum(Kuui[q] * S)
        kl += 0.5 * m_u[q] @ Kuui[q] @ m_u[q]
        kl -= 0.5 * M
        kl += np.sum(np.log(np.abs(np.diag(Luu[q]))))
        kl -= np.sum(np.log(np.abs(np.diag(L_u[q]))))
    return kl


# ---------------------------------------------------------------------------
# likelihood logpdfs (NumPy, reference formulas with their clips)
# ---------------------------------------------------------------------------

def logpdf_gaussian(F, y, sigma=0.5):
    # reference gaussian.py:32-34 — standard normal at the residual
    del sigma
    return -0.5 * np.log(2 * np.pi) - 0.5 * (y[:, 0] - F[:, 0]) ** 2


def logpdf_hetgaussian(F, y):
    e_var = np.exp(F[:, 1])
    return -0.5 * np.log(2 * np.pi) - 0.5 * F[:, 1] - 0.5 * (y[:, 0] - F[:, 0]) ** 2 / e_var


def logpdf_bernoulli(F, y):
    p = np.clip(np.exp(F[:, 0]) / (1 + np.exp(F[:, 0])), 1e-9, 1 - 1e-9)
    return y[:, 0] * np.log(p) + (1 - y[:, 0]) * np.log(1 - p)


def logpdf_poisson(F, y):
    return -np.exp(F[:, 0]) + y[:, 0] * F[:, 0] - ssp.gammaln(y[:, 0] + 1)


def logpdf_exponential(F, y):
    b = np.clip(np.exp(-F[:, 0]), 1e-9, 1e9)
    return -np.log(b) - y[:, 0] / b


def logpdf_beta(F, y):
    a = np.clip(np.exp(F[:, 0]), 1e-9, 1e9)
    b = np.clip(np.exp(F[:, 1]), 1e-9, 1e9)
    return (a - 1) * np.log(y[:, 0]) + (b - 1) * np.log(1 - y[:, 0]) - ssp.betaln(a, b)


def logpdf_gamma(F, y):
    a = np.clip(np.exp(F[:, 0]), 1e-9, 1e9)
    b = np.clip(np.exp(F[:, 1]), 1e-9, 1e9)
    return -ssp.gammaln(a) + a * np.log(b) + (a - 1) * np.log(y[:, 0]) - b * y[:, 0]


def logpdf_categorical(F, y, K):
    eF = np.exp(F)
    den = 1 + eF.sum(axis=1, keepdims=True)
    p = np.concatenate([eF / den, 1.0 / den], axis=1)
    p = np.clip(p, 1e-9, 1 - 1e-9)
    p = p / p.sum(axis=1, keepdims=True)
    onehot = np.zeros((y.shape[0], K))
    for k in range(K):
        onehot[:, k] = (y[:, 0] == k + 1).astype(float)
    return np.sum(onehot * np.log(p), axis=1)


# ---------------------------------------------------------------------------
# quadrature
# ---------------------------------------------------------------------------

def gh_var_exp(logpdf, Y, M_, V_, T):
    """Tensor-product GH variational expectation, any dim_f."""
    N, J = M_.shape
    f, w = np.polynomial.hermite.hermgauss(T)
    grids = np.meshgrid(*([f] * J), indexing="ij")
    nodes = np.stack([g.reshape(-1) for g in grids], axis=-1)  # (S, J)
    wg = np.meshgrid(*([w] * J), indexing="ij")
    weights = np.prod(np.stack([g.reshape(-1) for g in wg], -1), -1) / np.pi ** (J / 2)
    out = np.zeros(N)
    for s in range(nodes.shape[0]):
        F = M_ + np.sqrt(2 * V_) * nodes[s]  # (N, J)
        out += weights[s] * logpdf(F, Y)
    return out


def gh_var_exp_derivs(dlogp, d2logp, Y, M_, V_, T):
    """E[dlogp/df_j] and 0.5 E[d2logp/df_j^2] on the GH node grid from
    hand-derived analytic derivative functions (reference dlogp_df /
    d2logp_df2 forms) — the strong cross-check of the autodiff-based engine.

    dlogp/d2logp: (F (N,J), Y) -> (N, J).
    """
    N, J = M_.shape
    f, w = np.polynomial.hermite.hermgauss(T)
    grids = np.meshgrid(*([f] * J), indexing="ij")
    nodes = np.stack([g.reshape(-1) for g in grids], axis=-1)
    wg = np.meshgrid(*([w] * J), indexing="ij")
    weights = np.prod(np.stack([g.reshape(-1) for g in wg], -1), -1) / np.pi ** (J / 2)
    dm = np.zeros((N, J))
    dv = np.zeros((N, J))
    for s in range(nodes.shape[0]):
        F = M_ + np.sqrt(2 * V_) * nodes[s]
        dm += weights[s] * dlogp(F, Y)
        dv += weights[s] * 0.5 * d2logp(F, Y)
    return dm, dv


# hand-derived first/second derivatives of each logpdf wrt f (reference
# dlogp_df / d2logp_df2 contracts, freshly derived) -------------------------

def _sigmoid(f):
    return 1.0 / (1.0 + np.exp(-f))


def dlogp_gaussian(F, y):
    return y - F


def d2logp_gaussian(F, y):
    return -np.ones_like(F)


def dlogp_hetgaussian(F, y):
    prec = np.exp(-F[:, 1])
    r = y[:, 0] - F[:, 0]
    return np.stack([r * prec, -0.5 + 0.5 * r ** 2 * prec], axis=1)


def d2logp_hetgaussian(F, y):
    prec = np.exp(-F[:, 1])
    r = y[:, 0] - F[:, 0]
    return np.stack([-prec, -0.5 * r ** 2 * prec], axis=1)


def dlogp_bernoulli(F, y):
    return y - _sigmoid(F)


def d2logp_bernoulli(F, y):
    p = _sigmoid(F)
    return -p * (1 - p)


def dlogp_poisson(F, y):
    return y - np.exp(F)


def d2logp_poisson(F, y):
    return -np.exp(F)


def dlogp_exponential(F, y):
    # logp = f - y e^f
    return 1.0 - y * np.exp(F)


def d2logp_exponential(F, y):
    return -y * np.exp(F)


def dlogp_beta(F, y):
    a, b = np.exp(F[:, 0]), np.exp(F[:, 1])
    psiab = ssp.psi(a + b)
    da = a * (psiab - ssp.psi(a) + np.log(y[:, 0]))
    db = b * (psiab - ssp.psi(b) + np.log(1 - y[:, 0]))
    return np.stack([da, db], axis=1)


def d2logp_beta(F, y):
    a, b = np.exp(F[:, 0]), np.exp(F[:, 1])
    psiab, z_ab = ssp.psi(a + b), ssp.zeta(2, a + b)
    da = a * (psiab + a * z_ab - ssp.psi(a) - a * ssp.zeta(2, a) + np.log(y[:, 0]))
    db = b * (psiab + b * z_ab - ssp.psi(b) - b * ssp.zeta(2, b) + np.log(1 - y[:, 0]))
    return np.stack([da, db], axis=1)


def dlogp_gamma(F, y):
    a, b = np.exp(F[:, 0]), np.exp(F[:, 1])
    da = a * (-ssp.psi(a) + np.log(b) + np.log(y[:, 0]))
    db = a - b * y[:, 0]
    return np.stack([da, db], axis=1)


def d2logp_gamma(F, y):
    a, b = np.exp(F[:, 0]), np.exp(F[:, 1])
    da = a * (-ssp.psi(a) - a * ssp.zeta(2, a) + np.log(b) + np.log(y[:, 0]))
    db = -b * y[:, 0]
    return np.stack([da, db], axis=1)


def dlogp_categorical(F, y, K):
    eF = np.exp(F)
    rho = eF / (1 + eF.sum(axis=1, keepdims=True))
    onehot = np.zeros_like(F)
    for j in range(K - 1):
        onehot[:, j] = (y[:, 0] == j + 1).astype(float)
    return onehot - rho


def d2logp_categorical(F, y, K):
    eF = np.exp(F)
    rho = eF / (1 + eF.sum(axis=1, keepdims=True))
    return -rho * (1 - rho)


# ---------------------------------------------------------------------------
# full ELBO for a heterogeneous model
# ---------------------------------------------------------------------------

def elbo(X_list, Y_list, Z, W, kappa, lengthscales, variances, m_u, L_u,
         task_specs, scales):
    """Reference-equation ELBO.

    task_specs: list of (logpdf_fn, dim_f, T_nodes) per task.
    W: (Q, D) mixing weights over the global function axis.
    """
    d_global = 0
    ve_total = 0.0
    for t, (logpdf_fn, dim_f, T_nodes) in enumerate(task_specs):
        N = X_list[t].shape[0]
        m_F = np.zeros((N, dim_f))
        v_F = np.zeros((N, dim_f))
        for j in range(dim_f):
            m_F[:, j], v_F[:, j] = qf_moments(
                X_list[t], Z, W, kappa, lengthscales, variances, m_u, L_u,
                d_global + j)
        ve = gh_var_exp(logpdf_fn, Y_list[t], m_F, v_F, T_nodes)
        ve_total += scales[t] * ve.sum()
        d_global += dim_f
    kl = kl_divergence(Z, lengthscales, variances, m_u, L_u)
    return ve_total - kl


# ---------------------------------------------------------------------------
# prediction paths (reference svmogp.py:255-306, het_likelihood.py:133-164)
# ---------------------------------------------------------------------------

def qf_full_cov(X, Z, W, kappa, lengthscales, variances, m_u, L_u, d):
    """Mean and FULL covariance of q(f_d) at X — the S_fd the reference
    materializes in calculate_q_f (svmogp_inf.py:186-225)."""
    Q, M = Z.shape[0], Z.shape[1]
    N = X.shape[0]
    Kuu, Luu, Kuui = latent_funs_cov(Z, lengthscales, variances)
    m_fd = np.zeros(N)
    S_fd = np.zeros((N, N))
    for q in range(Q):
        w = W[q, d]
        Kfdu_q = w * rbf(X, Z[q], lengthscales[q], variances[q])  # (N, M)
        Kffd_q = (w ** 2 + kappa[q, d]) * rbf(X, X, lengthscales[q],
                                              variances[q])
        A = sla.cho_solve((Luu[q], True), Kfdu_q.T).T  # (N, M) = Kfdu Kuu^-1
        m_fd += A @ m_u[q]
        S_q = L_u[q] @ L_u[q].T
        S_fd += Kffd_q - A @ Kfdu_q.T + A @ S_q @ A.T
    return m_fd, S_fd


def raw_predict_f(Xtrain, Xnew, Z, W, kappa, lengthscales, variances,
                  m_u, L_u, d):
    """Reference ``_raw_predict_f`` (svmogp.py:255-278): GPy Posterior
    Woodbury projection of q(f_d) at the training inputs through the
    function-space prior Kfdfd.

    woodbury_vector = K^-1 m,  woodbury_inv = K^-1 - K^-1 S K^-1,
    mu* = Kx^T wv,  var* = |Kxx_diag - diag(Kx^T wi Kx)|.
    """
    Q = Z.shape[0]
    m_fd, S_fd = qf_full_cov(Xtrain, Z, W, kappa, lengthscales, variances,
                             m_u, L_u, d)
    B_dd = np.array([W[q, d] ** 2 + kappa[q, d] for q in range(Q)])
    Kdd = np.zeros((Xtrain.shape[0], Xtrain.shape[0]))
    Kx = np.zeros((Xtrain.shape[0], Xnew.shape[0]))
    kxx_diag = np.zeros(Xnew.shape[0])
    for q in range(Q):
        Kdd += B_dd[q] * rbf(Xtrain, Xtrain, lengthscales[q], variances[q])
        Kx += B_dd[q] * rbf(Xtrain, Xnew, lengthscales[q], variances[q])
        kxx_diag += B_dd[q] * variances[q]
    Kdd_i = np.linalg.inv(Kdd)
    wv = Kdd_i @ m_fd
    wi = Kdd_i - Kdd_i @ S_fd @ Kdd_i
    mu = Kx.T @ wv
    var = np.abs(kxx_diag - np.einsum("nx,nk,kx->x", Kx, wi, Kx))
    return mu, var


def gh_predictive(cond_moments, M_, V_, T):
    """Observation-space GH predictive moments, law of total variance
    (reference het_likelihood.py:133-148 -> per-likelihood predictive).

    cond_moments: (F (N, J)) -> (mean (N, P), var (N, P)).
    """
    N, J = M_.shape
    f, w = np.polynomial.hermite.hermgauss(T)
    grids = np.meshgrid(*([f] * J), indexing="ij")
    nodes = np.stack([g.reshape(-1) for g in grids], axis=-1)
    wg = np.meshgrid(*([w] * J), indexing="ij")
    weights = np.prod(np.stack([g.reshape(-1) for g in wg], -1), -1) / np.pi ** (J / 2)
    Em = Em2 = Ev = 0.0
    for s in range(nodes.shape[0]):
        F = M_ + np.sqrt(2 * V_) * nodes[s]
        cm, cv = cond_moments(F)
        Em = Em + weights[s] * cm
        Em2 = Em2 + weights[s] * cm ** 2
        Ev = Ev + weights[s] * cv
    return Em, Ev + Em2 - Em ** 2


def mc_log_predictive(logpdf, eps, Y, M_star, V_star, reference_scaling=True):
    """Reference NLPD inner term (het_likelihood.py:150-164) with injected
    standard-normal draws eps (N, S, J) so the comparison is deterministic;
    includes the reference's extra 1/num_samples factor."""
    n, S, J = eps.shape
    F = M_star[:, None, :] + np.sqrt(V_star)[:, None, :] * eps
    lp = np.stack([logpdf(F[:, s, :], Y) for s in range(S)], axis=1)  # (N,S)
    log_pred = ssp.logsumexp(lp, axis=1) - np.log(S)
    total = log_pred.sum()
    if reference_scaling:
        total = total / S
    return total
