"""Vmapped Gauss-Hermite quadrature engine with reference-form gradients.

One generic engine replaces the ~1.4k LoC of copy-pasted per-likelihood grid
code in the reference (``likelihoods/*.py``; e.g. the tensor-product grids of
categorical.py:130-222 and beta.py:106-197).

Node counts follow GPy exactly for oracle parity (SURVEY.md §2b):
``_gh_points()`` defaults to T=20; multi-latent likelihoods pass T=10.

Gradient semantics: the reference computes d/dm E[log p] as E[dlogp/df] and
d/dv E[log p] as 0.5 E[d2logp/df2] (Bonnet's and Price's theorems; e.g.
bernoulli.py:97-111).  Direct autodiff of the finite-T quadrature sum gives
the same m-derivative but a *different* (noisier, v->0 singular) v-derivative.
``make_var_exp`` therefore wraps the quadrature in a ``custom_vjp`` whose
backward pass evaluates E[dlogp] and 0.5 E[d2logp] on the same node grid,
with dlogp/d2logp obtained by autodiff of the likelihood's ``logpdf`` —
no hand-derived derivatives anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_T = 20  # GPy Likelihood._gh_points() default
MULTI_T = 10  # passed by multi-latent likelihoods (categorical.py:134, ...)


@functools.lru_cache(maxsize=None)
def gh_points(T: int):
    """Hermite-Gauss nodes/weights as float64 numpy constants."""
    f, w = np.polynomial.hermite.hermgauss(T)
    return f, w


@functools.lru_cache(maxsize=None)
def tensor_grid(T: int, J: int):
    """Tensor-product GH grid over J dims.

    Returns:
      nodes: (T^J, J) float64; weights: (T^J,) already normalized by
      pi^(J/2) so that sum_s w_s g(f_s) approximates E_{N(m,v)}[g].
    """
    f, w = gh_points(T)
    grids = np.meshgrid(*([f] * J), indexing="ij")
    nodes = np.stack([g.reshape(-1) for g in grids], axis=-1)
    wgrids = np.meshgrid(*([w] * J), indexing="ij")
    weights = np.prod(np.stack([g.reshape(-1) for g in wgrids], axis=-1), axis=-1)
    weights = weights / (np.pi ** (J / 2.0))
    return nodes, weights


def _expand_nodes(m, v, nodes):
    """F[n, s, :] = m[n] + sqrt(2 v[n]) * nodes[s]; (N,J),(S,J) -> (N,S,J)."""
    sigma = jnp.sqrt(2.0 * v)
    return m[:, None, :] + sigma[:, None, :] * nodes[None, :, :].astype(m.dtype)


def _logpdf_batch(logpdf, F, y):
    """(N,S,J),(N,dim_y) -> (N,S) via nested vmap of the scalar logpdf."""
    per_point = jax.vmap(logpdf, in_axes=(0, None))  # over S nodes
    return jax.vmap(per_point, in_axes=(0, 0))(F, y)


def _diag_hessian(logpdf):
    """d2 logpdf / df_j^2 for each j: (J,),(dim_y,) -> (J,)."""

    def d2(f, y):
        H = jax.hessian(logpdf, argnums=0)(f, y)
        return jnp.diagonal(H)

    return d2


@functools.lru_cache(maxsize=None)
def mc_nodes(S: int, J: int, seed: int = 0):
    """Fixed standard-normal nodes for quasi-MC expectations.

    For multi-latent likelihoods where the tensor GH grid is infeasible
    (categorical at K > ~4: 10^(K-1) nodes; SURVEY.md §5), a fixed set of S
    normal draws with uniform weights plugs into the same engine: F = m +
    sqrt(v) * eps_s.  Deterministic (build-time seed), so jit-stable and
    reproducible; antithetic pairs halve the variance.
    """
    rng = np.random.RandomState(seed)
    half = rng.standard_normal((S // 2, J))
    eps = np.concatenate([half, -half], axis=0)  # antithetic
    if eps.shape[0] < S:
        eps = np.concatenate([eps, rng.standard_normal((1, J))], axis=0)
    # engine convention: F = m + sqrt(2 v) * node  ->  node = eps / sqrt(2)
    return eps / np.sqrt(2.0), np.full((eps.shape[0],), 1.0 / eps.shape[0])


def make_var_exp(logpdf, J: int, T: int, mc_samples: int = 0):
    """Build ve(y, m, v) -> (N,) with reference-form custom VJP.

    Args:
      logpdf: scalar log-density, signature (f: (J,), y: (dim_y,)) -> ().
      J: number of latent parameter functions (dim_f).
      T: GH nodes per dimension (tensor grid T^J) — used when mc_samples=0.
      mc_samples: if > 0, use that many fixed quasi-MC normal nodes instead
        of the tensor grid (for large J where T^J explodes).
    """
    if mc_samples:
        nodes_np, weights_np = mc_nodes(mc_samples, J)
    else:
        nodes_np, weights_np = tensor_grid(T, J)
    dlogp = jax.grad(logpdf, argnums=0)
    d2logp = _diag_hessian(logpdf)

    def _grid(y, m, v):
        # shared F-grid expansion + logpdf sweep for primal and fwd
        nodes = jnp.asarray(nodes_np, dtype=m.dtype)
        w = jnp.asarray(weights_np, dtype=m.dtype)
        F = _expand_nodes(m, v, nodes)
        return F, w, _logpdf_batch(logpdf, F, y)

    def _ve_raw(y, m, v):
        _, w, lp = _grid(y, m, v)
        return lp @ w

    @jax.custom_vjp
    def ve(y, m, v):
        return _ve_raw(y, m, v)

    def ve_fwd(y, m, v):
        # One fused grid sweep produces the value AND the reduced (N, J)
        # derivative expectations: lp, dlogp and d2logp share their
        # transcendental subexpressions (e.g. exp(f) for Poisson appears
        # in all three), which XLA CSE can only exploit when they live in
        # the same program.  Residuals are the tiny reduced tensors, so
        # the backward is two elementwise multiplies — the grid is never
        # re-expanded or re-evaluated (the previous engine re-ran both
        # derivative grids in the backward pass).
        F, w, lp = _grid(y, m, v)
        per_point_d1 = jax.vmap(dlogp, in_axes=(0, None))
        d1 = jax.vmap(per_point_d1, in_axes=(0, 0))(F, y)  # (N,S,J)
        per_point_d2 = jax.vmap(d2logp, in_axes=(0, None))
        d2 = jax.vmap(per_point_d2, in_axes=(0, 0))(F, y)  # (N,S,J)
        Ed1 = jnp.einsum("nsj,s->nj", d1, w)
        Ed2 = jnp.einsum("nsj,s->nj", d2, w)
        return lp @ w, (y, Ed1, Ed2)

    def ve_bwd(res, g):
        y, Ed1, Ed2 = res
        dm = Ed1 * g[:, None]
        dv = 0.5 * Ed2 * g[:, None]
        return jnp.zeros_like(y), dm, dv

    ve.defvjp(ve_fwd, ve_bwd)
    return ve


def make_var_exp_theta(logpdf_t, J: int, T: int, mc_samples: int = 0):
    """Theta-aware variant of make_var_exp: ve(y, m, v, theta) -> (N,).

    ``theta`` is a trainable likelihood-parameter vector shared across data
    points (e.g. Ordinal cut-points).  The custom VJP keeps the reference-
    form (dm, dv) = (E[dlogp/df], 0.5 E[d2logp/df2]) and adds
    dtheta = sum_n E[dlogp/dtheta] from autodiff of the scalar logpdf —
    no hand derivatives.

    Args:
      logpdf_t: scalar log-density (f: (J,), y: (dim_y,), theta: (P,)) -> ().
    """
    if mc_samples:
        nodes_np, weights_np = mc_nodes(mc_samples, J)
    else:
        nodes_np, weights_np = tensor_grid(T, J)
    dlogp = jax.grad(logpdf_t, argnums=0)
    dtheta_fn = jax.grad(logpdf_t, argnums=2)

    def _d2(f, y, theta):
        H = jax.hessian(logpdf_t, argnums=0)(f, y, theta)
        return jnp.diagonal(H)

    def _grid_t(y, m, v, theta):
        # shared F-grid expansion + logpdf sweep for primal and fwd
        nodes = jnp.asarray(nodes_np, dtype=m.dtype)
        w = jnp.asarray(weights_np, dtype=m.dtype)
        F = _expand_nodes(m, v, nodes)
        per_point = jax.vmap(logpdf_t, in_axes=(0, None, None))
        lp = jax.vmap(per_point, in_axes=(0, 0, None))(F, y, theta)
        return F, w, lp

    def _ve_raw(y, m, v, theta):
        _, w, lp = _grid_t(y, m, v, theta)
        return lp @ w

    @jax.custom_vjp
    def ve(y, m, v, theta):
        return _ve_raw(y, m, v, theta)

    def ve_fwd(y, m, v, theta):
        # fused single grid sweep; see make_var_exp's ve_fwd
        F, w, lp = _grid_t(y, m, v, theta)
        d1 = jax.vmap(jax.vmap(dlogp, in_axes=(0, None, None)),
                      in_axes=(0, 0, None))(F, y, theta)  # (N,S,J)
        d2 = jax.vmap(jax.vmap(_d2, in_axes=(0, None, None)),
                      in_axes=(0, 0, None))(F, y, theta)  # (N,S,J)
        dt = jax.vmap(jax.vmap(dtheta_fn, in_axes=(0, None, None)),
                      in_axes=(0, 0, None))(F, y, theta)  # (N,S,P)
        Ed1 = jnp.einsum("nsj,s->nj", d1, w)
        Ed2 = jnp.einsum("nsj,s->nj", d2, w)
        Edt = jnp.einsum("nsp,s->np", dt, w)
        return lp @ w, (y, Ed1, Ed2, Edt)

    def ve_bwd(res, g):
        y, Ed1, Ed2, Edt = res
        dm = Ed1 * g[:, None]
        dv = 0.5 * Ed2 * g[:, None]
        dth = jnp.einsum("np,n->p", Edt, g)
        return jnp.zeros_like(y), dm, dv, dth

    ve.defvjp(ve_fwd, ve_bwd)
    return ve


def make_predictive(cond_moments, dim_p: int, J: int, T: int,
                    mc_samples: int = 0):
    """Generic observation-space predictive moments via GH quadrature.

    E[y*] = E_q[mean(f)],  V[y*] = E_q[var(f)] + E_q[mean(f)^2] - E[y*]^2 —
    the law-of-total-variance combination every reference likelihood codes by
    hand (e.g. bernoulli.py:113-128, hetgaussian.py:75-88).

    Args:
      cond_moments: (f: (J,)) -> (mean: (dim_p,), var: (dim_p,)).
      mc_samples: if > 0, replace the T^J tensor grid with that many fixed
        quasi-MC nodes (same escape hatch as make_var_exp, for large J).
    """
    if mc_samples:
        nodes_np, weights_np = mc_nodes(mc_samples, J)
    else:
        nodes_np, weights_np = tensor_grid(T, J)

    def predictive(m, v):
        nodes = jnp.asarray(nodes_np, dtype=m.dtype)
        w = jnp.asarray(weights_np, dtype=m.dtype)
        F = _expand_nodes(m, v, nodes)  # (N,S,J)
        cm, cv = jax.vmap(jax.vmap(cond_moments))(F)  # (N,S,dim_p) each
        Em = jnp.einsum("nsp,s->np", cm, w)
        Em2 = jnp.einsum("nsp,s->np", jnp.square(cm), w)
        Ev = jnp.einsum("nsp,s->np", cv, w)
        return Em, Ev + Em2 - jnp.square(Em)

    return predictive


def mc_log_predictive(logpdf, key, y, m_star, v_star, num_samples: int,
                      reference_scaling: bool = True, eps=None):
    """Monte-Carlo NLPD inner term, mirroring the reference exactly.

    Samples F* ~ N(m*, v*) per latent dim, computes
    log(1/S sum_s p(y|f_s)) via logsumexp, sums over points, and applies the
    reference's extra 1/num_samples factor (e.g. hetgaussian.py:100-102 —
    reproduced deliberately for parity; pass reference_scaling=False for the
    plain sum).
    """
    n, J = m_star.shape
    if eps is None:
        eps = jax.random.normal(key, (n, num_samples, J), dtype=m_star.dtype)
    else:
        eps = jnp.asarray(eps, m_star.dtype)  # injected draws (oracle tests)
    F = m_star[:, None, :] + jnp.sqrt(v_star)[:, None, :] * eps
    lp = _logpdf_batch(logpdf, F, y)  # (N,S)
    log_pred = jax.scipy.special.logsumexp(lp, axis=-1) - jnp.log(
        jnp.asarray(float(num_samples), m_star.dtype))
    total = jnp.sum(log_pred)
    if reference_scaling:
        total = total / num_samples
    return total
