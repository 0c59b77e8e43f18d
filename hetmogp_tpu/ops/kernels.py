"""Stationary kernels, batched over the Q latent GPs.

Replaces ``GPy.kern.RBF`` (reference util.py:87, svmogp.py:116-156) and the
rank-1 ``GPy.kern.Coregionalize`` (util.py:120) — the latter collapses to a
plain (Q, D) weight array ``W`` with B_q = W_q W_q^T + diag(kappa), kappa
fixed to 0 (util.py:92-103).

All kernel matrices are built through the matmul form of the pairwise
distance (|x|^2 + |z|^2 - 2 x.z) so the O(N M Dx) inner product rides the
MXU; the exponential epilogue fuses into the same HBM pass under XLA.  A
hand-fused Pallas variant for very large N x M lives in
``hetmogp_tpu.ops.pallas_kernels``.

Hand gradients (``update_gradients_full``/``gradients_X`` in the reference)
do not exist here: everything is differentiated by ``jax.grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hetmogp_tpu.ops import pallas_dispatch


_DIRECT_DIST_MAX_DIM = 4


def _sq_dists(X1: jnp.ndarray, X2: jnp.ndarray, lengthscale: jnp.ndarray) -> jnp.ndarray:
    """Scaled squared distances r2[i,j] = sum_d ((x1[i,d]-x2[j,d])/ls_d)^2.

    X1: (N, Dx), X2: (M, Dx), lengthscale: scalar or (Dx,).

    Low-dimensional inputs (the common GP case) use the direct difference
    form: it is cancellation-free (the |a|^2+|b|^2-2ab form loses ~5 digits
    on near-coincident points feeding an ill-conditioned Gram) and the
    O(N M Dx) elementwise work is VPU-cheap.  Higher dims switch to the
    matmul form so the inner product rides the MXU.
    """
    S1 = X1 / lengthscale
    S2 = X2 / lengthscale
    if X1.shape[-1] <= _DIRECT_DIST_MAX_DIM:
        d = S1[:, None, :] - S2[None, :, :]
        return jnp.sum(jnp.square(d), axis=-1)
    n1 = jnp.sum(jnp.square(S1), axis=-1)
    n2 = jnp.sum(jnp.square(S2), axis=-1)
    cross = S1 @ S2.T
    r2 = n1[:, None] + n2[None, :] - 2.0 * cross
    return jnp.maximum(r2, 0.0)


def rbf(X1, X2, lengthscale, variance):
    """sigma^2 exp(-r2/2) — GPy RBF convention (K(x,x) = variance)."""
    return variance * jnp.exp(-0.5 * _sq_dists(X1, X2, lengthscale))


def matern32(X1, X2, lengthscale, variance):
    r = jnp.sqrt(_sq_dists(X1, X2, lengthscale) + 1e-36)
    s3r = jnp.sqrt(3.0) * r
    return variance * (1.0 + s3r) * jnp.exp(-s3r)


def matern52(X1, X2, lengthscale, variance):
    r2 = _sq_dists(X1, X2, lengthscale)
    r = jnp.sqrt(r2 + 1e-36)
    s5r = jnp.sqrt(5.0) * r
    return variance * (1.0 + s5r + (5.0 / 3.0) * r2) * jnp.exp(-s5r)


def exponential_kernel(X1, X2, lengthscale, variance):
    """Ornstein-Uhlenbeck / Matern-1/2: sigma^2 exp(-r)."""
    r = jnp.sqrt(_sq_dists(X1, X2, lengthscale) + 1e-36)
    return variance * jnp.exp(-r)


def rq(X1, X2, lengthscale, variance, alpha: float = 2.0):
    """Rational quadratic with fixed alpha (scale-mixture of RBFs)."""
    r2 = _sq_dists(X1, X2, lengthscale)
    return variance * (1.0 + r2 / (2.0 * alpha)) ** (-alpha)


_KERNELS = {"rbf": rbf, "matern32": matern32, "matern52": matern52,
            "exponential": exponential_kernel, "rq": rq}


def kern_fn(kind: str):
    try:
        return _KERNELS[kind]
    except KeyError:
        raise ValueError(f"unknown kernel {kind!r}; have {sorted(_KERNELS)}")


def K_batched(kind: str, X: jnp.ndarray, Z: jnp.ndarray, lengthscale: jnp.ndarray,
              variance: jnp.ndarray, *, use_pallas: bool | None = None) -> jnp.ndarray:
    """Cross-covariances for all Q latent GPs at once.

    Args:
      X: (N, Dx) shared inputs.
      Z: (Q, M, Dx) per-latent inducing inputs (the reference tiles a single
         Z into per-q column blocks, svmogp.py:52; we keep the q axis
         explicit).
      lengthscale: (Q, Dx) (broadcasting handles isotropic (Q, 1)).
      variance: (Q,).
    Returns:
      (Q, N, M)
    """
    if kind == "rbf" and pallas_dispatch.should_use_pallas(use_pallas, X, Z):
        return pallas_dispatch.rbf_K_batched_pallas(X, Z, lengthscale, variance)
    f = kern_fn(kind)
    return jax.vmap(lambda z, ls, v: f(X, z, ls, v))(Z, lengthscale, variance)


def K_gram_batched(kind: str, Z: jnp.ndarray, lengthscale: jnp.ndarray,
                   variance: jnp.ndarray) -> jnp.ndarray:
    """Per-latent Gram matrices Kuu: (Q, M, Dx) -> (Q, M, M).

    Replaces ``latent_funs_cov`` (reference util.py:181-200) minus the
    explicit inverse, which no longer exists anywhere.
    """
    f = kern_fn(kind)
    return jax.vmap(lambda z, ls, v: f(z, z, ls, v))(Z, lengthscale, variance)


def Kdiag_batched(kind: str, X: jnp.ndarray, variance: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of K(X, X) for each latent GP: (Q, N).

    All supported stationary kernels have Kdiag = variance.
    """
    n = X.shape[0]
    return jnp.broadcast_to(variance[:, None], (variance.shape[0], n))


def lmc_coregionalization(W: jnp.ndarray, kappa: jnp.ndarray) -> jnp.ndarray:
    """B_q = w_q w_q^T + diag(kappa_q) diagonal entries, (Q, D).

    Only the diagonal B_q[d, d] = w_qd^2 + kappa_qd is ever consumed by the
    model (reference util.py:161,178); the full D x D matrix is never formed.
    """
    return jnp.square(W) + kappa
