"""Likelihood protocol.

Mirrors the reference's per-distribution contract (reference README.md:44-47:
``logpdf``, ``var_exp``, ``var_exp_derivatives``, ``predictive``,
``log_predictive``, ``samples``, ``get_metadata``, ``ismulti``) but drives
everything from a single scalar ``logpdf(f, y)`` plus optional
``conditional_moments(f)``:

* ``var_exp`` / ``var_exp_derivatives`` come from the shared vmapped
  Gauss-Hermite engine (ops/quadrature.py) unless a subclass overrides them
  analytically (Gaussian, HetGaussian).
* ``predictive`` comes from the generic law-of-total-variance quadrature.
* ``dlogp_df`` / ``d2logp_df2`` (hand-derived in every reference likelihood,
  e.g. bernoulli.py:66-80) do not exist: autodiff of ``logpdf`` supplies them
  inside the engine's custom VJP.

Instances are frozen dataclasses — hashable and therefore valid jit statics.
Array conventions: per-task ``Y`` is (N, dim_y); ``M``/``V`` (posterior
moments of the parameter functions) are (N, dim_f); ``var_exp`` returns (N,).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.ops import quadrature


def safe_exp(x):
    """exp with the argument clipped to the dtype's overflow limit.

    Equivalent in effect to GPy's ``safe_exp`` (used throughout the reference
    likelihoods): saturates instead of producing inf.
    """
    lim = np.log(np.finfo(jnp.result_type(x)).max) - 1.0
    return jnp.exp(jnp.clip(x, -jnp.inf, lim))


def safe_square(x):
    lim = np.sqrt(np.finfo(jnp.result_type(x)).max) / 2.0
    return jnp.square(jnp.clip(x, -lim, lim))


@functools.lru_cache(maxsize=None)
def _var_exp_engine(lik):
    return quadrature.make_var_exp(lik.logpdf, J=lik.dim_f, T=lik.T_var_exp,
                                   mc_samples=getattr(lik, "mc_samples", 0))


@functools.lru_cache(maxsize=None)
def _var_exp_engine_theta(lik):
    return quadrature.make_var_exp_theta(
        lik.logpdf_t, J=lik.dim_f, T=lik.T_var_exp,
        mc_samples=getattr(lik, "mc_samples", 0))


@functools.lru_cache(maxsize=None)
def _predictive_engine(lik):
    return quadrature.make_predictive(
        lik.conditional_moments, dim_p=lik.dim_p, J=lik.dim_f, T=lik.T_pred,
        mc_samples=getattr(lik, "mc_samples", 0))


from typing import ClassVar


@dataclasses.dataclass(frozen=True)
class Likelihood:
    """Base class; subclasses set the class attributes and ``logpdf``."""

    # metadata — reference ``get_metadata()`` triple (dim_y, dim_f, dim_p)
    dim_y: ClassVar[int] = 1
    dim_f: ClassVar[int] = 1
    dim_p: ClassVar[int] = 1
    # GH nodes: GPy default T=20; multi-latent var_exp uses T=10 (SURVEY §2b)
    T_var_exp: ClassVar[int] = quadrature.DEFAULT_T
    T_pred: ClassVar[int] = quadrature.DEFAULT_T
    # size of the TRAINABLE likelihood-parameter vector theta (0 = none).
    # The reference has no trainable likelihood parameters at all (e.g. the
    # Gaussian sigma is fixed, gaussian.py:21-24); subclasses with n_theta>0
    # (Ordinal cut-points) override logpdf_t/default_theta/with_theta, and
    # training flows theta through the params pytree (params.lik_theta) when
    # TrainConfig.learn_lik_params is on.
    n_theta: ClassVar[int] = 0

    # ---- to be provided by subclasses -----------------------------------
    def logpdf(self, f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Scalar log p(y | f); f: (dim_f,), y: (dim_y,)."""
        raise NotImplementedError

    def conditional_moments(self, f: jnp.ndarray):
        """(mean, var) of y | f, each (dim_p,)."""
        raise NotImplementedError

    def sample(self, key, F: jnp.ndarray) -> jnp.ndarray:
        """One observation per row of F: (N, dim_f) -> (N, dim_y)."""
        raise NotImplementedError

    # ---- generic machinery ----------------------------------------------
    def get_metadata(self):
        return self.dim_y, self.dim_f, self.dim_p

    def ismulti(self) -> bool:
        return False

    def logpdf_batch(self, F: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        """(N, dim_f), (N, dim_y) -> (N,)."""
        return jax.vmap(self.logpdf)(F, Y)

    def logpdf_t(self, f: jnp.ndarray, y: jnp.ndarray,
                 theta: jnp.ndarray) -> jnp.ndarray:
        """logpdf with an explicit likelihood-parameter vector.  Default:
        theta is empty/ignored; n_theta>0 subclasses override."""
        return self.logpdf(f, y)

    def default_theta(self, dtype=np.float64) -> np.ndarray:
        """Initial theta (n_theta,) matching the static constructor values."""
        return np.zeros((0,), dtype)

    def with_theta(self, theta) -> "Likelihood":
        """A new (static) instance whose constructor constants equal theta —
        for prediction after training theta through the params pytree."""
        if self.n_theta:
            raise NotImplementedError(
                f"{type(self).__name__} must override with_theta")
        return self

    def var_exp(self, Y, M, V, theta=None):
        """E_{N(f; M, V)}[log p(Y | f)] per data point -> (N,).

        theta: optional trainable likelihood-parameter vector (n_theta,);
        None (or n_theta == 0) uses the static constructor constants.
        """
        if theta is not None and self.n_theta:
            return _var_exp_engine_theta(self)(Y, M, V, theta)
        return _var_exp_engine(self)(Y, M, V)

    def var_exp_derivatives(self, Y, M, V):
        """(dVE/dM, dVE/dV), each (N, dim_f) — reference gradient forms."""
        _, vjp = jax.vjp(lambda m, v: self.var_exp(Y, m, v), M, V)
        ones = jnp.ones((M.shape[0],), dtype=M.dtype)
        return vjp(ones)

    def predictive(self, M, V):
        """Observation-space predictive moments -> ((N, dim_p), (N, dim_p))."""
        return _predictive_engine(self)(M, V)

    def log_predictive(self, key, Ytest, M_star, V_star, num_samples: int,
                       reference_scaling: bool = True, eps=None):
        """Monte-Carlo log-predictive density.  ``reference_scaling=True``
        reproduces the reference's extra 1/num_samples factor (see
        ops/quadrature.mc_log_predictive); False gives the plain summed
        log-predictive.  ``eps`` injects the (N, S, J) standard-normal draws
        (deterministic oracle comparisons).
        """
        return quadrature.mc_log_predictive(
            self.logpdf, key, Ytest, M_star, V_star, num_samples,
            reference_scaling=reference_scaling, eps=eps)
