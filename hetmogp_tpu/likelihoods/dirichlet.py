"""Dirichlet likelihood over K-dimensional probability vectors.

The reference ships only a constructor stub (likelihoods/dirichlet.py:11-21);
this is the full implementation: concentrations alpha_k = e^{f_k} (clipped
like the reference's Beta/Gamma), y a point on the simplex.

logpdf = lgamma(sum a) - sum lgamma(a) + sum (a_k - 1) log y_k
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.likelihoods.gamma import _lngamma_engine
from hetmogp_tpu.ops import quadrature


@functools.lru_cache(maxsize=None)
def _lngamma_sumK_engine(K: int, T: int, mc_samples: int):
    """E[ln Gamma(sum_k clip(e^{f_k}))] — the ONLY genuinely K-dimensional
    term of the Dirichlet var_exp; shared-engine custom VJP (Bonnet/Price)
    for the v -> 0 backward-singularity reason in gamma._lngamma_engine."""
    def fn(f, y):
        return jax.scipy.special.gammaln(
            jnp.sum(jnp.clip(safe_exp(f), 1e-9, 1e9)))

    return quadrature.make_var_exp(fn, J=K, T=T, mc_samples=mc_samples)


@dataclasses.dataclass(frozen=True)
class Dirichlet(Likelihood):
    """``analytic=True`` (default) reduces the T^K tensor-grid var_exp the
    same way as Beta (beta.py): with alpha_k = e^{f_k} independent under q,

      E[log p] = E[ln Gamma(sum a)]            (K-D grid, 1 gammaln/node)
                 - sum_k E[ln Gamma(a_k)]      (K 1-D T=20 sweeps)
                 + sum_k (E[a_k] - 1) ln y_k   (closed: E[a_k]=e^{m_k+v_k/2})

    Only the coupled ln Gamma(sum a) keeps the K-dimensional grid (T^K or
    ``mc_samples`` quasi-MC nodes), at 1 gammaln per node instead of K+1 —
    and the separable terms get T=20 / exact accuracy instead of the T=5
    the K-D grid is throttled to.  ``analytic=False`` restores the full
    tensor-grid engine."""

    K: int = 3
    # tensor grids are T^K; mc_samples > 0 swaps both var_exp and predictive
    # to that many fixed quasi-MC nodes — O(mc_samples) regardless of K
    mc_samples: int = 0
    analytic: bool = True

    def var_exp(self, Y, M, V):
        if not self.analytic:
            return Likelihood.var_exp(self, Y, M, V)
        n = M.shape[0]
        Ea = jnp.clip(safe_exp(M + 0.5 * V), 1e-9, 1e9)  # (N, K)
        # K separable 1-D sweeps in one engine call on the flattened axis
        # (the engine's y operand is unused by the integrand)
        lg = _lngamma_engine(quadrature.DEFAULT_T)
        E_lga = lg(M.reshape(-1, 1), M.reshape(-1, 1),
                   V.reshape(-1, 1)).reshape(n, self.K)
        E_lgsum = _lngamma_sumK_engine(
            self.K, self.T_var_exp, self.mc_samples)(Y, M, V)
        lin = jnp.sum((Ea - 1.0) * jnp.log(Y), axis=1)
        return E_lgsum - jnp.sum(E_lga, axis=1) + lin

    @property
    def dim_y(self):  # type: ignore[override]
        return self.K

    @property
    def dim_f(self):  # type: ignore[override]
        return self.K

    @property
    def dim_p(self):  # type: ignore[override]
        return self.K

    @property
    def T_var_exp(self):  # type: ignore[override]
        # tensor grid is T^K — use the multi-latent count like the
        # reference's other multi-latent likelihoods
        return quadrature.MULTI_T if self.K <= 2 else 5

    @property
    def T_pred(self):  # type: ignore[override]
        # same K-scaled node count as T_var_exp: the default T=20 would make
        # predictive() build a 20^K grid (8,000 nodes at K=3, 3.2M at K=5)
        return self.T_var_exp

    def ismulti(self) -> bool:
        return True

    def _alpha(self, f):
        return jnp.clip(safe_exp(f), 1e-9, 1e9)

    def logpdf(self, f, y):
        a = self._alpha(f)
        g = jax.scipy.special.gammaln
        return g(jnp.sum(a)) - jnp.sum(g(a)) + jnp.sum((a - 1.0) * jnp.log(y))

    def conditional_moments(self, f):
        a = self._alpha(f)
        a0 = jnp.sum(a)
        mean = a / a0
        var = a * (a0 - a) / (jnp.square(a0) * (a0 + 1.0))
        return mean, var

    def sample(self, key, F):
        a = jax.vmap(self._alpha)(F)
        return jax.random.dirichlet(key, a).astype(F.dtype)
