"""Dirichlet likelihood over K-dimensional probability vectors.

The reference ships only a constructor stub (likelihoods/dirichlet.py:11-21);
this is the full implementation: concentrations alpha_k = e^{f_k} (clipped
like the reference's Beta/Gamma), y a point on the simplex.

logpdf = lgamma(sum a) - sum lgamma(a) + sum (a_k - 1) log y_k
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.ops import quadrature


@dataclasses.dataclass(frozen=True)
class Dirichlet(Likelihood):
    K: int = 3
    # tensor grids are T^K; mc_samples > 0 swaps both var_exp and predictive
    # to that many fixed quasi-MC nodes — O(mc_samples) regardless of K
    mc_samples: int = 0

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
