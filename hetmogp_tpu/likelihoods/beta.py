"""Beta likelihood, a = e^{f1}, b = e^{f2}.

Behavioral contract from reference likelihoods/beta.py:13-252: a, b =
clip(e^f, 1e-9, 1e9) (:29-36); logpdf = (a-1) log y + (b-1) log(1-y)
- betaln(a, b); 2-D tensor GH var_exp with T=10 (:106-146); predictive
moments with the GPy default T=20 (:199-241 — the reference's node-count
inconsistency at beta.py:203, reproduced here for parity).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import ClassVar

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.likelihoods.gamma import _lngamma_engine
from hetmogp_tpu.ops import quadrature


def _ab(f):
    ef = safe_exp(f)
    return jnp.clip(ef[0], 1e-9, 1e9), jnp.clip(ef[1], 1e-9, 1e9)


@functools.lru_cache(maxsize=None)
def _lngamma_sum_engine(T: int):
    """E[ln Gamma(a + b)], a = clip(e^{f1}), b = clip(e^{f2}), on the T^2
    tensor grid — shared-engine custom VJP for the same v -> 0 backward
    singularity reason as gamma._lngamma_engine."""
    def fn(f, y):
        a, b = _ab(f)
        return jax.scipy.special.gammaln(a + b)

    return quadrature.make_var_exp(fn, J=2, T=T)


def _betaln(a, b):
    g = jax.scipy.special.gammaln
    return g(a) + g(b) - g(a + b)


@dataclasses.dataclass(frozen=True)
class Beta(Likelihood):
    """``analytic=True`` (default) reduces the reference's 2-D T=10
    tensor-GH var_exp (beta.py:106-146, T^2 = 100 nodes x 3 gammaln each)
    to closed forms plus cheaper sweeps: with a = e^{f1}, b = e^{f2}
    independent under q,

      E[log p] = (E[a] - 1) ln y + (E[b] - 1) ln(1-y)   (closed: E[a]=e^{m1+v1/2})
                 - E[ln Gamma(a)] - E[ln Gamma(b)]      (two 1-D T=20 sweeps)
                 + E[ln Gamma(a+b)]                     (2-D T=10 grid, 1 gammaln/node)

    Only the coupled ln Gamma(a+b) term genuinely needs the 2-D grid;
    everything separable is integrated exactly or on 1-D grids.  Total
    gammaln evaluations drop 300 -> 140 per data point, and the separable
    axes get T=20 accuracy instead of T=10.  ``analytic=False`` restores
    the full tensor-grid engine (reference-parity mode)."""

    dim_f: ClassVar[int] = 2
    T_var_exp: ClassVar[int] = quadrature.MULTI_T
    # predictive keeps GPy's default T=20 (beta.py:203)

    analytic: bool = True

    def var_exp(self, Y, M, V):
        if not self.analytic:
            return Likelihood.var_exp(self, Y, M, V)
        y = Y[:, 0]
        m1, m2 = M[:, 0], M[:, 1]
        v1, v2 = V[:, 0], V[:, 1]
        # reference node-level clip analogue (beta.py:29-36) — see gamma.py:
        # unclipped E[a] overflows (Ea-1)*ln y under transient f32 extremes
        Ea = jnp.clip(safe_exp(m1 + 0.5 * v1), 1e-9, 1e9)
        Eb = jnp.clip(safe_exp(m2 + 0.5 * v2), 1e-9, 1e9)

        # 1-D sweeps for the separable gammaln terms (reference 1-D T=20)
        lg = _lngamma_engine(quadrature.DEFAULT_T)
        E_lga = lg(Y, M[:, :1], V[:, :1])
        E_lgb = lg(Y, M[:, 1:], V[:, 1:])

        # 2-D grid only for the coupled ln Gamma(a+b) (reference 2-D T=10)
        E_lgab = _lngamma_sum_engine(quadrature.MULTI_T)(Y, M, V)

        return ((Ea - 1.0) * jnp.log(y) + (Eb - 1.0) * jnp.log1p(-y)
                - E_lga - E_lgb + E_lgab)

    def logpdf(self, f, y):
        a, b = _ab(f)
        return (a - 1.0) * jnp.log(y[0]) + (b - 1.0) * jnp.log1p(-y[0]) - _betaln(a, b)

    def conditional_moments(self, f):
        a, b = _ab(f)
        mean = a / (a + b)
        var = a * b / (jnp.square(a + b) * (a + b + 1.0))
        return mean[None], var[None]

    def sample(self, key, F):
        ef = safe_exp(F)
        a = jnp.clip(ef[:, :1], 1e-9, 1e9)
        b = jnp.clip(ef[:, 1:2], 1e-9, 1e9)
        return jax.random.beta(key, a, b).astype(F.dtype)
