"""Poisson likelihood, rate lambda = e^f.

Behavioral contract from reference likelihoods/poisson.py:15-138:
logpdf = -e^f + y f - ln Gamma(y+1) (:31-34); 1-D GH var_exp with T=20
(:66-79); predictive via quadrature of mean/variance = e^f (:97-112).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp


@dataclasses.dataclass(frozen=True)
class Poisson(Likelihood):
    """``analytic=True`` (default) computes var_exp in closed form:
    E_{N(f;m,v)}[y f - e^f - ln Gamma(y+1)] = y m - e^{m+v/2} - ln Gamma(y+1),
    the exact limit of the reference's T=20 GH sweep (poisson.py:66-79) —
    no grid, no per-node transcendentals, and autodiff reproduces the
    reference's derivative forms (dm = y - e^{m+v/2}, dv = -e^{m+v/2}/2)
    exactly.  ``analytic=False`` restores the quadrature engine
    (reference-parity mode)."""

    analytic: bool = True

    def var_exp(self, Y, M, V):
        if not self.analytic:
            return Likelihood.var_exp(self, Y, M, V)
        y, m, v = Y[:, 0], M[:, 0], V[:, 0]
        return (y * m - safe_exp(m + 0.5 * v)
                - jax.scipy.special.gammaln(y + 1.0))

    def predictive(self, M, V):
        # closed form of the engine's law-of-total-variance combination
        # (reference poisson.py:97-112): E[y*] = E[e^f] = e^{m+v/2},
        # V[y*] = E[e^f] + E[e^{2f}] - E[e^f]^2 — lognormal moments, the
        # exact limit of the T=20 sweep
        if not self.analytic:
            return Likelihood.predictive(self, M, V)
        # the reference Poisson has NO scale clip, so its engine returns
        # inf - inf = nan once e^{m+v/2} squares past f32 max; the analytic
        # path caps the rate moments at 1e9 / 1e18 (the bound every clipped
        # reference family uses) so serving stays finite at any moments
        Em = jnp.clip(safe_exp(M + 0.5 * V), 0.0, 1e9)
        Em2 = jnp.clip(safe_exp(2.0 * M + 2.0 * V), 0.0, 1e18)
        return Em, Em + Em2 - jnp.square(Em)

    def logpdf(self, f, y):
        ef = safe_exp(f[0])
        return -ef + y[0] * f[0] - jax.scipy.special.gammaln(y[0] + 1.0)

    def conditional_moments(self, f):
        lam = safe_exp(f[:1])
        return lam, lam

    def sample(self, key, F):
        lam = safe_exp(F[:, :1])
        return jax.random.poisson(key, lam).astype(F.dtype)
