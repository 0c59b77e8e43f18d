"""Heteroscedastic Gaussian: f1 = mean, f2 = log-variance.

Behavioral contract from reference likelihoods/hetgaussian.py:11-114:
analytic var_exp using precision = exp(-m2 + v2/2) with a +-1e9 clip
(:46-56); autodiff of that expression reproduces the reference's hand
derivatives (:58-73) exactly in the unclipped region, so no custom VJP is
needed.  ``predictive`` goes through the generic quadrature engine, which is
algebraically identical to the reference's T=20 GH computation (:75-88).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp, safe_square


@dataclasses.dataclass(frozen=True)
class HetGaussian(Likelihood):
    """``analytic=True`` (default) also closes the predictive moments:
    E[y*] = m1, V[y*] = E[e^{f2}] + Var[f1] = e^{m2+v2/2} + v1 — the exact
    limit of the reference's T=20 GH combination (hetgaussian.py:75-88),
    with the scale expectation clipped at the node bound like var_exp's
    precision.  ``analytic=False`` restores the grid engine (var_exp is
    analytic in the reference itself, so it has no engine mode)."""

    dim_f: ClassVar[int] = 2

    analytic: bool = True

    def predictive(self, M, V):
        if not self.analytic:
            return Likelihood.predictive(self, M, V)
        Evar = jnp.clip(safe_exp(M[:, 1:] + 0.5 * V[:, 1:]), 0.0, 1e9)
        return M[:, :1], Evar + V[:, :1]

    def logpdf(self, f, y):
        # -0.5 log 2pi - f2/2 - (y - f1)^2 / (2 e^{f2}) — reference :29-33.
        # The variance floor guards exp-underflow at extreme quadrature
        # nodes (inactive at |f2| < ~20, so parity values are unchanged).
        e_var = jnp.maximum(safe_exp(f[1]), 1e-9)
        ym = y[0] - f[0]
        # -0.5 log(e_var), not -0.5 f[1]: identical where the floor is
        # inactive, saturating with the residual term where it is
        return (-0.5 * jnp.log(2.0 * jnp.pi) - 0.5 * jnp.log(e_var)
                - 0.5 * safe_square(ym) / e_var)

    def var_exp(self, Y, M, V):
        y = Y[:, 0]
        m1, m2 = M[:, 0], M[:, 1]
        v1, v2 = V[:, 0], V[:, 1]
        precision = safe_exp(-m2 + 0.5 * v2)
        precision = jnp.clip(precision, -1e9, 1e9)
        squares = safe_square(y) + safe_square(m1) + v1 - 2.0 * m1 * y
        squares = jnp.clip(squares, -1e9, 1e9)
        return -0.5 * jnp.log(2.0 * jnp.pi) - 0.5 * m2 - 0.5 * precision * squares

    def conditional_moments(self, f):
        return f[:1], safe_exp(f[1:2])

    def sample(self, key, F):
        std = jnp.sqrt(safe_exp(F[:, 1:2]))
        return F[:, :1] + std * jax.random.normal(key, F[:, :1].shape, dtype=F.dtype)
