"""Gamma likelihood, shape a = e^{f1}, rate b = e^{f2}.

Behavioral contract from reference likelihoods/gamma.py:13-249: a, b =
clip(e^f, 1e-9, 1e9); logpdf = -ln Gamma(a) + a log b + (a-1) log y - b y
(:34-41); 2-D tensor GH var_exp with T=10 (:103-194); predictive with the
GPy default T=20 (:196-238).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import ClassVar

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.ops import quadrature


def _ab(f):
    ef = safe_exp(f)
    return jnp.clip(ef[0], 1e-9, 1e9), jnp.clip(ef[1], 1e-9, 1e9)


@functools.lru_cache(maxsize=None)
def _lngamma_engine(T: int):
    """E_{N(m,v)}[ln Gamma(clip(e^f, 1e-9, 1e9))] on a T-node 1-D GH grid.

    Built on the shared quadrature engine so the (m, v)-gradients use the
    Bonnet/Price custom VJP (E[g'], 1/2 E[g'']) — straight autodiff of the
    sweep differentiates through the node placement m + sqrt(2v) t, whose
    1/sqrt(2v) backward is singular as v -> 0 and NaNs f32 training when a
    marginal variance underflows to exactly 0 (observed at bench step ~1484;
    docs/DESIGN.md §4 documents the same trap for the logpdf engine).
    """
    def fn(f, y):
        return jax.scipy.special.gammaln(jnp.clip(safe_exp(f[0]), 1e-9, 1e9))

    return quadrature.make_var_exp(fn, J=1, T=T)


@dataclasses.dataclass(frozen=True)
class Gamma(Likelihood):
    """``analytic=True`` (default) collapses the reference's 2-D T=10
    tensor-GH var_exp (gamma.py:103-194, T^2 = 100 grid nodes, each
    evaluating gammaln + log + exp) to closed forms plus ONE 1-D GH sweep:
    with a = e^{f1}, b = e^{f2} independent under q,

      E[log p] = -E[ln Gamma(a)]                 (1-D GH over f1, T nodes)
                 + E[a] m2                       (E[a ln b] = E[a] E[f2])
                 + (E[a] - 1) ln y
                 - y e^{m2+v2/2}                 (E[b])

    where E[a] = e^{m1+v1/2}.  Every f2-axis integral is exact instead of
    T-node approximate, and the grid shrinks 100 -> 20 nodes with only the
    gammaln term swept (the sweep is 1-D, so it uses the reference's 1-D
    default T=20 rather than the T=10 the reference drops to only to bound
    its 2-D node count; measured agreement with a same-T engine: 1.5e-12
    at T=20, 1.6e-14 at T=40 — the closed forms are the exact grid limit).
    ``analytic=False`` restores the full tensor-grid engine
    (reference-parity mode)."""

    dim_f: ClassVar[int] = 2
    T_var_exp: ClassVar[int] = quadrature.MULTI_T

    analytic: bool = True

    def var_exp(self, Y, M, V):
        if not self.analytic:
            return Likelihood.var_exp(self, Y, M, V)
        y = Y[:, 0]
        m1, m2 = M[:, 0], M[:, 1]
        v1, v2 = V[:, 0], V[:, 1]
        # the reference clips a, b = e^f to [1e-9, 1e9] at every grid node
        # (gamma.py:29-36), bounding each integral term at ~1e9; the
        # analytic analogue clips the expectations — without it a transient
        # m+v/2 > ~88 during f32 training overflows Ea*m2 / Eb*y to inf
        Ea = jnp.clip(safe_exp(m1 + 0.5 * v1), 1e-9, 1e9)  # E[a]
        Eb = jnp.clip(safe_exp(m2 + 0.5 * v2), 1e-9, 1e9)  # E[b]
        E_gammaln = _lngamma_engine(quadrature.DEFAULT_T)(
            Y, M[:, :1], V[:, :1])
        return -E_gammaln + Ea * m2 + (Ea - 1.0) * jnp.log(y) - Eb * y

    def predictive(self, M, V):
        # closed form of the engine's combination (reference
        # gamma.py:196-238): conditional mean a/b, conditional var a/b^2
        # with a, b independent lognormals under q, so every factor is a
        # lognormal moment: E[y*] = E[a] E[1/b],
        # V[y*] = E[a] E[1/b^2] + E[a^2] E[1/b^2] - E[y*]^2.
        # Positivity: E[a^2] >= E[a]^2 and E[1/b^2] >= E[1/b]^2 (Jensen),
        # so V >= E[a] E[1/b^2] > 0.  Node clips carried onto expectations.
        if not self.analytic:
            return Likelihood.predictive(self, M, V)
        m1, v1 = M[:, :1], V[:, :1]
        m2, v2 = M[:, 1:], V[:, 1:]
        Ea = jnp.clip(safe_exp(m1 + 0.5 * v1), 1e-9, 1e9)
        Ea2 = jnp.clip(safe_exp(2.0 * m1 + 2.0 * v1), 1e-18, 1e18)
        Eib = jnp.clip(safe_exp(-m2 + 0.5 * v2), 1e-9, 1e9)
        Eib2 = jnp.clip(safe_exp(-2.0 * m2 + 2.0 * v2), 1e-18, 1e18)
        mean = Ea * Eib
        return mean, (Ea + Ea2) * Eib2 - jnp.square(mean)

    def logpdf(self, f, y):
        a, b = _ab(f)
        return (-jax.scipy.special.gammaln(a) + a * jnp.log(b)
                + (a - 1.0) * jnp.log(y[0]) - b * y[0])

    def conditional_moments(self, f):
        a, b = _ab(f)
        return (a / b)[None], (a / jnp.square(b))[None]

    def sample(self, key, F):
        ef = safe_exp(F)
        a = jnp.clip(ef[:, :1], 1e-9, 1e9)
        b = jnp.clip(ef[:, 1:2], 1e-9, 1e9)
        return (jax.random.gamma(key, a) / b).astype(F.dtype)
