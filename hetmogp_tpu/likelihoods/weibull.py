"""Weibull likelihood: survival/duration data, scale b = e^{-f}, shape k.

Beyond the reference (Exponential is its only duration likelihood,
likelihoods/exponential.py): real time-to-event data has non-constant hazard
— wear-out (k > 1) or infant mortality (k < 1) — which the Exponential's
memoryless hazard cannot express.  With the SAME link convention as the
reference Exponential (scale b = e^{-f}, exponential.py:28-32):

    log p(y | f) = log k - log b + (k - 1) log(y / b) - (y / b)^k
    E[y]   = b Gamma(1 + 1/k)
    Var[y] = b^2 [Gamma(1 + 2/k) - Gamma(1 + 1/k)^2]

``Weibull(k=1)`` is bit-for-bit the reference Exponential (tested), so this
is a strict generalization.  ``learn_k=True`` trains log k through the theta
machinery (params.lik_theta + TrainConfig.learn_lik_params), like
NegativeBinomial.learn_r; the theta path stays analytic by default (see the
class docstring) and falls back to the shared GH engine on ``logpdf_t`` when
``analytic=False``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp, safe_square


def _scale(f):
    # reference Exponential's clip (exponential.py:28-32)
    return jnp.clip(safe_exp(-f), 1e-9, 1e9)


@dataclasses.dataclass(frozen=True)
class Weibull(Likelihood):
    """``analytic=True`` (default) computes var_exp in closed form: with
    b = e^{-f} the logpdf is log k + k f + (k-1) log y - y^k e^{k f}, so

        E_{N(f;m,v)}[log p] = log k + k m + (k-1) log y
                              - e^{k (log y + m) + k^2 v / 2}

    — the exact limit of the GH sweep, reducing bit-for-bit to the
    Exponential's closed form at k = 1.  The theta path (``learn_k``) stays
    analytic too (the form is smooth in k = e^theta).  ``analytic=False``
    restores the quadrature engine (reference-parity mode; the engine's
    [1e-9, 1e9] scale clip only bites at |f| > ~20.7)."""

    k: float = 1.5  # shape; k = 1 recovers Exponential
    learn_k: bool = False
    analytic: bool = True

    def var_exp(self, Y, M, V, theta=None):
        if not self.analytic:
            return Likelihood.var_exp(self, Y, M, V, theta)
        if theta is not None and self.n_theta:
            k = jnp.exp(theta[0])
        else:
            k = self.k
        y = jnp.clip(Y[:, 0], 1e-30, None)
        m, v = M[:, 0], V[:, 0]
        log_y = jnp.log(y)
        # E[(y e^f)^k] = (y e^{m + k v/2})^k, with the scale expectation
        # e^{m + k v/2} carrying the engine's node-level e^f in [1e-9, 1e9]
        # clip (see _scale / exponential.py) so a transient extreme m during
        # f32 training saturates instead of overflowing
        log_scale = jnp.clip(m + 0.5 * k * v,
                             math.log(1e-9), math.log(1e9))
        return (jnp.log(k) + k * m + (k - 1.0) * log_y
                - safe_exp(k * (log_y + log_scale)))

    def __post_init__(self):
        if self.k <= 0:
            raise ValueError(f"shape k must be > 0, got {self.k}")

    @property
    def n_theta(self):  # type: ignore[override]
        return 1 if self.learn_k else 0

    def default_theta(self, dtype=np.float64):
        return np.array([np.log(self.k)], dtype)

    def with_theta(self, theta) -> "Weibull":
        return dataclasses.replace(
            self, k=float(np.exp(np.asarray(theta)[0])))

    def _logpdf_k(self, f, y, k):
        b = _scale(f[0])
        log_yb = jnp.log(jnp.clip(y[0], 1e-30, None)) - jnp.log(b)
        # (y/b)^k in log space; safe_exp saturates instead of inf at extreme
        # quadrature nodes
        return jnp.log(k) - jnp.log(b) + (k - 1.0) * log_yb - safe_exp(k * log_yb)

    def logpdf(self, f, y):
        return self._logpdf_k(f, y, self.k)

    def logpdf_t(self, f, y, theta):
        return self._logpdf_k(f, y, jnp.exp(theta[0]))

    def predictive(self, M, V):
        # closed form: E[y*] = Gamma(1+1/k) E[b],
        # V[y*] = Gamma(1+2/k) E[b^2] - Gamma(1+1/k)^2 E[b]^2
        # (>= (g2 - g1^2) E[b]^2 > 0 by Jensen), b = e^{-f} lognormal
        if not self.analytic:
            return Likelihood.predictive(self, M, V)
        g1 = math.exp(math.lgamma(1.0 + 1.0 / self.k))
        g2 = math.exp(math.lgamma(1.0 + 2.0 / self.k))
        Eb = jnp.clip(safe_exp(-M + 0.5 * V), 1e-9, 1e9)
        Eb2 = jnp.clip(safe_exp(-2.0 * M + 2.0 * V), 1e-18, 1e18)
        return g1 * Eb, g2 * Eb2 - g1 * g1 * jnp.square(Eb)

    def conditional_moments(self, f):
        b = _scale(f[:1])
        # self.k is a static Python float — math.lgamma keeps these constants
        # concrete under jit (jax.scipy gammaln would return a tracer here)
        g1 = math.exp(math.lgamma(1.0 + 1.0 / self.k))
        g2 = math.exp(math.lgamma(1.0 + 2.0 / self.k))
        return b * g1, safe_square(b) * (g2 - g1 * g1)

    def sample(self, key, F):
        # inverse CDF: y = b (-log U)^{1/k}
        b = _scale(F[:, :1])
        e = jax.random.exponential(key, b.shape, dtype=F.dtype)
        return b * jnp.power(e, 1.0 / self.k)
