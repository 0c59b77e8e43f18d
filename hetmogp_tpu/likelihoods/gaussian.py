"""Homoscedastic Gaussian likelihood (fixed, non-learned noise).

Behavioral contract from reference likelihoods/gaussian.py:11-92:
* ``sigma`` defaults to 0.5 and is never a trainable parameter (:21-24).
* ``var_exp`` and its derivatives are analytic (:41-62).
* ``predictive`` is analytic: (m, sigma^2 + v) (:64-67).
* Quirk reproduced on purpose: ``logpdf`` is a *standard* normal at (y - f)
  — it ignores sigma (reference :32-34 uses ``norm.logpdf(y, loc=f)`` with
  default scale 1), so the MC ``log_predictive`` is sigma-independent too.
* ``learn_sigma=True`` goes beyond the reference: sigma becomes a trainable
  likelihood parameter through the theta machinery (theta = [log sigma],
  params.lik_theta + TrainConfig.learn_lik_params), with the var_exp still
  analytic in theta.  Default False = reference parity (fixed sigma).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood

_HALF_LOG_2PI = 0.9189385332046727417803297364056176


@dataclasses.dataclass(frozen=True)
class Gaussian(Likelihood):
    sigma: float = 0.5
    learn_sigma: bool = False

    @property
    def n_theta(self):  # type: ignore[override]
        return 1 if self.learn_sigma else 0

    def default_theta(self, dtype=np.float64):
        return np.array([np.log(self.sigma)], dtype)

    def with_theta(self, theta) -> "Gaussian":
        return dataclasses.replace(
            self, sigma=float(np.exp(np.asarray(theta)[0])))

    def logpdf(self, f, y):
        # standard-normal density at the residual — reference gaussian.py:32-34
        r = y[0] - f[0]
        return -_HALF_LOG_2PI - 0.5 * jnp.square(r)

    def var_exp(self, Y, M, V, theta=None):
        # analytic: E[log N(y; f, sigma^2)] — reference gaussian.py:41-51.
        # theta = [log sigma] when learn_sigma is on; the expression stays
        # analytic (and differentiable) in theta — no quadrature engine.
        if theta is not None and self.n_theta:
            lik_v = jnp.exp(2.0 * theta[0])
        else:
            lik_v = self.sigma ** 2
        y = Y[:, 0]
        m = M[:, 0]
        v = V[:, 0]
        return (-0.5 * jnp.log(2.0 * jnp.pi) - 0.5 * jnp.log(lik_v)
                - 0.5 * (jnp.square(y) + jnp.square(m) + v - 2.0 * m * y) / lik_v)

    def conditional_moments(self, f):
        return f, jnp.full((1,), self.sigma ** 2, dtype=f.dtype)

    def predictive(self, M, V):
        # analytic — reference gaussian.py:64-67
        return M, self.sigma ** 2 + V

    def sample(self, key, F):
        return F[:, :1] + self.sigma * jax.random.normal(key, F[:, :1].shape,
                                                         dtype=F.dtype)
