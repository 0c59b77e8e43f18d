"""Log-normal likelihood: log y ~ N(f, sigma^2), y > 0.

Beyond the reference (whose positive-support choices are Gamma/Exponential/
Beta): right-skewed positive data with multiplicative noise — prices,
durations, concentrations — is classically log-normal, and the reference has
no likelihood for it.

Everything is ANALYTIC (no quadrature), like the reference Gaussian
(gaussian.py:41-67), because the model is a Gaussian in log y:

    var_exp  E[log p] = -log y - log sigma - 0.5 log 2pi
                        - ((log y - m)^2 + v) / (2 sigma^2)
    predictive mean    E[y] = exp(m + v/2 + sigma^2/2)
    predictive var     E[y^2] - E[y]^2
                     = exp(2m + 2v + 2 sigma^2) - exp(2m + v + sigma^2)

``learn_sigma=True`` trains log sigma through the theta machinery
(params.lik_theta + TrainConfig.learn_lik_params), the same pattern as
Gaussian.learn_sigma — and the theta path stays analytic too.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp

_HALF_LOG_2PI = 0.9189385332046727417803297364056176


@dataclasses.dataclass(frozen=True)
class LogNormal(Likelihood):
    sigma: float = 0.5
    learn_sigma: bool = False

    def __post_init__(self):
        if self.sigma <= 0:
            raise ValueError(f"sigma must be > 0, got {self.sigma}")

    @property
    def n_theta(self):  # type: ignore[override]
        return 1 if self.learn_sigma else 0

    def default_theta(self, dtype=np.float64):
        return np.array([np.log(self.sigma)], dtype)

    def with_theta(self, theta) -> "LogNormal":
        return dataclasses.replace(
            self, sigma=float(np.exp(np.asarray(theta)[0])))

    def _logpdf_s2(self, f, y, s2):
        ly = jnp.log(jnp.clip(y[0], 1e-30, None))
        return (-ly - 0.5 * jnp.log(s2) - _HALF_LOG_2PI
                - 0.5 * jnp.square(ly - f[0]) / s2)

    def logpdf(self, f, y):
        return self._logpdf_s2(f, y, self.sigma ** 2)

    def logpdf_t(self, f, y, theta):
        return self._logpdf_s2(f, y, jnp.exp(2.0 * theta[0]))

    def var_exp(self, Y, M, V, theta=None):
        # analytic: Gaussian var_exp in log y, minus the Jacobian log y
        if theta is not None and self.n_theta:
            s2 = jnp.exp(2.0 * theta[0])
        else:
            s2 = self.sigma ** 2
        ly = jnp.log(jnp.clip(Y[:, 0], 1e-30, None))
        m, v = M[:, 0], V[:, 0]
        return (-ly - 0.5 * jnp.log(s2) - _HALF_LOG_2PI
                - 0.5 * (jnp.square(ly - m) + v) / s2)

    def conditional_moments(self, f):
        s2 = self.sigma ** 2
        mean = safe_exp(f[:1] + 0.5 * s2)
        var = (np.exp(s2) - 1.0) * safe_exp(2.0 * f[:1] + s2)
        return mean, var

    def predictive(self, M, V):
        # closed-form lognormal moments of the N(m, v) latent — no quadrature
        s2 = self.sigma ** 2
        mean = safe_exp(M + 0.5 * V + 0.5 * s2)
        var = safe_exp(2.0 * M + 2.0 * V + 2.0 * s2) - jnp.square(mean)
        return mean, var

    def sample(self, key, F):
        z = jax.random.normal(key, F[:, :1].shape, dtype=F.dtype)
        return safe_exp(F[:, :1] + self.sigma * z)
