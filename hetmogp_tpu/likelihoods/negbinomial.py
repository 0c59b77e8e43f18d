"""Negative-binomial likelihood: overdispersed counts, rate mu = e^f.

Beyond the reference (which ships Poisson only, likelihoods/poisson.py):
real count data is routinely overdispersed (Var[y] > E[y]), where the
Poisson's Var = E is a hard mis-specification.  The NB2 parameterization
used here has mean mu = e^f and dispersion r > 0:

    p(y | f) = Gamma(y + r) / (Gamma(r) y!) * (r/(r+mu))^r (mu/(r+mu))^y
    E[y] = mu,   Var[y] = mu + mu^2 / r     (r -> inf recovers Poisson)

Same engine contract as every other likelihood (scalar logpdf + 1-D GH
quadrature via the shared engine); ``learn_r=True`` trains log r through
the theta machinery (params.lik_theta + TrainConfig.learn_lik_params),
like Gaussian.learn_sigma / StudentT.learn_df.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp


@dataclasses.dataclass(frozen=True)
class NegativeBinomial(Likelihood):
    r: float = 2.0  # dispersion; Var = mu + mu^2 / r
    learn_r: bool = False

    def __post_init__(self):
        if self.r <= 0:
            raise ValueError(f"dispersion r must be > 0, got {self.r}")

    @property
    def n_theta(self):  # type: ignore[override]
        return 1 if self.learn_r else 0

    def default_theta(self, dtype=np.float64):
        return np.array([np.log(self.r)], dtype)

    def with_theta(self, theta) -> "NegativeBinomial":
        return dataclasses.replace(
            self, r=float(np.exp(np.asarray(theta)[0])))

    def _logpdf_r(self, f, y, r):
        g = jax.scipy.special.gammaln
        mu = jnp.clip(safe_exp(f[0]), 1e-9, 1e9)
        # log p = lgamma(y+r) - lgamma(r) - lgamma(y+1)
        #         + r log(r/(r+mu)) + y log(mu/(r+mu))
        log_rmu = jnp.log(r + mu)
        return (g(y[0] + r) - g(r) - g(y[0] + 1.0)
                + r * (jnp.log(r) - log_rmu)
                + y[0] * (jnp.log(mu) - log_rmu))

    def logpdf(self, f, y):
        return self._logpdf_r(f, y, self.r)

    def logpdf_t(self, f, y, theta):
        # r = e^theta keeps the dispersion positive under unconstrained
        # gradient steps
        return self._logpdf_r(f, y, jnp.exp(theta[0]))

    def conditional_moments(self, f):
        mu = jnp.clip(safe_exp(f[:1]), 1e-9, 1e9)
        return mu, mu + jnp.square(mu) / self.r

    def sample(self, key, F):
        # gamma-Poisson mixture: lambda ~ Gamma(r, scale = mu/r),
        # y | lambda ~ Poisson(lambda) gives exactly NB(mu, r)
        k1, k2 = jax.random.split(key)
        mu = jnp.clip(safe_exp(F[:, :1]), 1e-9, 1e9)
        lam = jax.random.gamma(k1, self.r, F[:, :1].shape,
                               dtype=F.dtype) * (mu / self.r)
        return jax.random.poisson(k2, lam).astype(F.dtype)
