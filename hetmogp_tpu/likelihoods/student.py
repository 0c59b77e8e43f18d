"""Student-t likelihood with latent mean and latent log-scale.

The reference ships only a constructor stub (likelihoods/student.py:12-22,
README.md:8 "to be released"); this is the full implementation under the
same engine contract: f1 = mean, f2 = log-scale, fixed degrees of freedom.

logpdf = lgamma((v+1)/2) - lgamma(v/2) - 0.5 log(v pi) - f2
         - (v+1)/2 * log(1 + ((y - f1) e^{-f2})^2 / v)
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp


@dataclasses.dataclass(frozen=True)
class StudentT(Likelihood):
    dim_f: ClassVar[int] = 2
    df: float = 4.0
    # trainable degrees of freedom (beyond the reference, which ships only
    # a stub): theta = [log df] through the theta machinery
    # (params.lik_theta + TrainConfig.learn_lik_params).  Default False
    # keeps df a fixed constant.
    learn_df: bool = False
    # analytic=True closes the predictive moments (see predictive below);
    # False restores the T=20^2 grid engine
    analytic: bool = True

    def predictive(self, M, V):
        # E[y*] = m1; V[y*] = df/(df-2) E[e^{2 f2}] + v1 with
        # E[e^{2 f2}] = e^{2 m2 + 2 v2} — exact limit of the grid
        # combination; scale expectation capped at the node bound (the
        # var_exp engine's safe_exp saturation analogue).  df <= 2: the
        # conditional variance is infinite, matching conditional_moments.
        if not self.analytic:
            return Likelihood.predictive(self, M, V)
        if self.df <= 2.0:
            return M[:, :1], jnp.full_like(M[:, :1], jnp.inf)
        c = self.df / (self.df - 2.0)
        Es2 = jnp.clip(safe_exp(2.0 * M[:, 1:] + 2.0 * V[:, 1:]), 0.0, 1e18)
        return M[:, :1], c * Es2 + V[:, :1]

    @property
    def n_theta(self):  # type: ignore[override]
        return 1 if self.learn_df else 0

    def default_theta(self, dtype=np.float64):
        return np.array([np.log(self.df)], dtype)

    def with_theta(self, theta) -> "StudentT":
        return dataclasses.replace(
            self, df=float(np.exp(np.asarray(theta)[0])))

    def _logpdf_df(self, f, y, v):
        g = jax.scipy.special.gammaln
        # clip like the reference's scale-family likelihoods (e.g.
        # exponential.py:29-31): exp underflow to a zero scale would make
        # the residual infinite at extreme quadrature nodes
        scale = jnp.clip(safe_exp(f[1]), 1e-9, 1e9)
        r = (y[0] - f[0]) / scale
        # -log(scale), not -f[1]: identical where the clip is inactive,
        # and saturating WITH the residual where it is — the raw -f[1]
        # would keep growing linearly while the clipped residual term
        # froze, sending logpdf to +inf for f2 << log(1e-9)
        return (g((v + 1.0) / 2.0) - g(v / 2.0)
                - 0.5 * jnp.log(v * jnp.pi) - jnp.log(scale)
                - (v + 1.0) / 2.0 * jnp.log1p(jnp.square(r) / v))

    def logpdf(self, f, y):
        return self._logpdf_df(f, y, self.df)

    def logpdf_t(self, f, y, theta):
        # v = e^theta keeps df positive under unconstrained gradient steps
        return self._logpdf_df(f, y, jnp.exp(theta[0]))

    def conditional_moments(self, f):
        v = self.df
        scale = safe_exp(f[1:2])
        mean = f[:1]  # defined for df > 1
        var = jnp.square(scale) * (v / (v - 2.0)) if v > 2.0 else \
            jnp.full_like(scale, jnp.inf)
        return mean, var

    def sample(self, key, F):
        scale = safe_exp(F[:, 1:2])
        t = jax.random.t(key, self.df, F[:, :1].shape, dtype=F.dtype)
        return F[:, :1] + scale * t
