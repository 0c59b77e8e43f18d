"""Bernoulli likelihood with explicit logistic link.

Behavioral contract from reference likelihoods/bernoulli.py:13-154:
p = e^f / (1 + e^f) clipped to [1e-9, 1-1e-9] (:26-34); var_exp via 1-D GH
quadrature with the GPy default T=20 (:82-95); predictive moments via the
same quadrature of the conditional mean/variance (:113-128).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp


def _prob(f):
    ef = safe_exp(f)
    p = ef / (1.0 + ef)
    return jnp.clip(p, 1e-9, 1.0 - 1e-9)


@dataclasses.dataclass(frozen=True)
class Bernoulli(Likelihood):

    def logpdf(self, f, y):
        p = _prob(f[0])
        return y[0] * jnp.log(p) + (1.0 - y[0]) * jnp.log1p(-p)

    def conditional_moments(self, f):
        p = _prob(f[:1])
        return p, p * (1.0 - p)

    def sample(self, key, F):
        p = _prob(F[:, :1])
        return jax.random.bernoulli(key, p).astype(F.dtype)
