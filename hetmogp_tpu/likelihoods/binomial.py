"""Binomial likelihood: y successes in n trials, logistic link p = sigma(f).

Beyond the reference (which ships Bernoulli only, likelihoods/bernoulli.py):
grouped/aggregated binary data — conversion counts per cell, successes per
batch — arrive as (y, n) pairs, and modelling them as n Bernoulli rows wastes
n-fold compute.  ``Binomial(n=1)`` is exactly the reference Bernoulli
(identical logpdf/moments; tested), so this is a strict generalization.

Same engine contract as every other likelihood: a scalar ``logpdf`` driving
the shared 1-D GH quadrature (ops/quadrature.py); log-space probabilities
(log p = -softplus(-f)) so f32 stays NaN-free at any f, exactly like the
Bernoulli fix documented in bernoulli.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood
from hetmogp_tpu.likelihoods.bernoulli import _log_probs, _prob


@dataclasses.dataclass(frozen=True)
class Binomial(Likelihood):
    n: int = 1  # trials per observation (static; y counts successes)

    def __post_init__(self):
        if int(self.n) < 1 or int(self.n) != self.n:
            raise ValueError(f"n must be a positive integer, got {self.n}")

    def logpdf(self, f, y):
        g = jax.scipy.special.gammaln
        log_p, log_1mp = _log_probs(f[0])
        n = jnp.asarray(float(self.n), dtype=f.dtype)
        return (g(n + 1.0) - g(y[0] + 1.0) - g(n - y[0] + 1.0)
                + y[0] * log_p + (n - y[0]) * log_1mp)

    def conditional_moments(self, f):
        p = _prob(f[:1])
        n = float(self.n)
        return n * p, n * p * (1.0 - p)

    def sample(self, key, F):
        p = _prob(F[:, :1])
        return jax.random.binomial(key, float(self.n), p).astype(F.dtype)
