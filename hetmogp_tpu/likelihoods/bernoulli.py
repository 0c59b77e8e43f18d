"""Bernoulli likelihood with explicit logistic link.

Behavioral contract from reference likelihoods/bernoulli.py:13-154:
p = e^f / (1 + e^f) clipped to [1e-9, 1-1e-9] (:26-34); var_exp via 1-D GH
quadrature with the GPy default T=20 (:82-95); predictive moments via the
same quadrature of the conditional mean/variance (:113-128).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp


def _prob(f):
    ef = safe_exp(f)
    p = ef / (1.0 + ef)
    return jnp.clip(p, 1e-9, 1.0 - 1e-9)


# the reference's probability clip [1e-9, 1-1e-9] (bernoulli.py:34),
# expressed in LOG space so it survives float32: computing log1p(-p)
# through the probability rounds p to exactly 1.0 for f >~ 17 in f32
# (1 - 1e-9 is not representable), giving log(0) = -inf and then
# 0 * -inf = NaN in the y-weighted sum — measured as a NaN Bernoulli
# var_exp at perfectly finite moments (m ~ 15, v ~ 2.6).  log p =
# -softplus(-f) and log(1-p) = -softplus(f) are exact and stable at any
# f; the clip bounds are applied to the logs, reproducing the reference
# values bit-for-bit in f64 within the clip's active range.
#
# Computed with math (not jnp): a module-level jnp op initializes the JAX
# backend at import time, which breaks dryrun_multichip's force_virtual_cpu
# (the env var must be set BEFORE the first backend init). Guarded by
# tests/test_import_hygiene.py.
_LOG_LO = math.log(1e-9)
_LOG_HI = math.log1p(-1e-9)


def _log_probs(f):
    log_p = jnp.clip(-jax.nn.softplus(-f), _LOG_LO, _LOG_HI)
    log_1mp = jnp.clip(-jax.nn.softplus(f), _LOG_LO, _LOG_HI)
    return log_p, log_1mp


@dataclasses.dataclass(frozen=True)
class Bernoulli(Likelihood):

    def logpdf(self, f, y):
        log_p, log_1mp = _log_probs(f[0])
        return y[0] * log_p + (1.0 - y[0]) * log_1mp

    def conditional_moments(self, f):
        p = _prob(f[:1])
        return p, p * (1.0 - p)

    def sample(self, key, F):
        p = _prob(F[:, :1])
        return jax.random.bernoulli(key, p).astype(F.dtype)
