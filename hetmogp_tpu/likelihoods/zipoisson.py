"""Zero-inflated Poisson: f1 -> rate lambda = e^{f1}, f2 -> inflation
probability pi = sigma(f2).

Beyond the reference (Poisson only, likelihoods/poisson.py): excess zeros —
sensors that are off, species absent from a site, customers who never buy —
break a plain Poisson, whose P(y=0) = e^{-lambda} cannot be large while the
positive counts stay wide.  The ZIP mixture

    p(y | f) = pi * [y = 0] + (1 - pi) * Poisson(y; lambda)

gives each data point TWO latent parameter functions, exactly the
heterogeneous multi-output setting this framework exists for (the reference's
own HetGaussian, hetgaussian.py:11-114, is the dim_f=2 template): the
inflation field pi(x) and the rate field lambda(x) get separate LMC mixes of
the shared latent GPs.

var_exp runs on the shared tensor-grid GH engine with T=10 per dimension
(the reference's own multi-latent node count, categorical.py:139-158) —
100 nodes/point.  The y = 0 branch is computed as
logaddexp(log pi, log(1-pi) - lambda), NaN-free in f32 at any f.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.likelihoods.bernoulli import _log_probs, _prob


@dataclasses.dataclass(frozen=True)
class ZeroInflatedPoisson(Likelihood):
    dim_f: ClassVar[int] = 2
    # multi-latent tensor grid: T^2 nodes per point (categorical.py:139-158
    # uses the same per-dimension reduction from the 1-D default T=20)
    T_var_exp: ClassVar[int] = 10
    T_pred: ClassVar[int] = 10

    def logpdf(self, f, y):
        lam = jnp.clip(safe_exp(f[0]), 1e-9, 1e9)
        log_pi, log_1mpi = _log_probs(f[1])
        pois = y[0] * f[0] - lam - jax.scipy.special.gammaln(y[0] + 1.0)
        # both branches are finite for every y (jnp.where evaluates both):
        # the zero branch mixes P(y=0) in log space, the positive branch is
        # the thinned Poisson
        zero_branch = jnp.logaddexp(log_pi, log_1mpi - lam)
        pos_branch = log_1mpi + pois
        return jnp.where(y[0] == 0, zero_branch, pos_branch)

    def conditional_moments(self, f):
        lam = jnp.clip(safe_exp(f[:1]), 1e-9, 1e9)
        pi = _prob(f[1:2])
        mean = (1.0 - pi) * lam
        # Var[y] = (1-pi) lam (1 + pi lam)
        var = (1.0 - pi) * lam * (1.0 + pi * lam)
        return mean, var

    def sample(self, key, F):
        k1, k2 = jax.random.split(key)
        lam = jnp.clip(safe_exp(F[:, :1]), 1e-9, 1e9)
        pi = _prob(F[:, 1:2])
        on = 1.0 - jax.random.bernoulli(k1, pi).astype(F.dtype)
        return on * jax.random.poisson(k2, lam).astype(F.dtype)
