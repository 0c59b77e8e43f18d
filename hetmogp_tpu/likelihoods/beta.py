"""Beta likelihood, a = e^{f1}, b = e^{f2}.

Behavioral contract from reference likelihoods/beta.py:13-252: a, b =
clip(e^f, 1e-9, 1e9) (:29-36); logpdf = (a-1) log y + (b-1) log(1-y)
- betaln(a, b); 2-D tensor GH var_exp with T=10 (:106-146); predictive
moments with the GPy default T=20 (:199-241 — the reference's node-count
inconsistency at beta.py:203, reproduced here for parity).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.ops import quadrature


def _ab(f):
    ef = safe_exp(f)
    return jnp.clip(ef[0], 1e-9, 1e9), jnp.clip(ef[1], 1e-9, 1e9)


def _betaln(a, b):
    g = jax.scipy.special.gammaln
    return g(a) + g(b) - g(a + b)


@dataclasses.dataclass(frozen=True)
class Beta(Likelihood):
    dim_f: ClassVar[int] = 2
    T_var_exp: ClassVar[int] = quadrature.MULTI_T
    # predictive keeps GPy's default T=20 (beta.py:203)

    def logpdf(self, f, y):
        a, b = _ab(f)
        return (a - 1.0) * jnp.log(y[0]) + (b - 1.0) * jnp.log1p(-y[0]) - _betaln(a, b)

    def conditional_moments(self, f):
        a, b = _ab(f)
        mean = a / (a + b)
        var = a * b / (jnp.square(a + b) * (a + b + 1.0))
        return mean[None], var[None]

    def sample(self, key, F):
        ef = safe_exp(F)
        a = jnp.clip(ef[:, :1], 1e-9, 1e9)
        b = jnp.clip(ef[:, 1:2], 1e-9, 1e9)
        return jax.random.beta(key, a, b).astype(F.dtype)
