"""Gamma likelihood, shape a = e^{f1}, rate b = e^{f2}.

Behavioral contract from reference likelihoods/gamma.py:13-249: a, b =
clip(e^f, 1e-9, 1e9); logpdf = -ln Gamma(a) + a log b + (a-1) log y - b y
(:34-41); 2-D tensor GH var_exp with T=10 (:103-194); predictive with the
GPy default T=20 (:196-238).
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


@dataclasses.dataclass(frozen=True)
class Gamma(Likelihood):
    dim_f: ClassVar[int] = 2
    T_var_exp: ClassVar[int] = quadrature.MULTI_T

    def logpdf(self, f, y):
        a, b = _ab(f)
        return (-jax.scipy.special.gammaln(a) + a * jnp.log(b)
                + (a - 1.0) * jnp.log(y[0]) - b * y[0])

    def conditional_moments(self, f):
        a, b = _ab(f)
        return (a / b)[None], (a / jnp.square(b))[None]

    def sample(self, key, F):
        ef = safe_exp(F)
        a = jnp.clip(ef[:, :1], 1e-9, 1e9)
        b = jnp.clip(ef[:, 1:2], 1e-9, 1e9)
        return (jax.random.gamma(key, a) / b).astype(F.dtype)
