"""Ordinal (cumulative-logit) likelihood over K ordered categories.

The reference ships only a constructor stub (likelihoods/ordinal.py:11-21);
this is the full implementation: one latent function f and K-1 fixed,
increasing thresholds b_1 < ... < b_{K-1}:

    P(y <= k) = sigmoid(b_k - f),  P(y = k) = P(y <= k) - P(y <= k-1)

Labels are 1-indexed like the reference's Categorical.  Thresholds default
to evenly spaced in [-(K-2)/2, (K-2)/2].
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood


@dataclasses.dataclass(frozen=True)
class Ordinal(Likelihood):
    K: int = 3
    thresholds: Optional[Tuple[float, ...]] = None

    @property
    def dim_p(self):  # type: ignore[override]
        return self.K

    def _b(self, dtype):
        if self.thresholds is not None:
            b = jnp.asarray(self.thresholds, dtype)
        else:
            b = jnp.linspace(-(self.K - 2) / 2.0, (self.K - 2) / 2.0,
                             self.K - 1).astype(dtype)
        return b

    def _probs_from_b(self, f, b):
        cdf = jax.nn.sigmoid(b - f[0])  # (K-1,)
        cdf = jnp.concatenate([jnp.zeros((1,), f.dtype), cdf,
                               jnp.ones((1,), f.dtype)])
        p = jnp.diff(cdf)
        return jnp.clip(p, 1e-9, 1.0)

    def _class_probs(self, f):
        return self._probs_from_b(f, self._b(f.dtype))

    def logpdf(self, f, y):
        p = self._class_probs(f)
        onehot = (jnp.arange(1, self.K + 1, dtype=y.dtype) == y[0]).astype(f.dtype)
        return jnp.sum(onehot * jnp.log(p))

    # ---- trainable thresholds (theta) -----------------------------------
    # theta = (b_1, log(b_2 - b_1), ..., log(b_{K-1} - b_{K-2})): increasing
    # thresholds by construction, so unconstrained gradient steps can never
    # cross cut-points (which would zero out class probabilities).

    @property
    def n_theta(self):  # type: ignore[override]
        return self.K - 1

    def _b_from_theta(self, theta):
        return jnp.cumsum(jnp.concatenate([theta[:1], jnp.exp(theta[1:])]))

    def default_theta(self, dtype=np.float64):
        b = np.asarray(
            self.thresholds if self.thresholds is not None
            else np.linspace(-(self.K - 2) / 2.0, (self.K - 2) / 2.0,
                             self.K - 1), dtype)
        d = np.diff(b)
        if np.any(d <= 0):
            raise ValueError(f"thresholds must be increasing, got {b}")
        return np.concatenate([b[:1], np.log(d)]).astype(dtype)

    def logpdf_t(self, f, y, theta):
        p = self._probs_from_b(f, self._b_from_theta(theta).astype(f.dtype))
        onehot = (jnp.arange(1, self.K + 1, dtype=y.dtype) == y[0]).astype(f.dtype)
        return jnp.sum(onehot * jnp.log(p))

    def with_theta(self, theta) -> "Ordinal":
        b = np.asarray(jax.device_get(
            self._b_from_theta(jnp.asarray(theta, jnp.float64))))
        return dataclasses.replace(
            self, thresholds=tuple(float(x) for x in b))

    def conditional_moments(self, f):
        p = self._class_probs(f)
        return p, p * (1.0 - p)

    def sample(self, key, F):
        probs = jax.vmap(self._class_probs)(F)  # (N, K)
        labels = jax.random.categorical(key, jnp.log(probs), axis=-1) + 1
        return labels[:, None].astype(F.dtype)

    def ismulti(self) -> bool:
        return False
