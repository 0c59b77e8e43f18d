"""Categorical(K) likelihood via logistic-softmax with an implicit base class.

Behavioral contract from reference likelihoods/categorical.py:13-295:
K classes are driven by K-1 latent functions; class probabilities are
p_k = e^{f_k} / (1 + sum_j e^{f_j}) for k < K and p_K = 1 / (1 + sum_j e^{f_j}),
then clipped to [1e-9, 1-1e-9] and renormalized (:37-46).  Labels are
1-indexed: y in {1, ..., K} (:77-87).  var_exp uses a (K-1)-dim
tensor-product GH grid with T=10 nodes (:130-170) — kept for oracle parity;
at large K prefer a smaller T or an MC estimator (the grid is T^(K-1)).
``predictive`` returns the K-1 class-probability means; the predictive
variance is not implemented in the reference (:264 "NOT IMPLEMENTED") and is
returned as zeros here likewise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp
from hetmogp_tpu.ops import quadrature


@dataclasses.dataclass(frozen=True)
class Categorical(Likelihood):
    K: int = 3
    # The reference leaves the predictive variance unimplemented
    # (categorical.py:264) and returns zeros; set True for the proper
    # law-of-total-variance class-probability variances instead.
    exact_predictive_variance: bool = False
    # The reference's T^(K-1) tensor grid explodes at large K (10^(K-1)
    # evaluations per point at T=10; categorical.py:139-158).  mc_samples>0
    # switches var_exp to that many fixed antithetic quasi-MC nodes —
    # O(mc_samples) regardless of K.  0 keeps the grid (oracle parity).
    mc_samples: int = 0

    # constructor-time guard: beyond this many tensor-grid nodes PER DATA
    # POINT the grid path is an OOM/hang, not a slow run — fail fast with
    # guidance instead (a Categorical(K=8) at T=10 would silently build a
    # 10^7-node grid; the reference has the same blow-up,
    # categorical.py:139-158, it just never instantiates K that large)
    MAX_GRID_NODES = 100_000

    def __post_init__(self):
        if self.K < 2:
            raise ValueError(f"Categorical needs K >= 2 classes, got {self.K}")
        if self.mc_samples == 0:
            nodes = self.T_var_exp ** self.dim_f
            if nodes > self.MAX_GRID_NODES:
                raise ValueError(
                    f"Categorical(K={self.K}) with the exact tensor-product "
                    f"grid needs T^(K-1) = {self.T_var_exp}^{self.dim_f} = "
                    f"{nodes:.3g} quadrature nodes PER DATA POINT (limit "
                    f"{self.MAX_GRID_NODES:g}).  Pass mc_samples>0 (e.g. "
                    f"Categorical(K={self.K}, mc_samples=64)) to use O(K)-"
                    f"cost quasi-MC expectations instead of the grid.")

    @property
    def dim_f(self):  # type: ignore[override]
        return self.K - 1

    @property
    def dim_p(self):  # type: ignore[override]
        return self.K - 1

    @property
    def T_var_exp(self):  # type: ignore[override]
        return quadrature.MULTI_T

    @property
    def T_pred(self):  # type: ignore[override]
        return quadrature.MULTI_T

    def ismulti(self) -> bool:
        return True

    def _probs(self, f):
        """Full K-vector of clipped, renormalized class probabilities."""
        ef = safe_exp(f)
        den = 1.0 + jnp.sum(ef)
        p = jnp.concatenate([ef / den, jnp.ones((1,), f.dtype) / den])
        p = jnp.clip(p, 1e-9, 1.0 - 1e-9)
        return p / jnp.sum(p)

    def logpdf(self, f, y):
        # y is a 1-indexed class label (reference onehot, categorical.py:77-82)
        p = self._probs(f)
        onehot = (jnp.arange(1, self.K + 1, dtype=y.dtype) == y[0]).astype(f.dtype)
        return jnp.sum(onehot * jnp.log(p))

    def conditional_moments(self, f):
        # mean over dim_p = first K-1 class probabilities (rho_k, :89-100)
        ef = safe_exp(f)
        rho = ef / (1.0 + jnp.sum(ef))
        rho = jnp.clip(rho, 1e-9, 1.0 - 1e-9)
        rho = rho / jnp.sum(rho)
        return rho, rho * (1.0 - rho)

    def predictive(self, M, V):
        mean, var = super().predictive(M, V)
        if not self.exact_predictive_variance:
            # reference parity: variance "NOT IMPLEMENTED" upstream
            # (categorical.py:264) — reported as zeros
            var = jnp.zeros_like(mean)
        return mean, var

    def sample(self, key, F):
        logits = jnp.concatenate([F, jnp.zeros((F.shape[0], 1), F.dtype)], axis=1)
        labels = jax.random.categorical(key, logits, axis=-1) + 1
        return labels[:, None].astype(F.dtype)
