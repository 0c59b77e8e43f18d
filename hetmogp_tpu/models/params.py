"""Model parameters as a JAX pytree.

Replaces the GPy/paramz parameter graph (reference svmogp.py:56-75:
``Param`` objects, ``link_parameter``, fix/unfix masks).  Fix/unfix becomes
gradient masking (see train.py); constraints become log-parameterizations.

Shapes (Q latents, M inducing, D output functions, Dx input dims):
  Z:        (Q, M, Dx)   inducing inputs per latent GP (the reference tiles
                         one Z into per-q blocks, svmogp.py:52)
  q_mu:     (Q, M)       variational means (whitened v-space by default)
  q_sqrt:   (Q, M, M)    variational Cholesky factors, lower triangle used
  log_lengthscale: (Q, Dx_ls)  RBF lengthscales (log), Dx_ls = Dx if ARD else 1
  log_variance:    (Q,)  RBF variances (log)
  W:        (Q, D)       LMC mixing weights (rank-1 Coregionalize collapsed)
  kappa:    (Q, D)       coregionalization diagonal, fixed at 0 like the
                         reference (util.py:289 "must be always fixed")
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from hetmogp_tpu.config import ModelConfig


@struct.dataclass
class SVMOGPParams:
    Z: jnp.ndarray
    q_mu: jnp.ndarray
    q_sqrt: jnp.ndarray
    log_lengthscale: jnp.ndarray
    log_variance: jnp.ndarray
    W: jnp.ndarray
    kappa: jnp.ndarray
    # optional per-task trainable likelihood parameters (one (n_theta_t,)
    # vector per task, e.g. Ordinal cut-points).  None (default) keeps every
    # likelihood's static constructor constants — the reference's behavior
    # (it has no trainable likelihood parameters anywhere).  Built with
    # default_lik_theta(config); trained only when
    # TrainConfig.learn_lik_params is on (VM/hyper phase).
    lik_theta: Optional[tuple] = None
    # coregionalization rank R (static, not a trained leaf): kernel hypers
    # are stored per GROUP (Q rows) while the latent axes (Z, q_mu, q_sqrt,
    # W, kappa) are per COPY (Q*R rows); the properties below repeat each
    # group's hypers across its R copies, so tied-hyperparameter gradients
    # sum over copies automatically under jax.grad
    rank: int = struct.field(pytree_node=False, default=1)

    @property
    def lengthscale(self):
        ls = jnp.exp(self.log_lengthscale)
        return jnp.repeat(ls, self.rank, axis=0) if self.rank > 1 else ls

    @property
    def variance(self):
        v = jnp.exp(self.log_variance)
        return jnp.repeat(v, self.rank, axis=0) if self.rank > 1 else v


def default_lik_theta(config: ModelConfig, dtype=None) -> tuple:
    """Initial ``lik_theta`` pytree: each task's likelihood default theta
    ((0,) arrays for likelihoods without trainable parameters)."""
    dtype = dtype or config.np_dtype
    return tuple(jnp.asarray(lik.default_theta(), dtype)
                 for lik in config.likelihoods)


def random_W(key, Q: int, D: int, rank: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """Random sign-mixed mixing weights.

    Reproduces the reference's ``random_W_kappas`` distribution
    (util.py:92-103): with prob 1/2 draw N(0.5, 0.5^2), else N(-0.5, 0.5^2),
    scaled by 1/sqrt(rank).
    """
    kp, k1, k2 = jax.random.split(key, 3)
    p = jax.random.bernoulli(kp, 0.5, (Q, D))
    n1 = 0.5 + 0.5 * jax.random.normal(k1, (Q, D), dtype)
    n2 = -0.5 + 0.5 * jax.random.normal(k2, (Q, D), dtype)
    return jnp.where(p, n1, n2) / jnp.sqrt(jnp.asarray(float(rank), dtype))


def init_params(
    key,
    config: ModelConfig,
    Z: jnp.ndarray,
    *,
    W: Optional[jnp.ndarray] = None,
    lengthscale=1.0,
    variance=1.0,
    q_mu_scale: float = 2.5,
    with_lik_theta: bool = False,
) -> SVMOGPParams:
    """Initialize parameters.

    Args:
      Z: (M, Dx) shared inducing inputs — tiled to all Q latents like the
        reference (svmogp.py:52) — or (Q, M, Dx) per-latent.
      W: optional (Q, D) mixing weights (the reference accepts ``W_list``;
        the demo passes fixed weights for reproducibility).
      lengthscale, variance: scalars or per-q arrays.
      q_mu_scale: std of the q(u) mean init.  The reference draws
        2.5*randn in un-whitened function space (svmogp.py:66); in whitened
        mode the same scale is applied to the whitened means.
    """
    dtype = config.np_dtype
    Q, M, Dx = config.num_latent, config.num_inducing, config.input_dim
    R = config.rank
    Qe = config.num_latent_eff
    D = config.num_output_functions

    Z = jnp.asarray(Z, dtype)
    if Z.ndim == 2:
        if Z.shape != (M, Dx):
            raise ValueError(
                f"Z has shape {Z.shape}; expected (num_inducing, input_dim)"
                f" = ({M}, {Dx}) (or (Qe, M, Dx) for per-latent inducing "
                f"points)")
        Z = jnp.broadcast_to(Z[None], (Qe, M, Dx))
    elif R > 1 and Z.shape == (Q, M, Dx):
        Z = jnp.repeat(Z, R, axis=0)  # one Z per kernel group -> per copy
    if Z.shape != (Qe, M, Dx):
        raise ValueError(
            f"Z has shape {Z.shape}; expected (Qe, M, Dx) = {(Qe, M, Dx)}")

    k_mu, k_w = jax.random.split(key)
    q_mu = q_mu_scale * jax.random.normal(k_mu, (Qe, M), dtype)
    q_sqrt = jnp.broadcast_to(jnp.eye(M, dtype=dtype)[None], (Qe, M, M))

    ls_dim = Dx if config.ard else 1
    ls = jnp.broadcast_to(jnp.asarray(lengthscale, dtype), (Q, ls_dim))
    var = jnp.broadcast_to(jnp.asarray(variance, dtype), (Q,))

    if W is None:
        W = random_W(k_w, Qe, D, rank=R, dtype=dtype)
    W = jnp.asarray(W, dtype)
    if W.ndim == 3:
        # (Q, D, R) reference-style rank-R weights -> per-copy rows ordered
        # [q0r0, q0r1, ..., q1r0, ...] to match the repeated hypers
        W = jnp.transpose(W, (0, 2, 1)).reshape(Qe, D)
    W = W.reshape(Qe, D)

    return SVMOGPParams(
        Z=Z,
        q_mu=q_mu,
        q_sqrt=jnp.array(q_sqrt),
        log_lengthscale=jnp.log(ls),
        log_variance=jnp.log(var),
        W=W,
        kappa=jnp.zeros((Qe, D), dtype),
        lik_theta=default_lik_theta(config, dtype) if with_lik_theta else None,
        rank=R,
    )
