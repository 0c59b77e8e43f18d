"""Serialized, ahead-of-time compiled prediction functions for serving.

The reference has no serving story (SURVEY.md §1: "no serving layer").
Here: ``jax.export`` serializes the jitted predictive computation (StableHLO
+ calling convention) so a serving process can load and run it without the
model code — only jax and the parameter arrays.

    blob = export_predictive(params, config, example_X_list)
    Path("model.bin").write_bytes(blob)
    # in the server:
    fn = load_predictive(Path("model.bin").read_bytes())
    m1, v1, m2, v2, ... = fn(*params_args(params), *X_list)

The exported function is shape-specialized to the example batch sizes
(standard for serving; export several shapes if needed).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from hetmogp_tpu.config import ModelConfig
from hetmogp_tpu.models import predict as predict_mod
from hetmogp_tpu.models.params import SVMOGPParams


def _flat_predictive(config: ModelConfig):
    """Predictive as a function of flat positional args (export-friendly)."""

    def f(Z, q_mu, q_sqrt, log_ls, log_var, W, kappa, *X_list):
        params = SVMOGPParams(Z=Z, q_mu=q_mu, q_sqrt=q_sqrt,
                              log_lengthscale=log_ls, log_variance=log_var,
                              W=W, kappa=kappa, rank=config.rank)
        m_pred, v_pred = predict_mod.predictive(params, config, list(X_list))
        out = []
        for m, v in zip(m_pred, v_pred):
            out.extend([m, v])
        return tuple(out)

    return f


def params_args(params: SVMOGPParams):
    return (params.Z, params.q_mu, params.q_sqrt, params.log_lengthscale,
            params.log_variance, params.W, params.kappa)


def export_predictive(params: SVMOGPParams, config: ModelConfig,
                      example_X_list: Sequence) -> bytes:
    """Serialize the AOT-compiled observation-space predictive.

    Returns a bytes blob loadable with ``load_predictive``; call signature
    of the loaded function is ``(*params_args(params), *X_list)``.
    """
    f = _flat_predictive(config)
    xs = [jnp.asarray(x, config.np_dtype) for x in example_X_list]
    exported = jax.export.export(jax.jit(f))(*params_args(params), *xs)
    return bytes(exported.serialize())


def load_predictive(blob: bytes):
    """Deserialize an exported predictive; returns a callable."""
    exported = jax.export.deserialize(blob)
    return exported.call


def export_predict_f(params: SVMOGPParams, config: ModelConfig,
                     example_X, output_function_ind: int = 0,
                     full_cov: bool = False) -> bytes:
    """Serialize the latent-f predictive for one output function.

    ``full_cov=True`` returns (mean (N,), cov (N, N)) — the full posterior
    covariance for correlated f* sampling in the serving process; False
    returns (mean, var) diagonals.  Loadable with ``load_predictive``;
    call signature ``(*params_args(params), X)``.
    """
    def f(Z, q_mu, q_sqrt, log_ls, log_var, W, kappa, X):
        p = SVMOGPParams(Z=Z, q_mu=q_mu, q_sqrt=q_sqrt,
                         log_lengthscale=log_ls, log_variance=log_var,
                         W=W, kappa=kappa, rank=config.rank)
        return predict_mod.predict_f(p, config, X, output_function_ind,
                                     full_cov=full_cov)

    X = jnp.asarray(example_X, config.np_dtype)
    exported = jax.export.export(jax.jit(f))(*params_args(params), X)
    return bytes(exported.serialize())


def export_predict_f_projected(params: SVMOGPParams, config: ModelConfig,
                               example_Xtrain, example_Xnew,
                               task: int = 0) -> bytes:
    """Serialize the reference ``_raw_predict_f``-semantics projected
    predictive for every output function of one task
    (predict.predict_f_projected_task): (mu (F_t, Ns), var (F_t, Ns)).
    Call signature ``(*params_args(params), Xtrain_t, Xnew)``.
    """
    def f(Z, q_mu, q_sqrt, log_ls, log_var, W, kappa, Xtr, Xs):
        p = SVMOGPParams(Z=Z, q_mu=q_mu, q_sqrt=q_sqrt,
                         log_lengthscale=log_ls, log_variance=log_var,
                         W=W, kappa=kappa, rank=config.rank)
        return predict_mod._predict_f_projected_task_impl(p, config, Xtr,
                                                          Xs, task)

    Xtr = jnp.asarray(example_Xtrain, config.np_dtype)
    Xs = jnp.asarray(example_Xnew, config.np_dtype)
    exported = jax.export.export(jax.jit(f))(*params_args(params), Xtr, Xs)
    return bytes(exported.serialize())


def serving_state(params: SVMOGPParams, config: ModelConfig):
    """(Luu, Luu^{-1}) for the serving fast path — compute once per trained
    model, pass to the function exported by ``export_serving_predictive``."""
    from hetmogp_tpu import train as train_mod

    return train_mod._prior_cholesky_inverse_jit(params, config)


def export_serving_predictive(params: SVMOGPParams, config: ModelConfig,
                              example_X, task: int) -> bytes:
    """Serialize the serving fast-path predictive for one task.

    The AOT function takes the precomputed ``serving_state`` pair, so the
    serving process never factorizes: every call is cached-inverse matmul
    projections + likelihood quadrature moments (the
    ``predict.make_serving_predictive`` path; same conditioning caveat).
    Call signature ``(*params_args(params), *serving_state(params, config),
    X)``; loadable with ``load_predictive``.
    """
    from hetmogp_tpu.models import elbo as elbo_mod

    lik = config.likelihoods[task]

    def f(Z, q_mu, q_sqrt, log_ls, log_var, W, kappa, Luu, iLuu, X):
        p = SVMOGPParams(Z=Z, q_mu=q_mu, q_sqrt=q_sqrt,
                         log_lengthscale=log_ls, log_variance=log_var,
                         W=W, kappa=kappa, rank=config.rank)
        m_F, v_F = elbo_mod.task_qf_moments(p, config, Luu, X, task,
                                            iLuu=iLuu)
        return lik.predictive(m_F, v_F)

    X = jnp.asarray(example_X, config.np_dtype)
    Luu, iLuu = serving_state(params, config)
    exported = jax.export.export(jax.jit(f))(*params_args(params), Luu,
                                             iLuu, X)
    return bytes(exported.serialize())
