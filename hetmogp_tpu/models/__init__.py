from hetmogp_tpu.models.elbo import (
    TaskData,
    batch_qf_moments,
    build_elbo,
    elbo_fn,
    kl_divergence,
    prior_cholesky,
    task_data,
    task_qf_moments,
    unwhiten_params,
    whiten_params,
)
from hetmogp_tpu.models.params import SVMOGPParams, init_params, random_W
from hetmogp_tpu.models.svmogp import SVMOGP

__all__ = [
    "TaskData",
    "task_data",
    "build_elbo",
    "elbo_fn",
    "prior_cholesky",
    "task_qf_moments",
    "batch_qf_moments",
    "kl_divergence",
    "whiten_params",
    "unwhiten_params",
    "SVMOGPParams",
    "init_params",
    "random_W",
    "SVMOGP",
]
