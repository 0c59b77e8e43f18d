"""hetmogp_tpu — TPU-native heterogeneous multi-output Gaussian processes.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pmorenoz/HetMOGP (Moreno-Munoz, Artes-Rodriguez, Alvarez; NeurIPS 2018):
sparse variational multi-output GPs where Q latent GPs are linearly mixed
(LMC) into D output parameter functions, each output with its own likelihood
distribution and its own input set.

Design versus the reference (see SURVEY.md for the full map):

* The reference's hand-derived gradient engine (svmogp_inf.py) is replaced by
  a pure-function ELBO differentiated with ``jax.grad``.
* The un-whitened q(u) parameterization (explicit Kuu^-1 via dpotri) is
  replaced by a whitened parameterization by default (no explicit inverses,
  better conditioning); the un-whitened form is retained behind a flag for
  oracle-parity comparisons.
* Per-output-function covariance projections are shared per (task, latent)
  pair and scaled by the mixing weights afterwards — an O(D/F_t) saving over
  the reference, and fully batched onto the MXU.
* Gauss-Hermite variational expectations are a single vmapped engine with a
  custom VJP reproducing the reference's Bonnet/Price gradient forms
  (E[dlogp/df], 0.5 E[d2logp/df2]) from autodiff of each likelihood's logpdf.
"""

from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.likelihoods import (
    Bernoulli,
    Binomial,
    Dirichlet,
    LogNormal,
    Ordinal,
    StudentT,
    Beta,
    Categorical,
    Exponential,
    Gamma,
    Gaussian,
    HetGaussian,
    HetLikelihood,
    NegativeBinomial,
    Poisson,
    Weibull,
    ZeroInflatedPoisson,
)
from hetmogp_tpu.models import SVMOGP, SVMOGPParams, build_elbo, init_params
from hetmogp_tpu.train import (plot_callback, prepare_dataset_on_device,
                               print_callback, svi_fit, svi_fit_on_device,
                               vem_algorithm)
from hetmogp_tpu.checkpoint import (load_checkpoint, load_checkpoint_sharded,
                                    save_checkpoint, save_checkpoint_sharded)
from hetmogp_tpu.data import MinibatchStream, batch_scales

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "Gaussian",
    "HetGaussian",
    "Bernoulli",
    "Binomial",
    "Categorical",
    "Beta",
    "Gamma",
    "Exponential",
    "LogNormal",
    "NegativeBinomial",
    "Poisson",
    "StudentT",
    "Ordinal",
    "Dirichlet",
    "Weibull",
    "ZeroInflatedPoisson",
    "HetLikelihood",
    "SVMOGP",
    "plot_callback",
    "print_callback",
    "SVMOGPParams",
    "build_elbo",
    "init_params",
    "vem_algorithm",
    "svi_fit",
    "prepare_dataset_on_device",
    "svi_fit_on_device",
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_sharded",
    "load_checkpoint_sharded",
    "MinibatchStream",
    "batch_scales",
]

__version__ = "0.1.0"
