from hetmogp_tpu.likelihoods.base import Likelihood, safe_exp, safe_square
from hetmogp_tpu.likelihoods.bernoulli import Bernoulli
from hetmogp_tpu.likelihoods.beta import Beta
from hetmogp_tpu.likelihoods.binomial import Binomial
from hetmogp_tpu.likelihoods.categorical import Categorical
from hetmogp_tpu.likelihoods.dirichlet import Dirichlet
from hetmogp_tpu.likelihoods.exponential import Exponential
from hetmogp_tpu.likelihoods.gamma import Gamma
from hetmogp_tpu.likelihoods.gaussian import Gaussian
from hetmogp_tpu.likelihoods.hetgaussian import HetGaussian
from hetmogp_tpu.likelihoods.heterogeneous import HetLikelihood
from hetmogp_tpu.likelihoods.lognormal import LogNormal
from hetmogp_tpu.likelihoods.ordinal import Ordinal
from hetmogp_tpu.likelihoods.negbinomial import NegativeBinomial
from hetmogp_tpu.likelihoods.poisson import Poisson
from hetmogp_tpu.likelihoods.student import StudentT
from hetmogp_tpu.likelihoods.weibull import Weibull
from hetmogp_tpu.likelihoods.zipoisson import ZeroInflatedPoisson

__all__ = [
    "Likelihood",
    "safe_exp",
    "safe_square",
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
]
