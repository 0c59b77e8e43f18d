"""Heterogeneous likelihood dispatcher.

API-compatible with the reference's ``HetLikelihood``
(hetmogp/het_likelihood.py:10-164): wraps a list of per-output likelihoods,
builds the task/function index metadata, and fans var_exp / derivatives /
predictions / sampling / NLPD out per task.

Inside the jitted model the fan-out happens structurally (ModelConfig holds
the likelihood tuple as a jit static); this class exists for the user-facing
list-of-arrays API and for data generation.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.likelihoods.base import Likelihood


class HetLikelihood:
    def __init__(self, likelihoods_list: Sequence[Likelihood]):
        self.likelihoods_list = list(likelihoods_list)

    def generate_metadata(self) -> dict:
        """Index metadata mapping tasks <-> outputs <-> parameter functions.

        Mirrors reference het_likelihood.py:24-44 (same keys, same contents).
        """
        t_index = np.arange(len(self.likelihoods_list))
        y_index: List[int] = []
        f_index: List[int] = []
        d_index: List[int] = []
        p_index: List[int] = []
        for t, lik in enumerate(self.likelihoods_list):
            dim_y, dim_f, dim_p = lik.get_metadata()
            y_index.extend([t] * dim_y)
            f_index.extend([t] * dim_f)
            d_index.extend(range(dim_f))
            p_index.extend([t] * dim_p)
        return {
            "task_index": t_index,
            "y_index": np.asarray(y_index, dtype=np.int64),
            "function_index": np.asarray(f_index, dtype=np.int64),
            "d_index": np.asarray(d_index, dtype=np.int64),
            "pred_index": np.asarray(p_index, dtype=np.int64),
        }

    def logpdf(self, F, Y, Y_metadata=None):
        """Per-task log-densities: lists in, list of (N_t,) arrays out.

        Mirrors het_likelihood.py:59-70 with the list-of-arrays convention
        used everywhere else in this package (the reference packs tasks into
        one wide array via metadata masks; per-task lists keep shapes
        static).
        """
        out = []
        for t, lik in enumerate(self.likelihoods_list):
            F_t = jnp.asarray(F[t])
            Y_t = jnp.asarray(Y[t])
            if Y_t.ndim == 1:
                Y_t = Y_t[:, None]
            out.append(lik.logpdf_batch(F_t, Y_t))
        return out

    def pdf(self, F, Y, Y_metadata=None):
        """Per-task densities (het_likelihood.py:46-57)."""
        return [jnp.exp(lp) for lp in self.logpdf(F, Y)]

    def num_output_functions(self, Y_metadata=None) -> int:
        """Total number of parameter functions D (het_likelihood.py:85-90)."""
        return sum(lik.dim_f for lik in self.likelihoods_list)

    def ismulti(self, task: int) -> bool:
        return self.likelihoods_list[task].ismulti()

    # ---- per-task fan-outs (lists in, lists out) ------------------------
    def var_exp(self, Y, mu_F, v_F, Y_metadata=None):
        return [lik.var_exp(Y[t], mu_F[t], v_F[t])
                for t, lik in enumerate(self.likelihoods_list)]

    def var_exp_derivatives(self, Y, mu_F, v_F, Y_metadata=None):
        dms, dvs = [], []
        for t, lik in enumerate(self.likelihoods_list):
            dm, dv = lik.var_exp_derivatives(Y[t], mu_F[t], v_F[t])
            dms.append(dm)
            dvs.append(dv)
        return dms, dvs

    def predictive(self, mu_F_pred, v_F_pred, Y_metadata=None):
        m_pred, v_pred = [], []
        for t, lik in enumerate(self.likelihoods_list):
            m, v = lik.predictive(mu_F_pred[t], v_F_pred[t])
            m_pred.append(m)
            v_pred.append(v)
        return m_pred, v_pred

    def negative_log_predictive(self, key, Ytest, mu_F_star, v_F_star,
                                num_samples: int = 1000):
        """Summed NLPD over tasks (het_likelihood.py:150-164)."""
        keys = jax.random.split(key, len(self.likelihoods_list))
        logpred = 0.0
        for t, lik in enumerate(self.likelihoods_list):
            logpred = logpred + lik.log_predictive(
                keys[t], Ytest[t], mu_F_star[t], v_F_star[t], num_samples)
        return -logpred

    def samples(self, key, F, Y_metadata=None):
        """One sampled observation set per task (het_likelihood.py:72-83)."""
        keys = jax.random.split(key, len(self.likelihoods_list))
        # cast to the backend's canonical float so numpy float64 inputs don't
        # request an unavailable dtype under x64-disabled configs
        fdtype = jax.dtypes.canonicalize_dtype(jnp.float64)
        return [lik.sample(keys[t], jnp.asarray(F[t], fdtype))
                for t, lik in enumerate(self.likelihoods_list)]
