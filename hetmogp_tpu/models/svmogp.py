"""User-facing SVMOGP model.

API mirror of the reference ``SVMOGP`` class (svmogp.py:16-469) minus the
GPy/paramz machinery: the model is a thin stateful wrapper around an
immutable (config, params) pair plus the dataset; all math lives in pure
functions (models/elbo.py, models/predict.py) so everything stays jittable
and shardable.

Usage (reference README.md:20-38 flow):

    likelihoods = HetLikelihood([HetGaussian(), Bernoulli()])
    cfg = ModelConfig(likelihoods=tuple(likelihoods.likelihoods_list),
                      num_latent=2, num_inducing=20, input_dim=1)
    model = SVMOGP(cfg, X_list, Y_list, Z, key=jax.random.PRNGKey(0))
    model.fit_vem(vem_iters=5)             # batch VEM (L-BFGS)
    m, v = model.predictive_new(Xnew, output_function_ind=0)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models import predict as predict_mod
from hetmogp_tpu.models.params import SVMOGPParams, init_params


class SVMOGP:
    def __init__(self, config: ModelConfig, X: Sequence, Y: Sequence,
                 Z, *, key=None, params: Optional[SVMOGPParams] = None,
                 W=None, lengthscale=1.0, variance=1.0):
        self.config = config
        if len(X) != config.num_tasks or len(Y) != config.num_tasks:
            raise ValueError(
                f"got {len(X)} X arrays / {len(Y)} Y arrays for "
                f"{config.num_tasks} likelihoods — one per task required")
        self.Xmulti_all = [np.asarray(x) for x in X]
        self.Ymulti_all = [np.asarray(y) if np.asarray(y).ndim == 2
                           else np.asarray(y)[:, None] for y in Y]
        for t, (x, y, lik) in enumerate(zip(self.Xmulti_all, self.Ymulti_all,
                                            config.likelihoods)):
            if x.ndim != 2 or x.shape[1] != config.input_dim:
                raise ValueError(
                    f"task {t}: X has shape {x.shape}; expected "
                    f"(N_{t}, input_dim={config.input_dim})")
            if y.shape[0] != x.shape[0]:
                raise ValueError(
                    f"task {t}: X has {x.shape[0]} rows but Y has "
                    f"{y.shape[0]}")
            if y.shape[1] != lik.dim_y:
                raise ValueError(
                    f"task {t}: Y has {y.shape[1]} columns but "
                    f"{type(lik).__name__} expects dim_y={lik.dim_y}")
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = init_params(key, config, Z, W=W, lengthscale=lengthscale,
                                 variance=variance)
        self.params = params
        self.elbo_history = np.zeros((0,))

    # ---- whole-model persistence -----------------------------------------
    def save(self, path):
        """Persist the whole model (params + serialized ModelConfig) to one
        npz.  The framework analogue of pickling a GPy model (the reference
        inherits GPy's pickle support) minus the training data, which is
        not stored — it can be HBM-scale; pass the same X/Y to ``load``.
        """
        from hetmogp_tpu import checkpoint as ckpt

        ckpt.save_checkpoint(
            path, self.params,
            extra={"model_config": self.config.to_dict(),
                   "has_lik_theta": self.params.lik_theta is not None})

    @classmethod
    def load(cls, path, X: Sequence, Y: Sequence) -> "SVMOGP":
        """Rebuild a model saved with ``save``: the ModelConfig (including
        likelihood objects) comes from the checkpoint, the params are
        shape-validated against it, and X/Y re-attach the dataset."""
        from hetmogp_tpu import checkpoint as ckpt
        from hetmogp_tpu.models.params import init_params as _init

        meta = ckpt.peek_meta(path)
        try:
            cfg_dict = meta["extra"]["model_config"]
        except KeyError:
            raise ValueError(
                f"{path!s} is a bare params checkpoint, not a model saved "
                "with SVMOGP.save (no model_config in extra); use "
                "checkpoint.load_checkpoint with your own templates")
        # a malformed config dict raises its own KeyError/TypeError here —
        # deliberately NOT folded into the bare-checkpoint error above
        cfg = ModelConfig.from_dict(cfg_dict)
        template = _init(jax.random.PRNGKey(0), cfg,
                         np.zeros((cfg.num_inducing, cfg.input_dim)),
                         with_lik_theta=meta["extra"]["has_lik_theta"])
        params, _, _, _ = ckpt.load_checkpoint(path, template)
        return cls(cfg, X, Y, None, params=params)

    # ---- reference-parity accessors -------------------------------------
    @property
    def num_inducing(self) -> int:
        return self.config.num_inducing

    @property
    def num_latent_funcs(self) -> int:
        return self.config.num_latent_eff

    @property
    def num_output_funcs(self) -> int:
        return self.config.num_output_functions

    @property
    def Y_metadata(self) -> dict:
        return self.config.metadata()

    # ---- objective -------------------------------------------------------
    def log_likelihood(self) -> float:
        """Full-data ELBO (reference ``log_likelihood``, svmogp.py:82-83)."""
        from hetmogp_tpu.data import full_batch

        data, scales = full_batch(self.Xmulti_all, self.Ymulti_all,
                                  dtype=self.config.np_dtype)
        e, _ = predict_mod.jitted_elbo(self.config)(
            self.params, data, jnp.asarray(scales, self.config.np_dtype))
        return float(e)

    # ---- trainable likelihood parameters --------------------------------
    def _ensure_lik_theta(self, tc: TrainConfig):
        """Materialize params.lik_theta when training asks to learn
        likelihood parameters (TrainConfig.learn_lik_params) and the
        model's likelihoods have any (Likelihood.n_theta > 0)."""
        if (tc.learn_lik_params and self.params.lik_theta is None
                and any(lik.n_theta for lik in self.config.likelihoods)):
            from hetmogp_tpu.models.params import default_lik_theta

            self.params = self.params.replace(
                lik_theta=default_lik_theta(self.config))

    @property
    def pred_config(self) -> ModelConfig:
        """Config for prediction: the static likelihoods with any trained
        params.lik_theta absorbed (memoized so jit statics stay stable —
        equal theta values produce an equal, equal-hash config)."""
        if self.params.lik_theta is None:
            return self.config
        key = tuple(np.asarray(t).tobytes() for t in self.params.lik_theta)
        if getattr(self, "_pred_cfg_key", None) != key:
            self._pred_cfg_key = key
            self._pred_cfg = self.config.with_trained_likelihoods(self.params)
        return self._pred_cfg

    # ---- training --------------------------------------------------------
    def fit_vem(self, train_config: Optional[TrainConfig] = None,
                vem_iters: Optional[int] = None, verbose: bool = False):
        """Batch VEM (reference vem_algorithm stochastic=False)."""
        import dataclasses

        from hetmogp_tpu import train as train_mod

        tc = train_config or TrainConfig()
        if vem_iters is not None:
            tc = dataclasses.replace(tc, vem_iters=vem_iters)
        self._ensure_lik_theta(tc)
        self.params, hist = train_mod.vem_algorithm(
            self.params, self.config, self.Xmulti_all, self.Ymulti_all,
            train_config=tc, verbose=verbose)
        self.elbo_history = np.concatenate([self.elbo_history, hist])
        return self

    def fit_svi(self, batch_size, num_steps: int,
                train_config: Optional[TrainConfig] = None,
                vem: bool = True, callback=None):
        """Stochastic SVI (reference vem_algorithm stochastic=True)."""
        from hetmogp_tpu import train as train_mod
        from hetmogp_tpu.data import MinibatchStream

        tc = train_config or TrainConfig()
        self._ensure_lik_theta(tc)
        stream = MinibatchStream(self.Xmulti_all, self.Ymulti_all, batch_size,
                                 shuffle=tc.shuffle, seed=tc.seed,
                                 dtype=self.config.np_dtype)
        self.params, hist = train_mod.svi_fit(
            self.params, self.config, tc, stream, num_steps, vem=vem,
            callback=callback)
        self.elbo_history = np.concatenate([self.elbo_history, hist])
        return self

    def fit_svi_on_device(self, batch_size, num_steps: int,
                          train_config: Optional[TrainConfig] = None,
                          vem: bool = True, steps_per_call: int = 100,
                          mesh=None, key=None, checkpoint_dir=None,
                          checkpoint_every: Optional[int] = None,
                          keep_last: int = 2, resume: bool = False,
                          early_stop_tol: Optional[float] = None,
                          early_stop_patience: int = 3):
        """SVI with the whole loop on-device (lax.scan over HBM-resident
        data) — the production TPU path.  mesh: optional 1-D ('data',) or
        2-D ('data','latent') jax.sharding.Mesh for multi-chip training
        (parallel.data_mesh / parallel.model_mesh).  checkpoint_dir /
        checkpoint_every / keep_last / resume: periodic Orbax
        checkpointing with exact-resume (see train.svi_fit_on_device)."""
        from hetmogp_tpu import train as train_mod

        tc = train_config or TrainConfig()
        self._ensure_lik_theta(tc)
        self.params, hist = train_mod.svi_fit_on_device(
            self.params, self.config, tc, self.Xmulti_all, self.Ymulti_all,
            batch_size, num_steps, vem=vem, steps_per_call=steps_per_call,
            mesh=mesh, key=key, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, keep_last=keep_last,
            resume=resume, early_stop_tol=early_stop_tol,
            early_stop_patience=early_stop_patience)
        self.elbo_history = np.concatenate([self.elbo_history, hist])
        return self

    # ---- prediction (reference svmogp.py:219-370) ------------------------
    def predict_u(self, Xnew, latent_function_ind: Optional[int] = None,
                  full_cov: bool = False):
        return predict_mod.predict_latent_u(self.params, self.config, Xnew,
                                            latent_function_ind,
                                            full_cov=full_cov)

    def predictive_new(self, Xnew, output_function_ind: int = 0,
                       full_cov: bool = False):
        m, v = predict_mod.predict_f(self.params, self.config, Xnew,
                                     output_function_ind, full_cov=full_cov)
        if full_cov:
            return np.asarray(m)[:, None], np.asarray(v)
        return np.asarray(m)[:, None], np.asarray(v)[:, None]

    def sample_f(self, Xnew, output_function_ind: int = 0,
                 num_samples: int = 1, key=None):
        """Correlated posterior samples of f_d at Xnew: (num_samples, N)."""
        import jax

        key = jax.random.PRNGKey(0) if key is None else key
        return np.asarray(predict_mod.sample_f(
            self.params, self.config, key, Xnew, output_function_ind,
            num_samples))

    def predict_f_tasks(self, X_list):
        return predict_mod.predict_f_all(self.params, self.config, X_list)

    def predict_f_projected(self, Xnew, output_function_ind: int = 0):
        """Reference ``_raw_predict_f`` semantics: re-project the posterior
        at the training inputs through the function-space prior (O(N^3);
        see predict.predict_f_projected)."""
        m, v = predict_mod.predict_f_projected(
            self.params, self.config, self.Xmulti_all, Xnew,
            output_function_ind)
        return np.asarray(m)[:, None], np.asarray(v)[:, None]

    def predict_f_stochastic(self, Xnew, output_function_ind: int = 0,
                             Xanchor_list: Optional[Sequence] = None):
        """Reference ``_raw_predict_stochastic`` (svmogp.py:308-331) named
        mirror — identical to ``predict_f_projected`` in the reference (see
        predict.predict_f_stochastic); ``Xanchor_list`` (default: the full
        training inputs, exact reference behavior) may be a minibatch
        subset to cut the O(N^3) re-projection to the batch size."""
        anchors = self.Xmulti_all if Xanchor_list is None else Xanchor_list
        m, v = predict_mod.predict_f_stochastic(
            self.params, self.config, anchors, Xnew, output_function_ind)
        return np.asarray(m)[:, None], np.asarray(v)[:, None]

    def predictive(self, Xpred: Sequence, projected: bool = False,
                   mesh=None):
        """Observation-space prediction; ``projected=True`` reproduces the
        reference's training-set re-projection path exactly.  ``mesh``
        runs the direct path SPMD over a device mesh with prediction rows
        sharded on the 'data' axis (serving-scale; see
        predict.predictive_sharded)."""
        if mesh is not None:
            if projected:
                raise ValueError(
                    "projected=True is the O(N^3) training-set "
                    "re-projection path and is not mesh-sharded; use the "
                    "default direct path with mesh=")
            return predict_mod.predictive_sharded(
                self.params, self.pred_config, Xpred, mesh)
        return predict_mod.predictive(self.params, self.pred_config, Xpred,
                                      Xtrain_list=self.Xmulti_all,
                                      projected=projected)

    def negative_log_predictive(self, Xtest, Ytest, num_samples: int = 1000,
                                key=None, reference_scaling: bool = True,
                                tasks=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return float(predict_mod.negative_log_predictive(
            self.params, self.pred_config, key, Xtest, Ytest, num_samples,
            reference_scaling=reference_scaling, tasks=tasks))

    # ---- plotting (reference svmogp.py:372-469) --------------------------
    def plot_u(self, dim: int = 0, num_points: int = 200, ax=None,
               true_U=None, true_UX=None, median: bool = False):
        """Latent-function posterior bands (reference plot_u,
        svmogp.py:372-406).

        median: with multi-dimensional inputs, fix the non-plotted input
        dimensions at their training median (the reference's
        ``fixed_inputs(..., fix_routine='median')`` option, svmogp.py:379)
        instead of sweeping every dimension together.
        """
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(figsize=(10, 6))
        lo = min(x[:, dim].min() for x in self.Xmulti_all)
        hi = max(x[:, dim].max() for x in self.Xmulti_all)
        Xp = np.linspace(lo, hi, num_points)[:, None]
        if self.config.input_dim > 1:
            if median:
                X_all = np.concatenate([np.asarray(x)
                                        for x in self.Xmulti_all], axis=0)
                Xp = np.tile(np.median(X_all, axis=0)[None, :],
                             (num_points, 1))
                Xp[:, dim] = np.linspace(lo, hi, num_points)
            else:
                Xp = np.tile(Xp, (1, self.config.input_dim))
        mean, var = self.predict_u(Xp)
        std = np.sqrt(np.asarray(var))
        for q in range(self.num_latent_funcs):
            m = np.asarray(mean)[:, q]
            ax.plot(Xp[:, dim], m, "r-", alpha=0.4)
            ax.fill_between(Xp[:, dim], m - 2 * std[:, q], m + 2 * std[:, q],
                            alpha=0.15)
        if true_U is not None:
            ax.plot(true_UX, true_U, "k+", alpha=0.5)
        return ax

    def plot_f(self, dim: int = 0, num_points: int = 200, ax=None,
               true_F=None, true_FX=None, median: bool = False):
        """Output-parameter-function posterior bands (reference plot_f,
        svmogp.py:408-434).  true_F/true_FX overlay ground-truth latent
        mixtures per task (reference svmogp.py:431-432: true_F is a list of
        per-task (N_t, F_t) arrays, true_FX the matching inputs).

        median: with multi-dimensional inputs, fix the non-plotted input
        dimensions at their training median (like plot_u); the default
        sweeps every input dimension together.
        """
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(figsize=(10, 6))
        f_index = self.config.function_index
        d_index = self.config.d_index
        for d in range(self.num_output_funcs):
            Xt = np.asarray(self.Xmulti_all[f_index[d]])
            line = np.linspace(Xt[:, dim].min(), Xt[:, dim].max(), num_points)
            if self.config.input_dim > 1:
                if median:
                    Xp = np.tile(np.median(Xt, axis=0)[None, :],
                                 (num_points, 1))
                else:
                    Xp = np.tile(line[:, None], (1, self.config.input_dim))
                Xp[:, dim] = line
            else:
                Xp = line[:, None]
            m, v = predict_mod.predict_f(self.params, self.config, Xp, d)
            m, s = np.asarray(m), np.sqrt(np.asarray(v))
            ax.plot(Xp[:, dim], m, "r-", alpha=0.5)
            ax.fill_between(Xp[:, dim], m - 2 * s, m + 2 * s, alpha=0.15)
            if true_F is not None:
                ax.plot(np.asarray(true_FX[f_index[d]])[:, dim],
                        np.asarray(true_F[f_index[d]])[:, d_index[d]],
                        "k-", alpha=0.5)
        return ax

    def plot_pred(self, Xpred, task: int = 0, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(figsize=(10, 6))
        m_pred, v_pred = self.predictive(Xpred)
        Xp = np.asarray(Xpred[task])[:, 0]
        m = np.asarray(m_pred[task])
        s = np.sqrt(np.maximum(np.asarray(v_pred[task]), 0.0))
        ax.plot(np.asarray(self.Xmulti_all[task])[:, 0],
                self.Ymulti_all[task][:, 0], "b+", alpha=0.5)
        for j in range(m.shape[1]):
            ax.plot(Xp, m[:, j], "k-")
            ax.plot(Xp, m[:, j] + 2 * s[:, j], "k--", alpha=0.5)
            ax.plot(Xp, m[:, j] - 2 * s[:, j], "k--", alpha=0.5)
        return ax
