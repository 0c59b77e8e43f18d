"""Typed configuration for models and training.

The reference scatters its constants through the code (GH node counts,
VE:VM ratio 3:1, Adadelta momentum 0.9, optimize max_iters=100, clip bounds;
see SURVEY.md §5 "Config / flag system").  Here they are explicit, typed and
hashable so an oracle-parity run is reproducible and every jitted function can
close over a config statically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp

# dtype is stored as a string so configs stay hashable (jit static args).
_DTYPES = {
    "float32": jnp.float32,
    "float64": jnp.float64,
    "bfloat16": jnp.bfloat16,
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static structure of an SVMOGP model.

    Attributes:
      likelihoods: per-task likelihood objects (frozen/hashable), one per
        heterogeneous output; mirrors ``HetLikelihood(likelihoods_list)`` in
        the reference (het_likelihood.py:16-22).
      num_latent: Q, number of latent GPs u_q.
      num_inducing: M, inducing points per latent GP.
      input_dim: dimensionality of X.
      whiten: if True (default), q(u_q) is parameterized in the whitened
        space u_q = Luu_q v_q (no explicit Kuu inverse anywhere).  If False,
        q(u_q) lives in function space like the reference (svmogp.py:66-69).
      jitter: base jitter added to Kuu before Cholesky.  0.0 + adaptive
        escalation reproduces GPy's jitchol behavior (GPy linalg.jitchol,
        used at reference util.py:198).
      adaptive_jitter: escalate jitter x10 (up to 5 tries, starting at
        1e-6 * mean(diag)) when the Cholesky produces NaNs.
      dtype: parameter/compute dtype name ("float64" for oracle parity on
        CPU, "float32" for TPU throughput).
      kernel: latent kernel family, currently "rbf" | "matern32" | "matern52".
      ard: per-dimension lengthscales if True.
    """

    likelihoods: Tuple[Any, ...]
    num_latent: int
    num_inducing: int
    input_dim: int
    # Coregionalization rank R (reference ICM/LCM rank, util.py:92-123).
    # A rank-R B_q = W_q W_q^T is realized as R latent copies per kernel
    # (the exact LCM equivalence): Q*R latent GPs where each group of R
    # shares one (lengthscale, variance); W is (Q*R, D) and
    # B_q[d,d] = sum_r W[qR+r, d]^2.  Parameter leaves (Z, q_mu, q_sqrt, W,
    # kappa) are sized by num_latent_eff = Q*R.
    rank: int = 1
    whiten: bool = True
    jitter: float = 0.0
    adaptive_jitter: bool = True
    dtype: str = "float32"
    kernel: str = "rbf"
    ard: bool = False
    # Factorize Kuu in this dtype (upcast -> Cholesky/inverse -> downcast).
    # "float64" is an accuracy island for large-M float32 training: the f32
    # factorization of a cond ~ 1e6 gram loses ~half its digits.  Measured
    # on TPU v5e at M=1024: standalone the f64 forward Cholesky is only ~2x
    # f32 and it makes fast_projection stable (3000+ steps, converging),
    # but inside the compiled training scan the island measures ~40x slower
    # end-to-end (emulated-f64 op scheduling) even with the mixed-precision
    # custom-VJP Cholesky — use for accuracy-critical/predict-only paths,
    # not the training hot loop.  Requires jax_enable_x64.
    chol_dtype: str = "same"
    # Matmul precision of the VE-step forward projection P = Kfu @ iLuu^T
    # (the fast_projection einsum, elbo.latent_projections).  "highest"
    # (default, 6-pass bf16 == f32) is the safe setting: P feeds the
    # kdiag - |P|^2 cancellation in the f-variance, where one bf16 pass
    # (DEFAULT) measured relerr ~1.5e0 at M=1024.  "high" (3-pass bf16) is
    # a measured large-M opt-in: at M=2048 this einsum dominates the VE
    # step and HIGH is +18% end-to-end (131 vs 111 steps/s) with the
    # 1500-step ELBO trajectory indistinguishable from HIGHEST (per-100
    # checkpoints within 4e-4 rel on a ~1.3e6-nat scale) — its absolute
    # gamma error (~5e-3) sits below the quadrature discretization noise
    # even where true variances are ~7e-4.  Full analysis: docs/DESIGN.md
    # §7d.  Only consulted on the fast_projection VE path; solves and VM
    # cached adjoints stay HIGHEST.
    ve_fwd_precision: str = "highest"
    # Compute the ELBO's per-latent projections for ALL tasks' rows as one
    # concatenated batch (one Kfu build / one triangular matmul / one
    # quad_diag; the VE backward then forms ONE (Q, M, M) Lq-cotangent
    # instead of one per task) and slice per task for mixing + quadrature.
    # Same math, different matmul blocking: ELBO value matches the
    # per-task path exactly, gradients to reduction-order rounding
    # (~1e-10 rel in f64).  +5.8% flagship / +31% at M=2048 on TPU v5e
    # (docs/DESIGN.md §7g); default ON after soak (random-config property
    # sweep, 2-D-mesh equivalence, 1500-step trajectory A/B).  False
    # restores the per-task loop (oracle-comparison mode).  Only consulted
    # when the cached-inverse matmul projection is active (iLuu present,
    # i.e. fast_projection trainers): on the solve path the fused blocking
    # was measured SLOWER (154 vs 178 steps/s) and is never taken.
    fuse_task_rows: bool = True

    # ---- serialization ----------------------------------------------------------
    def to_dict(self) -> dict:
        """JSON-serializable dict, likelihoods encoded by class name +
        constructor fields (all likelihoods are frozen dataclasses)."""
        d = dataclasses.asdict(self)
        d["likelihoods"] = [
            {"cls": type(lik).__name__, **dataclasses.asdict(lik)}
            for lik in self.likelihoods]
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        """Inverse of ``to_dict`` (likelihood classes resolved from
        ``hetmogp_tpu.likelihoods``); JSON round-trips turn tuples into
        lists, so sequence-valued fields are re-tupled to keep configs
        hashable (jit statics)."""
        from hetmogp_tpu import likelihoods as lik_mod

        liks = []
        for spec in d["likelihoods"]:
            spec = dict(spec)
            klass = getattr(lik_mod, spec.pop("cls"))
            liks.append(klass(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in spec.items()}))
        kw = {k: v for k, v in d.items() if k != "likelihoods"}
        return cls(likelihoods=tuple(liks), **kw)

    # ---- derived static metadata ------------------------------------------------
    @property
    def num_latent_eff(self) -> int:
        """Q*R: latent-function count including coregionalization-rank copies."""
        return self.num_latent * self.rank

    @property
    def num_tasks(self) -> int:
        return len(self.likelihoods)

    @property
    def task_dim_f(self) -> Tuple[int, ...]:
        """Latent parameter-function count per task (dim_f in the reference)."""
        return tuple(lik.dim_f for lik in self.likelihoods)

    @property
    def num_output_functions(self) -> int:
        """D = total parameter functions f_d across all tasks.

        Mirrors ``HetLikelihood.num_output_functions`` (het_likelihood.py:85-90).
        """
        return sum(self.task_dim_f)

    @property
    def function_index(self) -> Tuple[int, ...]:
        """Map d -> task t (reference metadata 'function_index',
        het_likelihood.py:24-44)."""
        out = []
        for t, lik in enumerate(self.likelihoods):
            out.extend([t] * lik.dim_f)
        return tuple(out)

    @property
    def d_index(self) -> Tuple[int, ...]:
        """Map d -> within-task column (reference metadata 'd_index')."""
        out = []
        for lik in self.likelihoods:
            out.extend(range(lik.dim_f))
        return tuple(out)

    @property
    def task_function_slices(self) -> Tuple[Tuple[int, int], ...]:
        """(start, stop) into the global d axis for each task's functions."""
        out = []
        start = 0
        for lik in self.likelihoods:
            out.append((start, start + lik.dim_f))
            start += lik.dim_f
        return tuple(out)

    @property
    def np_dtype(self):
        return _DTYPES[self.dtype]

    def with_trained_likelihoods(self, params) -> "ModelConfig":
        """A new config whose likelihoods absorb the trained
        ``params.lik_theta`` as static constants (``Likelihood.with_theta``)
        — use for prediction after training with
        ``TrainConfig.learn_lik_params``.  No-op when lik_theta is None."""
        if getattr(params, "lik_theta", None) is None:
            return self
        liks = tuple(
            lik.with_theta(theta) if lik.n_theta else lik
            for lik, theta in zip(self.likelihoods, params.lik_theta))
        return dataclasses.replace(self, likelihoods=liks)

    def metadata(self) -> dict:
        """Reference-compatible Y_metadata dict (het_likelihood.py:24-44)."""
        import numpy as np

        t_index = np.arange(self.num_tasks)
        y_index, f_index, d_index, p_index = [], [], [], []
        for t, lik in enumerate(self.likelihoods):
            y_index.extend([t] * lik.dim_y)
            f_index.extend([t] * lik.dim_f)
            d_index.extend(range(lik.dim_f))
            p_index.extend([t] * lik.dim_p)
        return {
            "task_index": t_index,
            "y_index": np.asarray(y_index, dtype=np.int64),
            "function_index": np.asarray(f_index, dtype=np.int64),
            "d_index": np.asarray(d_index, dtype=np.int64),
            "pred_index": np.asarray(p_index, dtype=np.int64),
        }


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    Defaults reproduce the reference's constants:
    * ``ve_steps_per_vm=4`` — the reference's SVI counter (svmogp.py:188-199)
      computes VE gradients while ve_count is 0,1,2,3 (the count>2 branch
      still returns a VE gradient before flipping), i.e. 4 VE steps per VM
      step.
    * ``step_rate=0.01``, ``momentum=0.9`` — climin Adadelta defaults used at
      util.py:321-329.
    * ``batch_inner_iters=100`` — ``model.optimize(max_iters=100)`` per VEM
      half-step (util.py:305,318).
    * ``vem_iters=5`` — util.py:287.
    """

    vem_iters: int = 5
    batch_inner_iters: int = 100
    step_rate: float = 0.01
    momentum: float = 0.9
    # climin Adadelta's remaining knobs (climin defaults decay=0.9,
    # offset=1e-4); the reference passes only step_rate and momentum
    # (util.py:327)
    adadelta_decay: float = 0.9
    adadelta_offset: float = 1e-4
    ve_steps_per_vm: int = 4
    optimizer: str = "adadelta"  # "adadelta" | "adam" | "natgrad_adam"
    natgrad_lr: float = 0.1
    # Natural-gradient retraction for the q(u) update (optimizer=
    # "natgrad_adam"):
    #   "cholesky" — the triangular-group local-coordinate update
    #                (structured NGD a la Lin/Schmidt/Khan): with the
    #                Fisher metric DIAGONAL in those coordinates the step
    #                is L <- L (I + X), X = 2 lr Phi(L^T dS L), m <- m +
    #                lr S dm — NO factorization, NO solve, NO S^{-1}
    #                anywhere.  X is damped per latent to the
    #                natgrad_trust ball (max|X_q| <= trust), which keeps
    #                diag(I + X) positive by construction — without it
    #                the raw step freezes/diverges at production scale
    #                where the covariance must contract by orders of
    #                magnitude (measured; DESIGN §7i).  First-order equal
    #                to "exact" in lr; lr=1 CAVI exactness does not hold.
    #                THE DEFAULT since the round-5 frontier (DESIGN §7n):
    #                1.7x the steps/s of "exact" (523 vs 313 on the bench
    #                workload), a uniformly better ELBO-vs-wallclock
    #                curve, and stable at every lr tested (trust damping).
    #   "exact"    — the (theta1, theta2) straight-line update
    #                S_new^{-1} = S^{-1} - 2 lr dS, recovered via one
    #                reversed blocked Cholesky per VE step.  Exact CAVI at
    #                lr=1 with a conjugate likelihood — pick it for
    #                conjugate/near-conjugate models or CAVI-parity
    #                experiments; on the non-conjugate bench workload it
    #                is slower and needs lr <= 0.5 (at lr=1 steps are
    #                rejected by the divergence guard; DESIGN §7n).
    natgrad_retraction: str = "cholesky"
    # Trust radius for the cholesky retraction's multiplicative L-step
    # (ignored by "exact").  Contraction/expansion per step is bounded by
    # (1 +- trust); must be < 1.
    natgrad_trust: float = 0.3
    # Learning-rate schedule for the optax adam step (the reference trains
    # at a fixed rate; schedules are a production knob).  Under
    # optimizer="natgrad_adam" this schedules only adam's HYPER updates;
    # the natural-gradient rate on q(u) stays at the fixed natgrad_lr.
    # None = constant step_rate.  "cosine" (optax.cosine_decay_schedule,
    # kwargs: decay_steps, alpha), "warmup_cosine"
    # (optax.warmup_cosine_decay_schedule, kwargs: warmup_steps,
    # decay_steps, init_value, end_value), "exponential"
    # (optax.exponential_decay, kwargs: transition_steps, decay_rate).
    # step_rate is the peak value.  kwargs as a tuple of (name, value)
    # pairs so the config stays hashable (jit static); the schedule's step
    # count lives in the optimizer state, so it checkpoints/resumes and
    # scans correctly.  Ignored by the climin-parity adadelta.
    lr_schedule: Optional[str] = None
    lr_schedule_kwargs: Tuple = ()
    # Global-norm gradient clipping (optax.clip_by_global_norm) applied
    # before the adam / natgrad_adam update; None = off.  A stability knob
    # for aggressive step rates on heavy-tailed likelihoods — the skip
    # guard (skip_nonfinite_steps) discards poisoned steps, this one
    # prevents borderline ones.  Ignored by the climin-parity adadelta.
    clip_grad_norm: Optional[float] = None
    learn_inducing: bool = True  # optZ in vem_algorithm (util.py:311)
    learn_W: bool = True  # non_chained in vem_algorithm (util.py:313)
    shuffle: bool = True  # reference cycles batches sequentially due to a
    # no-op shuffle (util.py:70); False reproduces that.
    seed: int = 0
    # Replace per-task triangular solves with HIGHEST-precision matmuls
    # against a cached explicit triangular inverse in VE steps (TPU
    # triangular solves run ~19 TFLOP/s vs ~33 for 6-pass f32 matmuls at
    # bench shapes).  Round-1's "75% gradient error" was root-caused to
    # applying the inverse with DEFAULT-precision matmuls (bfloat16 operand
    # rounding), not to the inverse itself (f32 inverse relerr ~4e-7 at
    # cond(Kuu)~1e6); with precision=HIGHEST the trajectory tracks the
    # solve path to ~3e-5 median rel over 3000 bench steps (finite
    # throughout).  VM steps always differentiate through the solve path.
    fast_projection: bool = True
    # In-scan minibatch sampling: "gather" draws B iid uniform row indices
    # per task per step; "slice" takes a contiguous block at a random
    # offset (cheaper on TPU, and closest to the reference's
    # sequential-cycling slices, util.py:52-72).
    minibatch: str = "gather"
    # VM steps compute hyper gradients from only the first
    # ceil(vm_batch_fraction * B_t) rows of the step's batch, with the ELBO
    # scale adjusted to stay unbiased (slice-mode batches are contiguous
    # uniform random blocks, so a prefix is a smaller uniform random block;
    # gather-mode rows are iid).  The whole VM chain (projection,
    # kernel-build pullbacks, quadrature backward) is O(B), so 0.25 cuts
    # the VM step cost ~4x at the price of 4x noisier hyper gradients on
    # the 1-in-5 VM steps.  1.0 (default) = exact reference semantics.
    vm_batch_fraction: float = 1.0
    # Train per-task likelihood parameters (params.lik_theta, e.g. Ordinal
    # cut-points) as hypers in the VM phase.  Off by default: the reference
    # has no trainable likelihood parameters anywhere (even Gaussian sigma
    # is fixed, gaussian.py:21-24).  Requires params built with
    # init_params(..., with_lik_theta=True).
    learn_lik_params: bool = False
    # Production fault tolerance: when a step's ELBO, gradient global
    # norm, or (natgrad) q-update comes out non-finite, discard that
    # step's parameter/optimizer/cache updates (the step counter still
    # advances so the VE/VM schedule stays aligned — but adam moments and
    # any LR schedule's internal count tick only on ACCEPTED updates, so
    # repeated skips pause the schedule rather than advancing it) and
    # report metrics["skipped"]=1.  Off by default (reference semantics:
    # a bad step poisons the state, matching GPy's behavior); zero cost
    # when off (static flag).
    skip_nonfinite_steps: bool = False
