"""Training drivers: stochastic SVI, batch VEM, natural gradients.

Replaces the reference's optimizer stack (paramz L-BFGS via
``model.optimize``, climin Adadelta via ``vem_algorithm``; util.py:284-331)
with optax.  The paramz fix/unfix dance (util.py:294-318) becomes gradient
masking over the parameter pytree; the stochastic VE/VM flip-flop counter
(svmogp.py:188-199) becomes a step-indexed mask selection inside the jitted
train step.

Reference gating semantics reproduced exactly:
* batch VEM: alternate [VE: only q_mu/q_sqrt free] / [VM: hypers + Z + W
  free, lengthscales included] x vem_iters, inner optimizer 100 iters.
* stochastic VEM: the reference counter runs 4 VE gradient steps, then 1 VM
  step (svmogp.py:188-199: ve_count 0,1,2,3 are all VE; the count>2 branch
  still computes a VE gradient before flipping).
* kappa is always fixed (util.py:289).

Natural gradients (the north-star extra): for whitened q(u), the NGD step in
(mean, covariance) natural parameters; with a Gaussian likelihood and step
1.0 it lands exactly on the optimal q(u) — tested in
tests/test_natgrad.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models.params import SVMOGPParams
from hetmogp_tpu.ops import linalg

import os as _os

# natgrad lr-backoff on by default; =0 is a measurement-only escape hatch
# (see natgrad_ve_step)
_NG_BACKOFF = _os.environ.get("HETMOGP_NG_BACKOFF", "1") != "0"

# Divergence bounds for the exact retraction's step acceptance, in WHITENED
# units (prior q(v) = N(0, I), so the mean is in prior standard deviations
# and the posterior variance should contract below the prior's 1):
# * _NG_STEP_MAX — max whitened-mean MOVEMENT per step.  Healthy SVI moves
#   the mean a few sd per step even early on (measured <= ~19 on the
#   frontier workload); the near-singular-A blow-up moves it hundreds at
#   once (measured 411 in the poisoning step).  Scale-free: relative to the
#   current point, so a legitimately large |m| reached gradually never
#   trips it.
# * _NG_SANE_VAR — max whitened posterior variance (diag of L L^T); two
#   orders of magnitude above any sane posterior.
# See natgrad_ve_step's _ok for the livelock these catch.
_NG_STEP_MAX = 50.0
_NG_SANE_VAR = 1e2


# ---------------------------------------------------------------------------
# gradient masks (the fix/unfix mechanism)
# ---------------------------------------------------------------------------

def _scalar_mask_tree(params: SVMOGPParams, value: float) -> SVMOGPParams:
    """Per-leaf SCALAR 0/1 multipliers with the params' tree structure.

    Every fix/unfix decision here is whole-leaf, so the masks are scalars
    that broadcast in the multiply — materializing ones_like/zeros_like
    arrays (16 MB for q_sqrt at bench shapes) and streaming them through
    several elementwise passes per step was pure HBM waste.
    """
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(value, p.dtype), params)


def _leaf_scalar(params_leaf, value: float):
    return jnp.asarray(value, jnp.result_type(params_leaf))


def ve_mask(params: SVMOGPParams) -> SVMOGPParams:
    """VE step: only variational parameters free (util.py:296-304)."""
    z = _scalar_mask_tree(params, 0.0)
    return z.replace(q_mu=_leaf_scalar(params.q_mu, 1.0),
                     q_sqrt=_leaf_scalar(params.q_sqrt, 1.0))


def vm_mask(params: SVMOGPParams, train_config: TrainConfig) -> SVMOGPParams:
    """VM step: hypers (+ Z, W per flags) free, q(u) fixed (util.py:309-318).

    kappa stays fixed always (util.py:289).  Trainable likelihood
    parameters (params.lik_theta) count as hypers, gated by
    ``learn_lik_params`` (default off for reference parity — the reference
    has no trainable likelihood parameters).
    """
    z = _scalar_mask_tree(params, 0.0)
    m = z.replace(
        log_lengthscale=_leaf_scalar(params.log_lengthscale, 1.0),
        log_variance=_leaf_scalar(params.log_variance, 1.0),
    )
    if train_config.learn_inducing:
        m = m.replace(Z=_leaf_scalar(params.Z, 1.0))
    if train_config.learn_W:
        m = m.replace(W=_leaf_scalar(params.W, 1.0))
    if train_config.learn_lik_params and params.lik_theta is not None:
        m = m.replace(lik_theta=jax.tree_util.tree_map(
            lambda p: _leaf_scalar(p, 1.0), params.lik_theta))
    return m


def all_mask(params: SVMOGPParams, train_config: TrainConfig) -> SVMOGPParams:
    """Joint mode (non-VEM SVI): everything but kappa free."""
    ones = _scalar_mask_tree(params, 1.0)
    m = ones.replace(kappa=_leaf_scalar(params.kappa, 0.0))
    if not train_config.learn_inducing:
        m = m.replace(Z=_leaf_scalar(params.Z, 0.0))
    if not train_config.learn_W:
        m = m.replace(W=_leaf_scalar(params.W, 0.0))
    if not train_config.learn_lik_params and params.lik_theta is not None:
        m = m.replace(lik_theta=jax.tree_util.tree_map(
            lambda p: _leaf_scalar(p, 0.0), params.lik_theta))
    return m


def _apply_mask(grads, mask):
    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)


def _blend_masks(mask_a, mask_b, take_a):
    return jax.tree_util.tree_map(
        lambda a, b: a * take_a.astype(a.dtype) + b * (1.0 - take_a.astype(b.dtype)),
        mask_a, mask_b)


# ---------------------------------------------------------------------------
# stochastic SVI
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: SVMOGPParams
    opt_state: optax.OptState
    step: jnp.ndarray
    # cached prior Cholesky (Q, M, M); valid while hypers/Z are frozen.
    # None disables the VE-step cache (always recompute).
    Luu: Any = None
    # cached explicit triangular inverse (TrainConfig.fast_projection)
    iLuu: Any = None
    # natgrad_adam only: carried (Q, M, M) S^{-1} of the whitened q(u) —
    # the NGD update emits the exact next value (A + jitter I) so steady
    # state never recomputes it.  Valid while q_sqrt is updated ONLY by
    # natgrad_ve_step (the trainers mask q out of the first-order
    # optimizer); None recomputes per step (init_train_state(natgrad=True)
    # materializes it).
    S_inv: Any = None


@functools.partial(jax.jit, static_argnums=(1,))
def _tri_inverse(Luu: jnp.ndarray, precise: bool = False) -> jnp.ndarray:
    """Explicit triangular inverse for the fast projection path.

    The f32 solve-based inverse is accurate to ~4e-7 relative even at the
    bench conditioning (M=1024, cond(Kuu)~1e6, cond(Luu)~1e3) — the round-1
    "75% gradient error" attributed to this inverse was in fact caused by
    applying it with default-precision TPU matmuls (operands rounded to
    bfloat16 per pass), fixed by precision=HIGHEST at the apply site
    (models/elbo.py latent_projections).  ``precise`` adds one Newton step
    X <- X + X(I - L X) in HIGHEST-precision f32 matmuls as extra margin;
    measured unnecessary at bench conditioning (4.4e-7 -> 4.1e-7 relerr)
    while costing ~0.55 ms per cache refresh, so off by default.

    jitted: eager broadcast_in_dim over a remote TPU tunnel can hit a
    backend InvalidArgument; under jit it is fused anyway."""
    dt = Luu.dtype
    m = Luu.shape[-1]
    eye = jnp.eye(m, dtype=dt)
    iL = linalg.rec_tri_inverse(Luu)
    if precise:
        hi = jax.lax.Precision.HIGHEST
        R = eye - jnp.matmul(Luu, iL, precision=hi)
        iL = jnp.tril(iL + jnp.matmul(iL, R, precision=hi))
    return iL


def init_train_state(params: SVMOGPParams, config: ModelConfig,
                     optimizer: optax.GradientTransformation,
                     cache_luu: bool = True,
                     fast_projection: bool = True,
                     natgrad: bool = False) -> TrainState:
    """natgrad=True (optimizer='natgrad_adam' trainers) additionally
    materializes S^{-1} of the whitened q(u) so the scan carries it —
    without it every natgrad VE step re-inverts Lq (correct, slower)."""
    if cache_luu and fast_projection:
        Luu, iLuu = _prior_cholesky_inverse_jit(params, config)
    else:
        Luu = _prior_cholesky_jit(params, config) if cache_luu else None
        iLuu = None
    S_inv = _s_inv_jit(params.q_sqrt) if natgrad else None
    return TrainState(params, optimizer.init(params), jnp.asarray(0), Luu,
                      iLuu, S_inv)


@jax.jit
def _s_inv_jit(q_sqrt):
    """(Lq Lq^T)^{-1} from the dense factor parameter (natgrad state init)."""
    Lq = jnp.tril(q_sqrt)
    iLq = linalg.rec_tri_inverse(Lq)
    return linalg.tril_t_matmul(iLq, iLq,
                                precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnums=(1,))
def _prior_cholesky_inverse_jit(params: SVMOGPParams, config: ModelConfig):
    """Jitted fused (Luu, iLuu) for train-state initialization."""
    return elbo_mod.prior_cholesky_inverse(params, config)


@functools.partial(jax.jit, static_argnums=(1,))
def _prior_cholesky_jit(params: SVMOGPParams, config: ModelConfig):
    """Jitted blocked prior factorization for state initialization.

    Module-level (not a per-call lambda) so jit's trace cache is hit on
    repeated inits; jitted because eager slicing/concatenate chains in the
    blocked factorization can hit backend InvalidArgument over a remote
    TPU tunnel (same issue as _tri_inverse) — under jit they fuse into one
    program.  ModelConfig is hashable (frozen dataclass), so it is a valid
    static argument.
    """
    return elbo_mod.prior_cholesky(params, config, blocked=True)


class CliminAdadeltaState(NamedTuple):
    """climin Adadelta accumulators: grad mean square, step mean square, and
    the previous total step (for the momentum term)."""

    gms: Any
    sms: Any
    step: Any


def climin_adadelta(step_rate: float, decay: float = 0.9,
                    momentum: float = 0.9, offset: float = 1e-4
                    ) -> optax.GradientTransformation:
    """climin's literal Adadelta update rule as an optax transformation.

    The reference trains SVI with ``climin.Adadelta(wrt, grad, step_rate,
    momentum=0.9)`` (util.py:321-329).  climin's per-iteration arithmetic
    (climin 0.1a1 adadelta.py, reconstructed — climin is not installable
    here) is:

        step1 = momentum * step_{k-1}          # applied to wrt BEFORE the
        wrt  -= step1                          # gradient evaluation
        g     = grad(wrt)                      # Nesterov-style lookahead
        gms   = decay*gms + (1-decay) g^2
        step2 = sqrt(sms+offset)/sqrt(gms+offset) * g * step_rate
        wrt  -= step2
        step  = step1 + step2
        sms   = decay*sms + (1-decay) step^2

    This transformation returns ``-(step1 + step2)`` as the update, with
    exactly those accumulator updates.  For the full lookahead semantics the
    gradient must be evaluated at ``params - momentum*step_{k-1}`` — the SVI
    step does that automatically when this optimizer is selected (see
    ``adadelta_lookahead_point``); trained this way the trajectory matches a
    literal climin loop to machine precision (tests/test_train.py).
    """
    t = jax.tree_util.tree_map

    def init_fn(params):
        z = t(jnp.zeros_like, params)
        return CliminAdadeltaState(gms=z, sms=z, step=z)

    def update_fn(grads, state, params=None):
        del params
        step1 = t(lambda s: momentum * s, state.step)
        gms = t(lambda a, g: decay * a + (1.0 - decay) * jnp.square(g),
                state.gms, grads)
        step2 = t(lambda s, a, g:
                  jnp.sqrt(s + offset) / jnp.sqrt(a + offset) * g * step_rate,
                  state.sms, gms, grads)
        step = t(jnp.add, step1, step2)
        sms = t(lambda s, st: decay * s + (1.0 - decay) * jnp.square(st),
                state.sms, step)
        updates = t(jnp.negative, step)
        return updates, CliminAdadeltaState(gms=gms, sms=sms, step=step)

    return optax.GradientTransformation(init_fn, update_fn)


def adadelta_lookahead_point(params, opt_state, momentum: float, mask=None):
    """climin evaluates the gradient at ``wrt - momentum*step_{k-1}``.

    mask: optional 0/1 pytree restricting the shift to the leaves the
    current VE/VM mode will actually update.  This trainer masks UPDATES
    (climin leaks momentum into fixed params — a reference quirk not
    reproduced; see make_svi_step_body), so the gradient must be evaluated
    at the point consistent with that: an unmasked shift would move frozen
    hypers for the gradient evaluation only, making the VE forward
    internally inconsistent with the cached Luu/iLuu built at the real
    (unshifted) hypers.
    """
    step = opt_state.step
    if mask is not None:
        step = jax.tree_util.tree_map(lambda s, m: s * m, step, mask)
    return jax.tree_util.tree_map(
        lambda p, s: p - momentum * s, params, step)


def make_lr_schedule(train_config: TrainConfig):
    """step_rate or an optax schedule from TrainConfig.lr_schedule.

    The schedule step count lives inside the optax optimizer state, so it
    rides lax.scan and checkpoints/resumes with the rest of the state.
    """
    if train_config.lr_schedule is None:
        return train_config.step_rate
    kw = dict(train_config.lr_schedule_kwargs)
    known = {"cosine": {"decay_steps", "alpha"},
             "warmup_cosine": {"warmup_steps", "decay_steps", "init_value",
                               "end_value"},
             "exponential": {"transition_steps", "decay_rate"}}
    allowed = known.get(train_config.lr_schedule, set())
    unknown = set(kw) - allowed
    if unknown:
        raise ValueError(
            f"unknown lr_schedule_kwargs {sorted(unknown)} for "
            f"{train_config.lr_schedule!r}; allowed: {sorted(allowed)}")
    peak = train_config.step_rate
    if train_config.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(
            peak, decay_steps=int(kw.get("decay_steps", 10_000)),
            alpha=float(kw.get("alpha", 0.0)))
    if train_config.lr_schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=float(kw.get("init_value", 0.0)), peak_value=peak,
            warmup_steps=int(kw.get("warmup_steps", 100)),
            decay_steps=int(kw.get("decay_steps", 10_000)),
            end_value=float(kw.get("end_value", 0.0)))
    if train_config.lr_schedule == "exponential":
        return optax.exponential_decay(
            peak, transition_steps=int(kw.get("transition_steps", 1_000)),
            decay_rate=float(kw.get("decay_rate", 0.9)))
    raise ValueError(f"unknown lr_schedule {train_config.lr_schedule!r}")


def make_optimizer(train_config: TrainConfig) -> optax.GradientTransformation:
    if train_config.optimizer == "adadelta":
        # exact climin rule (see climin_adadelta); the SVI step adds the
        # momentum-lookahead gradient evaluation.  Schedules/clipping are
        # not supported here — this optimizer exists for reference parity.
        if (train_config.lr_schedule is not None
                or train_config.clip_grad_norm is not None):
            raise ValueError("lr_schedule/clip_grad_norm require "
                             "optimizer='adam' or 'natgrad_adam' (adadelta "
                             "is the climin-parity rule)")
        return climin_adadelta(train_config.step_rate,
                               decay=train_config.adadelta_decay,
                               momentum=train_config.momentum,
                               offset=train_config.adadelta_offset)
    if train_config.optimizer in ("adam", "natgrad_adam"):
        adam = optax.adam(make_lr_schedule(train_config))
        if train_config.clip_grad_norm is not None:
            return optax.chain(
                optax.clip_by_global_norm(train_config.clip_grad_norm), adam)
        return adam
    raise ValueError(f"unknown optimizer {train_config.optimizer!r}")


def make_svi_step_body(config: ModelConfig, train_config: TrainConfig,
                       vem: bool = True) -> Callable:
    """Build the (un-jitted) SVI step body.

    Returns step(state, data, scales) -> (state, metrics).  VE/VM gating is
    selected from the step counter inside the function (cycle length
    5 = 4 VE + 1 VM, matching the reference counter).  Wrap in jax.jit
    directly (``make_svi_step``) or with mesh shardings
    (``parallel.make_sharded_svi_step``).
    """
    optimizer = make_optimizer(train_config)
    use_natgrad = train_config.optimizer == "natgrad_adam"

    def loss_fn(params, data, scales, Luu=None, iLuu=None,
                cache_grad=False):
        e, aux = elbo_mod.elbo_fn(params, data, scales, config, Luu=Luu,
                                  iLuu=iLuu, cache_grad=cache_grad)
        return -e, aux

    cycle = train_config.ve_steps_per_vm + 1
    fastp = train_config.fast_projection
    lookahead = (train_config.optimizer == "adadelta"
                 and train_config.momentum > 0.0)

    def step_fn(state: TrainState, data, scales):
        params = state.params
        if vem:
            is_ve = (state.step % cycle) < train_config.ve_steps_per_vm
            mask = _blend_masks(ve_mask(params),
                                vm_mask(params, train_config), is_ve)
        else:
            mask = all_mask(params, train_config)
        if use_natgrad:
            # NGD owns the variational params; remove them from the
            # first-order optimizer's view.
            mask = mask.replace(q_mu=jnp.zeros_like(params.q_mu),
                                q_sqrt=jnp.zeros_like(params.q_sqrt))
        if lookahead:
            # climin applies the momentum step BEFORE the gradient eval;
            # grads are taken at the shifted point, updates (which include
            # that momentum step) at the stored params.  The shift is
            # masked to the mode's free leaves — see adadelta_lookahead_point
            grad_point = adadelta_lookahead_point(params, state.opt_state,
                                                  train_config.momentum,
                                                  mask=mask)
        else:
            grad_point = params
        use_cache = vem and state.Luu is not None
        if fastp and use_cache and state.iLuu is None:
            raise ValueError(
                "TrainConfig.fast_projection=True but the train state has no "
                "cached inverse — build it with init_train_state(..., "
                "fast_projection=True)")
        if use_cache:
            # VE steps freeze hypers/Z, so the cached Luu (and iLuu) are
            # exact there and the expensive Cholesky (+ inverse) and their
            # gradients are skipped.  Crucially the VE branch differentiates
            # ONLY w.r.t. (q_mu, q_sqrt): the VE mask would zero every other
            # gradient anyway, and skipping them drops the whole backward
            # pass through the projection (the K̄fu matmul, the transpose
            # solve, and the kernel-build backward) — measured ~35% of the
            # VE step at bench shapes.  The VM branch symmetrically
            # differentiates only the non-variational leaves.
            sg = jax.lax.stop_gradient
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

            def ve_branch(p):
                def loss_q(q_mu, q_sqrt):
                    pp = p.replace(q_mu=q_mu, q_sqrt=q_sqrt)
                    return loss_fn(pp, data, scales, sg(state.Luu),
                                   sg(state.iLuu) if fastp else None)

                if use_natgrad:
                    # fused NGD step: ONE forward+backward through the
                    # factor-form VE term yields metrics AND the
                    # natural-gradient update (no separate value-only
                    # forward; no adam gradient — the VE mask zeroes every
                    # other leaf anyway).  Carries the q-update AND the
                    # exact next S^{-1} out through the cond so the VM
                    # branch stays symmetric.
                    new_p, e, aux, s_inv_new = natgrad_ve_step(
                        p, data, scales, config, train_config.natgrad_lr,
                        Luu=sg(state.Luu),
                        iLuu=sg(state.iLuu) if fastp else None,
                        S_inv=(sg(state.S_inv)
                               if state.S_inv is not None else None),
                        retraction=train_config.natgrad_retraction,
                        trust=train_config.natgrad_trust)
                    q_out = (new_p.q_mu, new_p.q_sqrt)
                    if state.S_inv is not None:
                        q_out = q_out + (s_inv_new,)
                    return (-e, aux), zeros, q_out
                (v, aux), g = jax.value_and_grad(
                    loss_q, argnums=(0, 1), has_aux=True)(p.q_mu, p.q_sqrt)
                return (v, aux), zeros.replace(q_mu=g[0], q_sqrt=g[1])

            # VM gradients are evaluated at the CURRENT hypers, where the
            # cache is still valid (it only goes stale after the update),
            # so the fast path can reuse it: Cholesky forward skipped,
            # Cholesky pullback and solves as cached-inverse matmuls with
            # exact adjoint algebra (linalg.chol_cached/solve_tri_cached).
            # Gated off under adadelta lookahead, where the gradient point
            # has momentum-shifted hypers the cache does not match.
            vm_cached = fastp and config.whiten and not lookahead
            frac = train_config.vm_batch_fraction
            if frac < 1.0:
                # VM sub-batch: prefix rows (uniform random sub-block in
                # slice mode, iid rows in gather mode), scales re-derived
                # from the mask sums so padded rows stay excluded
                def _sub(td):
                    k = max(1, int(np.ceil(td.X.shape[0] * frac)))
                    return elbo_mod.TaskData(X=td.X[:k], Y=td.Y[:k],
                                             mask=td.mask[:k])

                data_vm = tuple(_sub(td) for td in data)
                full_rows = jnp.stack([jnp.maximum(jnp.sum(td.mask), 1.0)
                                       for td in data])
                sub_rows = jnp.stack([jnp.maximum(jnp.sum(td.mask), 1.0)
                                      for td in data_vm])
                scales_vm = scales * (full_rows / sub_rows).astype(scales.dtype)
            else:
                data_vm, scales_vm = data, scales

            def vm_branch(p):
                def loss_h(hp):
                    pp = p.replace(**hp)
                    if vm_cached:
                        return loss_fn(pp, data_vm, scales_vm, Luu=state.Luu,
                                       iLuu=state.iLuu, cache_grad=True)
                    return loss_fn(pp, data_vm, scales_vm)

                hyper = dict(log_lengthscale=p.log_lengthscale,
                             log_variance=p.log_variance, Z=p.Z, W=p.W,
                             kappa=p.kappa)
                if p.lik_theta is not None:
                    hyper["lik_theta"] = p.lik_theta
                (v, aux), g = jax.value_and_grad(
                    loss_h, has_aux=True)(hyper)
                if use_natgrad:
                    # keep the cond output structures symmetric with
                    # ve_branch (incl. the backoff counter and carried
                    # S^{-1}, both untouched on VM steps)
                    aux = dict(aux, ng_backoff=jnp.zeros((), jnp.int32))
                    q_out = (p.q_mu, p.q_sqrt)
                    if state.S_inv is not None:
                        q_out = q_out + (state.S_inv,)
                    return (v, aux), zeros.replace(**g), q_out
                return (v, aux), zeros.replace(**g)

            cond_out = jax.lax.cond(is_ve, ve_branch, vm_branch, grad_point)
            if use_natgrad:
                (neg_elbo, aux), grads, q_new = cond_out
            else:
                (neg_elbo, aux), grads = cond_out
                q_new = None
        else:
            (neg_elbo, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(grad_point, data, scales)
            q_new = None
        grads = _apply_mask(grads, mask)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        # mask the updates too: momentum optimizers would otherwise keep
        # moving "fixed" parameters after a mode switch (the reference only
        # zeroes gradients, svmogp.py:109-110, and leaks climin momentum
        # into fixed params — a quirk not worth reproducing)
        updates = _apply_mask(updates, mask)
        params = optax.apply_updates(params, updates)
        S_inv_next = state.S_inv
        if use_natgrad:
            if q_new is not None:
                # cached-VEM path: the fused NGD update was computed inside
                # ve_branch (shared forward+backward); VM steps pass the
                # unchanged q through, so this replace is a no-op there
                params = params.replace(q_mu=q_new[0], q_sqrt=q_new[1])
                if state.S_inv is not None:
                    S_inv_next = q_new[2]
            else:
                # uncached path: NGD runs only on VE steps under VEM — as a
                # lax.cond branch so the VM steps skip its forward+backward
                # and O(Q M^3) factorizations entirely (jnp.where would
                # evaluate both sides under jit)
                def ng(p):
                    return natgrad_update(
                        p, data, scales, config, train_config.natgrad_lr,
                        retraction=train_config.natgrad_retraction,
                        trust=train_config.natgrad_trust)

                if vem:
                    do_ng = (state.step % cycle) < train_config.ve_steps_per_vm
                    params = jax.lax.cond(do_ng, ng, lambda p: p, params)
                else:
                    params = ng(params)
        if use_cache:
            # refresh the cache after VM steps (hypers/Z moved)
            def keep(p):
                return state.Luu, state.iLuu

            def refresh(p):
                # keep the inverse alive iff the state carries one (it may
                # be present but unused when fast_projection is off)
                if state.iLuu is None:
                    return elbo_mod.prior_cholesky(p, config,
                                                   blocked=True), None
                # fused factorization + inverse: shares the (nb, nb) panel
                # inverses, no separate InvertDiagBlocks custom call
                return elbo_mod.prior_cholesky_inverse(p, config)

            Luu_next, iLuu_next = jax.lax.cond(is_ve, keep, refresh, params)
        else:
            Luu_next, iLuu_next = state.Luu, state.iLuu
        metrics = {"elbo": -neg_elbo, "kl": aux["kl"], "ve": aux["ve"]}
        if "ng_backoff" in aux:
            metrics["ng_backoff"] = aux["ng_backoff"]
        new_state = TrainState(params, opt_state, state.step + 1, Luu_next,
                               iLuu_next, S_inv_next)
        if train_config.skip_nonfinite_steps:
            # production fault tolerance (SURVEY §5 failure handling): a
            # non-finite step ELBO (e.g. a transiently indefinite Kuu at
            # f32 roundoff under an extreme hyper update) discards that
            # step's updates instead of poisoning the state forever.  The
            # gradient global norm is checked too: a finite ELBO with a
            # non-finite gradient (e.g. a likelihood-derivative overflow)
            # would otherwise poison params/opt_state through the update.
            # The step counter still advances (the VE/VM schedule stays
            # aligned), but a skipped step keeps the OLD opt_state — adam
            # moments and any optax schedule's internal count do not tick
            # on skipped steps (the schedule is driven by accepted-update
            # count, not state.step).  Static flag: no cost when disabled.
            ok = jnp.isfinite(neg_elbo) & jnp.isfinite(optax.global_norm(grads))
            if q_new is not None:
                # fused-NGD path: the q-update bypasses `grads`, so check
                # its own finiteness (an indefinite A in natgrad_ve_step
                # surfaces as NaNs in L_new/m_new)
                ok = (ok & jnp.isfinite(q_new[0]).all()
                      & jnp.isfinite(q_new[1]).all())

            def _sel(new, old):
                return jax.lax.select(
                    jnp.broadcast_to(ok, jnp.shape(new)), new, old)

            kept = jax.tree_util.tree_map(
                _sel, (new_state.params, new_state.opt_state,
                       new_state.Luu, new_state.iLuu, new_state.S_inv),
                (state.params, state.opt_state, state.Luu, state.iLuu,
                 state.S_inv))
            new_state = TrainState(kept[0], kept[1], state.step + 1,
                                   kept[2], kept[3], kept[4])
            metrics["skipped"] = (~ok).astype(jnp.int32)
        return new_state, metrics

    return step_fn


def make_svi_step(config: ModelConfig, train_config: TrainConfig,
                  vem: bool = True) -> Callable:
    """Jitted single-host SVI step; see make_svi_step_body."""
    return jax.jit(make_svi_step_body(config, train_config, vem=vem))


def print_callback(every: int = 50):
    """The reference's training callback: print the ELBO every ``every``
    iterations (svmogp.py:201-217 prints 'svi - iteration ... elbo' every
    50).  Pass to ``svi_fit(callback=...)`` / ``SVMOGP.fit_svi``."""

    def cb(i, metrics):
        if i % every == 0:
            print(f"svi - iteration {i} elbo {float(metrics['elbo']):.6f}")

    return cb


def plot_callback(every: int = 50, path: Optional[str] = None, ax=None):
    """Live ELBO plot, the reference's ``callback(verbose_plot=True)``
    equivalent (svmogp.py:208-213: redraws an ELBO-vs-iteration line every
    50 SVI iterations).

    Headless-friendly: with ``path`` the figure is saved there on each
    redraw (Agg backend); in an interactive backend the figure updates in
    place.  Pass to ``svi_fit(callback=...)`` / ``SVMOGP.fit_svi``.  The
    accumulated history is available as ``cb.history``.
    """
    import matplotlib
    if path is not None and matplotlib.get_backend().lower() != "agg":
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots(figsize=(7, 3))
    else:
        fig = ax.figure
    (line,) = ax.plot([], [], lw=1.0)
    ax.set_xlabel("iteration")
    ax.set_ylabel("ELBO")
    history = []

    def cb(i, metrics):
        history.append(float(metrics["elbo"]))
        if i % every == 0:
            line.set_data(np.arange(len(history)), np.asarray(history))
            ax.relim()
            ax.autoscale_view()
            if path is not None:
                fig.savefig(path, dpi=80)
            else:
                fig.canvas.draw_idle()
                plt.pause(0.001)

    cb.history = history
    cb.figure = fig
    return cb


def svi_fit(params: SVMOGPParams, config: ModelConfig,
            train_config: TrainConfig, stream, num_steps: int,
            vem: bool = True, callback: Optional[Callable] = None):
    """Run SVI for num_steps minibatch steps; returns (params, elbo_history).

    Mirrors the reference stochastic path (util.py:321-329 + climin loop).
    callback(i, metrics): per-step hook; ``print_callback()`` reproduces
    the reference's every-50-iterations ELBO print.
    """
    step = make_svi_step(config, train_config, vem=vem)
    optimizer = make_optimizer(train_config)
    state = init_train_state(
        params, config, optimizer, cache_luu=vem,
        fast_projection=train_config.fast_projection,
        # the carried S^{-1} exists only for the exact retraction — the
        # cholesky retraction never consumes it
        natgrad=(train_config.optimizer == "natgrad_adam"
                 and train_config.natgrad_retraction == "exact"))
    history = np.empty(num_steps)
    for i in range(num_steps):
        data, scales = stream.next()
        state, metrics = step(state, data, jnp.asarray(scales, config.np_dtype))
        history[i] = float(metrics["elbo"])
        if callback is not None:
            callback(i, metrics)
    return state.params, history


# ---------------------------------------------------------------------------
# fully on-device SVI (lax.scan over steps, device-resident dataset)
# ---------------------------------------------------------------------------

def extend_for_wraparound(dataset, batch_sizes, task_sizes=None):
    """Append each task's first B_t REAL rows so circular slices are plain
    dynamic slices.  Called ONCE per scan-trainer invocation (outside the
    step loop) so the concatenation is guaranteed loop-invariant.

    task_sizes: the per-task REAL row counts.  When the dataset carries
    padding rows (``full_batch(pad_multiple=k)``, mask 0 beyond N_t), the
    extension must sit at index N_t — appending after the padding would make
    slices that cross N_t pick mask-0 padding rows instead of the wrapped
    first rows, re-introducing the boundary under-sampling bias.  The
    padding rows are dropped here: samplers only ever slice offsets in
    [0, N_t), so they are unreachable anyway."""
    out = []
    if task_sizes is None:
        task_sizes = tuple(int(td.X.shape[0]) for td in dataset)
    for td, bt, nt in zip(dataset, batch_sizes, task_sizes):
        bt = min(bt, nt)
        out.append(elbo_mod.TaskData(
            X=jnp.concatenate([td.X[:nt], td.X[:bt]], axis=0),
            Y=jnp.concatenate([td.Y[:nt], td.Y[:bt]], axis=0),
            mask=jnp.concatenate([td.mask[:nt], td.mask[:bt]], axis=0)))
    return tuple(out)


@functools.lru_cache(maxsize=64)
def make_batch_sampler(train_config: TrainConfig, task_sizes, batch_sizes,
                       mesh=None, pre_extended: bool = False):
    """Build sample_batch(key, dataset) -> tuple[TaskData] for the on-device
    scan trainer.  minibatch="slice" draws a contiguous circular block at a
    uniform random offset in [0, N_t) — every row has inclusion probability
    B/N; otherwise a uniform with-replacement row gather.  With a mesh,
    batches are re-sharded over the data axis after the gather.

    pre_extended: the dataset was already passed through
    ``extend_for_wraparound`` (the scan trainer does this once per run so
    the wraparound concatenation never sits inside the step loop)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_spec = NamedSharding(mesh, P("data", None))
        mask_spec = NamedSharding(mesh, P("data"))

    def sample_batch(key, dataset):
        batch = []
        keys = jax.random.split(key, len(dataset))
        for t, td in enumerate(dataset):
            if train_config.minibatch == "slice":
                # contiguous WRAPAROUND block at a uniform random offset —
                # cheaper than a row gather on TPU and, like the
                # reference's sequential-cycling slices (util.py:52-72),
                # contiguous; the circular wrap gives every row the same
                # inclusion probability B/N, so the N/B ELBO scale is
                # unbiased (plain [0, N-B] offsets under-sample the first/
                # last B-1 rows of each task)
                nt, bt = task_sizes[t], batch_sizes[t]
                if bt >= nt:  # whole (possibly padded) task every step
                    if pre_extended:
                        X, Y, m = td.X[:nt], td.Y[:nt], td.mask[:nt]
                    else:
                        X, Y, m = td.X, td.Y, td.mask
                else:
                    off = jax.random.randint(keys[t], (), 0, nt)
                    if pre_extended:
                        Xe, Ye, me = td.X, td.Y, td.mask
                    else:
                        Xe = jnp.concatenate([td.X, td.X[:bt]], axis=0)
                        Ye = jnp.concatenate([td.Y, td.Y[:bt]], axis=0)
                        me = jnp.concatenate([td.mask, td.mask[:bt]], axis=0)
                    X = jax.lax.dynamic_slice_in_dim(Xe, off, bt, 0)
                    Y = jax.lax.dynamic_slice_in_dim(Ye, off, bt, 0)
                    m = jax.lax.dynamic_slice_in_dim(me, off, bt, 0)
            else:
                idx = jax.random.randint(keys[t], (batch_sizes[t],), 0,
                                         task_sizes[t])
                X = jnp.take(td.X, idx, axis=0)
                Y = jnp.take(td.Y, idx, axis=0)
                m = jnp.take(td.mask, idx, axis=0)
            if mesh is not None:
                # after the (tiny) gather from the row-sharded dataset,
                # re-shard the batch over the data axis so the ELBO/grad
                # compute is partitioned; the reshard moves only B rows
                # over ICI per task
                X = jax.lax.with_sharding_constraint(X, batch_spec)
                Y = jax.lax.with_sharding_constraint(Y, batch_spec)
                m = jax.lax.with_sharding_constraint(m, mask_spec)
            batch.append(elbo_mod.TaskData(X=X, Y=Y, mask=m))
        return tuple(batch)

    return sample_batch


@functools.lru_cache(maxsize=64)
def make_scan_trainer(config: ModelConfig, train_config: TrainConfig,
                      task_sizes: Tuple[int, ...], batch_sizes: Tuple[int, ...],
                      vem: bool = True, steps_per_call: int = 100,
                      mesh=None):
    """SVI with the data pipeline on-device: one jitted call runs
    ``steps_per_call`` optimizer steps via ``lax.scan``, sampling each step's
    minibatch from the HBM-resident dataset with a random gather.

    This is the production TPU loop: the host-stream path
    (``make_svi_step``) pays a host->device round trip per step (~40ms over
    a remote tunnel vs ~ms of compute); here the whole loop compiles into
    one XLA program.

    Returns run(state, dataset, key) -> (state, elbo_history (steps,)).
    dataset: tuple of TaskData with the FULL per-task arrays (padded rows
    carry mask 0 and are never sampled because sampling is over [0, N_t)).
    """
    body_step = make_svi_step_body(config, train_config, vem=vem)
    slice_mode = train_config.minibatch == "slice"
    # ELBO scale N/B uses the EFFECTIVE batch size: in slice mode a task with
    # B_t >= N_t is returned whole (N_t rows) every step, so its scale is 1,
    # not N_t/B_t < 1 (which would under-weight that task's VE term against
    # the KL).  Gather mode samples with replacement, so B_t > N_t stays an
    # unbiased B_t-row estimate with scale N_t/B_t.
    if slice_mode:
        eff_sizes = tuple(min(b, n) for n, b in zip(task_sizes, batch_sizes))
    else:
        eff_sizes = batch_sizes
    scales = jnp.asarray([n / float(b) for n, b in zip(task_sizes, eff_sizes)])
    sample_batch = make_batch_sampler(train_config, task_sizes, batch_sizes,
                                      mesh=mesh, pre_extended=slice_mode)

    def run(state: TrainState, dataset, key):
        if slice_mode:
            # one concatenation per run call, guaranteed outside the scan
            dataset = extend_for_wraparound(dataset, batch_sizes, task_sizes)

        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            batch = sample_batch(sub, dataset)
            state, metrics = body_step(state, batch,
                                       scales.astype(config.np_dtype))
            return (state, key), metrics["elbo"]

        (state, _), elbos = jax.lax.scan(body, (state, key), None,
                                         length=steps_per_call)
        return state, elbos

    if mesh is None:
        return jax.jit(run, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    data_sh = tuple(
        elbo_mod.TaskData(X=NamedSharding(mesh, P("data", None)),
                          Y=NamedSharding(mesh, P("data", None)),
                          mask=NamedSharding(mesh, P("data")))
        for _ in range(config.num_tasks))
    # on a 2-D ('data','latent') mesh the state arrives latent-sharded
    # (parallel.sharding.shard_state); None keeps the caller's placement
    from hetmogp_tpu.parallel.sharding import has_latent_axis

    state_sh = None if has_latent_axis(mesh) else rep
    return jax.jit(run, in_shardings=(state_sh, data_sh, rep),
                   donate_argnums=(0,))


#: Known per-chip HBM capacities by ``device_kind`` substring, used when the
#: runtime does not report ``memory_stats()['bytes_limit']`` (the tunnel
#: backend and the CPU test platform both return None).  Values are the
#: public per-chip HBM sizes.
_HBM_BYTES_BY_KIND = (
    ("v6 lite", 32 << 30), ("v6e", 32 << 30),
    ("v5 lite", 16 << 30), ("v5e", 16 << 30),
    ("v5p", 95 << 30), ("v5", 95 << 30),
    ("v4", 32 << 30), ("v3", 32 << 30), ("v2", 16 << 30),
)

#: Fraction of per-device HBM the parked dataset may occupy.  The rest is
#: headroom for parameters, optimizer state, the (Q, B, M) projection
#: activations and XLA scratch.  At the bench shapes (M=1024, Q=4, B=512 x 6
#: tasks, f32) those come to well under 2 GB, so 0.6 leaves a wide margin.
DATASET_HBM_FRACTION = 0.6


def _device_hbm_bytes(device) -> Optional[int]:
    """Per-device memory capacity in bytes, or None when unknowable.

    Prefers the runtime's own ``memory_stats()['bytes_limit']``; falls back
    to the public per-chip HBM table keyed on ``device_kind``.  CPU (the
    test platform) returns None — host RAM is not the envelope being
    guarded.  ``HETMOGP_HBM_BYTES`` overrides everything (set it to test
    the guard, or when fronting an unlisted accelerator).
    """
    env = _os.environ.get("HETMOGP_HBM_BYTES")
    if env:
        return int(env)
    try:
        stats = device.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    kind = getattr(device, "device_kind", "").lower()
    if getattr(device, "platform", "") == "cpu":
        return None
    for sub, nbytes in _HBM_BYTES_BY_KIND:
        if sub in kind:
            return nbytes
    return None


def check_dataset_fits_hbm(dataset, mesh=None, devices=None) -> None:
    """Fail fast (with the fallback named) if a parked dataset can't fit.

    ``svi_fit_on_device`` parks the FULL dataset in HBM — the right call at
    the bench shapes (N=1e6 x 6 tasks, f32, ~32 MB/task: ~0.2 GB of a 16 GB
    v5e chip, so max N per v5e chip at those row widths is ~2.4e9 rows
    BEFORE this guard trips at 60%).  At N >> HBM the failure mode would
    otherwise be an opaque runtime OOM mid-compile; this raises a
    ``ValueError`` naming the host-streaming fallback (``svi_fit``, which
    holds only one minibatch on device) and the data-parallel escape
    (a larger ``mesh`` data axis shards the dataset N-ways).

    The per-device envelope is ``DATASET_HBM_FRACTION`` of HBM; with a mesh
    the dataset is row-sharded, so the per-device share is total bytes /
    mesh.shape['data'].  Skipped (returns) when capacity is unknowable —
    CPU test hosts and runtimes without ``memory_stats``.
    """
    devices = (list(mesh.devices.flat) if mesh is not None
               else (devices or jax.devices()))
    cap = _device_hbm_bytes(devices[0])
    if cap is None:
        return
    total = 0
    for td in dataset:
        for leaf in (td.X, td.Y, td.mask):
            if leaf is not None:
                total += int(np.prod(np.shape(leaf))) * np.dtype(
                    getattr(leaf, "dtype", np.float32)).itemsize
    shards = int(mesh.shape["data"]) if mesh is not None else 1
    per_device = total / shards
    budget = DATASET_HBM_FRACTION * cap
    if per_device > budget:
        raise ValueError(
            f"on-device dataset is {per_device / 2**30:.2f} GiB per device "
            f"({total / 2**30:.2f} GiB over {shards} data-parallel "
            f"device(s)), exceeding {DATASET_HBM_FRACTION:.0%} of the "
            f"{cap / 2**30:.0f} GiB per-device HBM. Options: (1) stream "
            f"minibatches from host with train.svi_fit (only one batch "
            f"lives on device), (2) shard rows over more devices (a mesh "
            f"with a larger 'data' axis), (3) downcast inputs (float32 -> "
            f"bfloat16 halves the footprint), or (4) raise "
            f"train.DATASET_HBM_FRACTION / set HETMOGP_HBM_BYTES if this "
            f"envelope is wrong for your hardware.")


def prepare_dataset_on_device(config: ModelConfig, X_list, Y_list,
                              mesh=None):
    """Assemble the full dataset once and place it on device(s).

    Pads each task's rows to the mesh's data-axis size so the dataset
    shards evenly (task_sizes stay the REAL counts: samplers draw in
    [0, N_t) and the wraparound extension is inserted at N_t, so padding
    rows are never sampled).  Returns a device-resident tuple of TaskData
    reusable across svi_fit_on_device calls.

    Raises ValueError (see ``check_dataset_fits_hbm``) when the dataset
    cannot fit the per-device HBM envelope — use ``svi_fit`` (host
    streaming) for datasets beyond it.
    """
    from hetmogp_tpu.data import full_batch

    pad = int(mesh.shape["data"]) if mesh is not None else 1
    dataset, _ = full_batch(X_list, Y_list, dtype=config.np_dtype,
                            pad_multiple=pad)
    check_dataset_fits_hbm(dataset, mesh=mesh)
    if mesh is not None:
        from hetmogp_tpu.parallel import sharding as _sh

        return _sh.shard_batch(mesh, dataset)
    return jax.device_put(dataset)


def _step_checkpoints(ckpt_dir):
    """All ``step_<n>`` subdirectories of ckpt_dir as a sorted
    [(n, path), ...] — the single parser shared by resume selection and
    keep-last rotation so both accept exactly the same names."""
    from pathlib import Path

    d = Path(ckpt_dir)
    if not d.is_dir():
        return []
    return sorted((int(p.name[5:]), p) for p in d.iterdir()
                  if p.is_dir() and p.name.startswith("step_")
                  and p.name[5:].isdigit())


def _latest_step_checkpoint(ckpt_dir):
    """Newest ``step_<n>`` subdirectory of ckpt_dir, as (n, path) or None."""
    found = _step_checkpoints(ckpt_dir)
    return found[-1] if found else None


def svi_fit_on_device(params: SVMOGPParams, config: ModelConfig,
                      train_config: TrainConfig, X_list, Y_list,
                      batch_sizes, num_steps: int, *, key=None,
                      vem: bool = True, steps_per_call: int = 100,
                      mesh=None, dataset=None, checkpoint_dir=None,
                      checkpoint_every: Optional[int] = None,
                      keep_last: int = 2, resume: bool = False,
                      early_stop_tol: Optional[float] = None,
                      early_stop_patience: int = 3):
    """Convenience wrapper over make_scan_trainer; returns (params, history).

    early_stop_tol: optional convergence stop at scan-chunk granularity
    (the finest the on-device loop surfaces without paying a per-step
    host sync): training stops once the chunk-mean ELBO has failed to
    improve on its best by more than ``early_stop_tol`` for
    ``early_stop_patience`` consecutive chunks.  A final checkpoint is
    written on early stop when checkpointing is on.  Chunk means (not
    last-step values) are compared so minibatch noise does not trip it.

    mesh: optional jax.sharding.Mesh — a 1-D ('data',) mesh shards batch
    rows across devices; a 2-D ('data','latent') mesh (parallel.model_mesh)
    additionally shards the Q-leading state over latent GPs.

    dataset: optional prebuilt/device-resident tuple of TaskData (from
    ``data.full_batch`` with ``pad_multiple=mesh.shape['data']`` when a
    mesh is used, or a previous call via ``prepare_dataset_on_device``) —
    skips the per-call host-side assembly + host->device transfer of the
    full dataset, which dominates wall time for repeated calls at N~1e6
    (e.g. train / checkpoint / resume loops).  task_sizes are still taken
    from X_list, so pass the SAME X_list the dataset was built from.

    checkpoint_dir: optional directory for periodic Orbax checkpoints
    (``checkpoint.save_checkpoint_sharded``: params + opt_state + step +
    RNG key, sharded-state safe).  Saves land at scan-chunk boundaries —
    every ``checkpoint_every`` steps (rounded up to ``steps_per_call``;
    default one per chunk) plus one at ``num_steps`` — as
    ``{checkpoint_dir}/step_{n}``, keeping the newest ``keep_last``.  A
    fresh run (``resume=False``) into a directory that already holds
    ``step_`` checkpoints raises — rotation would otherwise delete the new
    run's saves while keeping the stale higher-numbered ones.  With
    ``resume=True`` the newest checkpoint is restored first and training
    continues its exact step/RNG stream: a killed run rerun with the same
    arguments produces the trajectory of the uninterrupted run (the
    returned history covers only the steps THIS call executed).  Exact
    bit-equality to an uninterrupted run holds when the checkpoint sits on
    a ``steps_per_call`` boundary — a trailing remainder chunk draws its
    minibatch keys from one extra key split, so resuming from a remainder
    checkpoint is a correct continuation but a different (equally unbiased)
    minibatch stream than a longer uninterrupted run would have used.
    """
    if isinstance(batch_sizes, int):
        batch_sizes = tuple([batch_sizes] * len(X_list))
    if early_stop_tol is not None and early_stop_patience < 1:
        raise ValueError("early_stop_patience must be >= 1 (patience 0 "
                         "would stop after the first chunk even while "
                         "improving)")
    key = key if key is not None else jax.random.PRNGKey(train_config.seed)
    task_sizes = tuple(int(np.shape(x)[0]) for x in X_list)
    if dataset is None:
        dataset = prepare_dataset_on_device(config, X_list, Y_list,
                                            mesh=mesh)
    runner = make_scan_trainer(config, train_config, task_sizes,
                               tuple(batch_sizes), vem=vem,
                               steps_per_call=steps_per_call, mesh=mesh)
    optimizer = make_optimizer(train_config)
    # the scan runner donates its input state, which would otherwise
    # consume the CALLER's param buffers — train on a private copy
    params = jax.tree_util.tree_map(jnp.array, params)
    done = 0
    step0 = jnp.asarray(0)
    opt_state0 = None
    if checkpoint_dir is not None:
        existing = _step_checkpoints(checkpoint_dir)
        if existing and not resume:
            raise ValueError(
                f"{checkpoint_dir!s} already contains checkpoints "
                f"(step_{existing[-1][0]} newest); pass resume=True to "
                "continue that run, or use an empty directory — starting "
                "fresh here would rotate away this run's checkpoints while "
                "keeping the stale higher-numbered ones")
        if existing and resume:
            from hetmogp_tpu import checkpoint as _ckpt

            done, path = existing[-1]
            # templates need only shapes/dtypes — no Luu/iLuu factorization
            params, opt_state0, step2, extra = _ckpt.load_checkpoint_sharded(
                path, params, opt_state_template=optimizer.init(params),
                mesh=mesh)
            step0 = jnp.asarray(step2)
            if "rng_key" in extra:
                key = jnp.asarray(extra["rng_key"], dtype=jnp.uint32)
            # else: a manual save_checkpoint_sharded without rng_key —
            # continue with the caller's key (correct but a different
            # minibatch stream than the uninterrupted run)
    state = init_train_state(
        params, config, optimizer, cache_luu=vem,
        fast_projection=train_config.fast_projection,
        # the carried S^{-1} exists only for the exact retraction — the
        # cholesky retraction never consumes it
        natgrad=(train_config.optimizer == "natgrad_adam"
                 and train_config.natgrad_retraction == "exact"))
    if opt_state0 is not None:
        state = state._replace(opt_state=opt_state0,
                               step=step0.astype(state.step.dtype))
    if mesh is not None:
        from hetmogp_tpu.parallel import sharding as _sh

        state = _sh.shard_state(mesh, state)

    last_saved = -1

    def maybe_save(prev_done):
        nonlocal last_saved
        if checkpoint_dir is None or last_saved == done:
            return
        every = checkpoint_every or steps_per_call
        if done < num_steps and done // every == prev_done // every:
            return
        from pathlib import Path
        import shutil

        from hetmogp_tpu import checkpoint as _ckpt

        _ckpt.save_checkpoint_sharded(
            Path(checkpoint_dir) / f"step_{done}", state.params,
            opt_state=state.opt_state, step=int(state.step),
            rng_key=np.asarray(key))
        last_saved = done
        if keep_last > 0:
            for _, p in _step_checkpoints(checkpoint_dir)[:-keep_last]:
                shutil.rmtree(p)

    chunks = []
    best_mean, stale, stopped = -np.inf, 0, False
    while done + steps_per_call <= num_steps:
        key, sub = jax.random.split(key)
        state, elbos = runner(state, dataset, sub)
        chunks.append(np.asarray(elbos))
        done += steps_per_call
        maybe_save(done - steps_per_call)
        if early_stop_tol is not None:
            m = float(chunks[-1].mean())
            if m > best_mean + early_stop_tol:
                best_mean, stale = m, 0
            else:
                stale += 1
            if stale >= early_stop_patience:
                stopped = True
                maybe_save(-1)  # force a final checkpoint at this chunk
                break
    if not stopped and done < num_steps:
        # remainder chunk with its own (smaller) compiled runner so the
        # returned params correspond exactly to num_steps optimizer steps
        rem_runner = make_scan_trainer(config, train_config, task_sizes,
                                       tuple(batch_sizes), vem=vem,
                                       steps_per_call=num_steps - done,
                                       mesh=mesh)
        key, sub = jax.random.split(key)
        state, elbos = rem_runner(state, dataset, sub)
        chunks.append(np.asarray(elbos))
        prev, done = done, num_steps
        maybe_save(prev)
    history = np.concatenate(chunks) if chunks else np.zeros((0,))
    return state.params, history


# ---------------------------------------------------------------------------
# batch VEM with L-BFGS (reference util.py:292-319)
# ---------------------------------------------------------------------------

def make_lbfgs_runner(loss, mask, max_iters: int):
    """Jitted masked L-BFGS runner (paramz ``optimize(max_iters=100)``
    equivalent).  Masked coordinates have zero gradient -> zero update.

    The whole iteration loop runs on-device as one ``lax.scan`` program —
    over a remote TPU tunnel, per-iteration host dispatch would cost ~40ms
    x max_iters per VEM half-step.  Build once per mask and reuse across
    VEM iterations (each build compiles a fresh program).
    """
    opt = optax.lbfgs()
    value_and_grad = jax.value_and_grad(loss)

    def one(carry, _):
        params, opt_state = carry
        value, grads = value_and_grad(params)
        grads = _apply_mask(grads, mask)
        updates, opt_state = opt.update(
            grads, opt_state, params, value=value, grad=grads,
            value_fn=loss)
        updates = _apply_mask(updates, mask)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    @jax.jit
    def run(params):
        (params, _), values = jax.lax.scan(one, (params, opt.init(params)),
                                           None, length=max_iters)
        return params, values[-1]

    return run


def vem_algorithm(params: SVMOGPParams, config: ModelConfig, X_list, Y_list,
                  train_config: Optional[TrainConfig] = None,
                  stochastic: bool = False, stream=None,
                  num_steps: Optional[int] = None, verbose: bool = False):
    """Variational-EM driver, reference ``vem_algorithm`` (util.py:284-331).

    Batch mode: vem_iters x [VE L-BFGS(100) then VM L-BFGS(100)].
    Stochastic mode: delegates to svi_fit with the 4:1 VE/VM cycle.
    Returns (params, elbo_history).
    """
    train_config = train_config or TrainConfig()
    if stochastic:
        if stream is None:
            raise ValueError("stochastic mode needs a MinibatchStream")
        return svi_fit(params, config, train_config, stream,
                       num_steps or train_config.vem_iters, vem=True)

    data, scales = _as_batch(X_list, Y_list, config)
    scales = jnp.asarray(scales, config.np_dtype)

    def loss(p):
        return -elbo_mod.elbo_fn(p, data, scales, config)[0]

    ve_run = make_lbfgs_runner(loss, ve_mask(params),
                               train_config.batch_inner_iters)
    vm_run = make_lbfgs_runner(loss, vm_mask(params, train_config),
                               train_config.batch_inner_iters)
    history = []
    for i in range(train_config.vem_iters):
        params, val = ve_run(params)
        history.append(-float(val))
        if verbose:
            print(f"iteration ({i + 1}) VE step, ELBO={-float(val):.6f}")
        params, val = vm_run(params)
        history.append(-float(val))
        if verbose:
            print(f"iteration ({i + 1}) VM step, ELBO={-float(val):.6f}")
    return params, np.asarray(history)


def _as_batch(X_list, Y_list, config: ModelConfig):
    from hetmogp_tpu.data import full_batch

    return full_batch(X_list, Y_list, dtype=config.np_dtype)


# ---------------------------------------------------------------------------
# natural gradients for whitened q(u)
# ---------------------------------------------------------------------------

def natgrad_ve_step(params: SVMOGPParams, data, scales, config: ModelConfig,
                    lr: float, Luu=None, iLuu=None, S_inv=None,
                    retraction: str = "exact", trust: float = 0.3):
    """Fused natural-gradient VE step on the whitened q(u).

    Returns (new_params, elbo, aux, S_inv_new) — ONE forward+backward
    serves both the step's metrics and the NGD update, and the update's
    byproduct A + jitter*I IS the exact next S^{-1}, handed back for the
    trainer to carry (TrainState.S_inv) so steady-state steps never invert
    anything but the single reversed-Cholesky of A.

    Natural params theta1 = S^{-1} m, theta2 = -1/2 S^{-1}; the NGD step is
    theta <- theta + lr * dELBO/d(expectation params), with
    d/d-eta1 = dm - 2 dS m and d/d-eta2 = dS  (Salimbeni et al., 2018).
    With a conjugate (Gaussian) likelihood and lr=1 this is exact CAVI.

    TPU-shaped linear algebra (round-4 rework, docs/DESIGN.md §7i): the VE
    variance term runs in factor form — gamma = kdiag + quad_diag(P, Lq) -
    |P|^2, triangular-aware — and autodiff covers only the O(N F) mixing +
    likelihood quadrature; the O(N M^2) gradients are analytic (g_m = P^T
    g_mean, g_S = P^T diag(c) P), and the whitened KL's are too (dKL/dS =
    0.5 (I - S^{-1})).  S = Lq Lq^T is never materialized; with a carried
    S_inv the per-step O(M^3) work is exactly one fused blocked
    Cholesky+inverse of A.  A non-PD A (too-large lr) is retried at lr/4
    and then skipped (aux['ng_backoff'] = 0/1/2) instead of poisoning the
    state.

    S_inv: optional carried (Q, M, M) = (Lq Lq^T)^{-1} for the CURRENT Lq
    (the trainer threads the returned S_inv_new back in); None recomputes
    it from Lq (cold start / oracle mode).

    retraction="cholesky" (TrainConfig.natgrad_retraction): the
    triangular-group local-coordinate natural gradient (structured NGD in
    the style of Lin, Schmidt & Khan, 2021).  In the local
    parameterization m' = m + L d, L' = L (I + B) with B lower
    triangular, the Gaussian Fisher metric at the current point is
    DIAGONAL (the d-block is L^T S^{-1} L = I; the B-block is 1 on
    off-diagonal entries, 2 on the diagonal), so the natural step is

        H     = L^T dS L  =  L^T dS_ve L + 0.5 (I - L^T L)
        X     = 2 lr Phi(H)              (Phi: tril, diagonal halved)
        L_new = L (I + X),   m_new = m + lr L L^T dm

    — three triangular-aware matmuls and two matvecs: NO factorization,
    NO solve, NO S^{-1} anywhere (the KL's S^{-1} cancels inside the
    congruence; S_inv passes through unchanged/None).  X is DAMPED per
    latent to the trust ball, s_q = min(1, trust / max|X_q|): this keeps
    diag(I + X) in [1 - trust, 1 + trust] (positive by construction, so
    L_new is always a valid Cholesky factor and S_new = L_new L_new^T is
    PSD for ANY lr) and bounds the per-step covariance contraction —
    without it the raw multiplicative step cannot cross the
    orders-of-magnitude covariance shrink a fresh fit needs (measured:
    the undamped linear step flips the diagonal and freezes; DESIGN
    §7i).  Damping rescales, never redirects: the step stays a positive
    multiple of the natural gradient per latent block.  First-order in
    lr (inside the trust ball) this equals the exact retraction;
    conjugate lr=1 CAVI exactness does not hold.
    """
    assert config.whiten, "natural gradients require the whitened parameterization"
    hi = jax.lax.Precision.HIGHEST
    Lq = jnp.tril(params.q_sqrt)
    m = params.q_mu
    Mi = config.num_inducing
    eye = jnp.eye(Mi, dtype=Lq.dtype)
    if Luu is None:
        Luu = elbo_mod.prior_cholesky(params, config)
    if retraction not in ("exact", "cholesky"):
        raise ValueError(f"unknown natgrad retraction {retraction!r}; "
                         "use 'exact' or 'cholesky'")
    if S_inv is None and retraction == "exact":
        # cold start (or oracle/uncached mode): one triangular inverse +
        # one HIGHEST product.  The scan trainer avoids this per step by
        # carrying S_inv in the TrainState: the NGD update itself produces
        # the EXACT next S^{-1} (= A + jitter I) as a byproduct, so steady
        # state pays zero O(M^3) work for it.
        iLq = linalg.rec_tri_inverse(Lq)
        S_inv = linalg.tril_t_matmul(iLq, iLq, precision=hi)  # iLq^T @ iLq

    # Factor-form VE forward (round-4 rework): the old path materialized
    # S = Lq Lq^T and differentiated the dense einsum("qnm,qmk,qnk->qn", P,
    # S, P); the variance term only ever needs diag(P S P^T) = quad_diag(P,
    # Lq) (triangular-aware, half the flops) and the S-gradient is analytic
    # — g_S = P^T diag(c) P with c = dVE/dgamma — so autodiff now touches
    # only the O(N F) mixing + likelihood quadrature, never the O(N M^2)
    # projections.  One concatenated-rows P when the cached inverse is
    # present (same gating as elbo_fn's fuse_task_rows).
    fuse_rows = config.fuse_task_rows and iLuu is not None
    if fuse_rows:
        X_parts = [jnp.concatenate([td.X for td in data], axis=0)]
    else:
        X_parts = [td.X for td in data]
    Ps, kds = [], []
    for X_ in X_parts:
        P_, kd_ = elbo_mod.latent_projection_P(params, config, Luu, X_,
                                               iLuu=iLuu)
        Ps.append(P_)
        kds.append(kd_)
    mean_parts = tuple(jnp.einsum("qnm,qm->qn", P_, m) for P_ in Ps)
    gamma_parts = tuple(
        kd_ + linalg.quad_diag(P_, Lq) - jnp.sum(jnp.square(P_), axis=-1)
        for P_, kd_ in zip(Ps, kds))

    def _task_views(parts):
        if not fuse_rows:
            return list(parts)
        out, off = [], 0
        for td in data:
            sl = slice(off, off + td.X.shape[0])
            off = sl.stop
            out.append(parts[0][:, sl])
        return out

    kd_views = _task_views(kds)

    def ve_fn(mean_parts_, gamma_parts_):
        means = _task_views(mean_parts_)
        gammas = _task_views(gamma_parts_)
        ve_sums = []
        for t, lik in enumerate(config.likelihoods):
            _, Y_t, mask_t = data[t]
            m_F, v_F = elbo_mod._mix_task(means[t], gammas[t], kd_views[t],
                                          params, config, t,
                                          var_floor=1e-12)
            if params.lik_theta is not None and lik.n_theta:
                ve = lik.var_exp(Y_t, m_F, v_F, theta=params.lik_theta[t])
            else:
                ve = lik.var_exp(Y_t, m_F, v_F)
            ve_sums.append(scales[t] * jnp.sum(ve * mask_t))
        return functools.reduce(jnp.add, ve_sums), jnp.stack(ve_sums)

    (ve_total, ve_sums), (g_mean_parts, c_parts) = jax.value_and_grad(
        ve_fn, argnums=(0, 1), has_aux=True)(mean_parts, gamma_parts)
    g_m_ve = functools.reduce(jnp.add, [
        jnp.einsum("qnm,qn->qm", P_, g_)
        for P_, g_ in zip(Ps, g_mean_parts)])
    g_S_ve = functools.reduce(jnp.add, [
        jnp.einsum("qnm,qn,qnk->qmk", P_, c_, P_)
        for P_, c_ in zip(Ps, c_parts)])

    # whitened KL = 0.5 (tr S + |m|^2 - M - logdet S), analytic gradients;
    # tr S = ||Lq||_F^2, no S materialization anywhere
    kl = jnp.sum(0.5 * (jnp.sum(jnp.square(Lq), axis=(-2, -1))
                        + jnp.sum(jnp.square(m), axis=-1)
                        - Mi - linalg.logdet_from_chol(Lq)))
    g_m = g_m_ve - m
    g_S_ve_sym = 0.5 * (g_S_ve + jnp.swapaxes(g_S_ve, -1, -2))

    if retraction == "cholesky":
        # H = L^T dS L with dS = g_S_ve + 0.5 (S^{-1} - I): the S^{-1}
        # term collapses to 0.5 I under the congruence — fold the -0.5 I
        # into the VE part and add 0.5 I after the two matmuls.  HIGH
        # precision: these shape the update DIRECTION (gradient-noise
        # class, like linalg._BWD), not a cancellation-sensitive value.
        hp = jax.lax.Precision.HIGH
        G0 = g_S_ve_sym - 0.5 * eye
        H = linalg.matmul_tril(
            linalg.tril_t_matmul(Lq, G0, precision=hp), Lq, precision=hp)
        H = 0.5 * (H + jnp.swapaxes(H, -1, -2)) + 0.5 * eye
        # m-step in local coordinates: d = lr L^T dm, m_new = m + L d.
        # d lives in the Mahalanobis-normalized chart (its Fisher metric
        # is I), so an RMS cap of `trust` means "move the mean at most
        # `trust` posterior standard deviations per step" — without it
        # the raw step explodes at production gradient scales exactly
        # like the L-step's diagonal did.
        Lt_gm = jnp.einsum("qkm,qk->qm", Lq, g_m)

        def attempt(lr_):
            X = 2.0 * lr_ * linalg._phi(H)
            # per-latent trust damping (see docstring): diag(I + X) stays
            # in [1 - trust, 1 + trust] > 0, so the factor never leaves
            # the Cholesky manifold at any lr
            mx = jnp.max(jnp.abs(X), axis=(-2, -1), keepdims=True)
            X = X * jnp.minimum(1.0, trust / jnp.maximum(mx, 1e-30))
            L_new = Lq + linalg.matmul_tril(Lq, X, precision=hp)
            d = lr_ * Lt_gm
            rms = jnp.sqrt(jnp.mean(jnp.square(d), axis=-1, keepdims=True))
            d = d * jnp.minimum(1.0, trust / jnp.maximum(rms, 1e-30))
            m_new = m + jnp.einsum("qmk,qk->qm", Lq, d)
            return m_new, L_new

        def _ok(out):
            d = jnp.diagonal(out[1], axis1=-2, axis2=-1)
            return (jnp.isfinite(out[0]).all()
                    & jnp.isfinite(out[1]).all() & (d > 0).all())

        kept_vals = (m, Lq)
    else:
        g_S = g_S_ve_sym + 0.5 * (S_inv - eye)
        theta1 = jnp.einsum("qmk,qk->qm", S_inv, m)
        d_eta1 = g_m - 2.0 * jnp.einsum("qmk,qk->qm", g_S, m)
        kept_vals = (m, Lq, S_inv)

        def _ok(out):
            # Finiteness alone is NOT enough for the exact retraction: when
            # A = S^{-1} - 2 lr dS has a tiny positive eigenvalue, the step
            # stays finite but S_new (and m_new = S_new theta1) explode —
            # one such accepted step poisons q, after which every later A is
            # indefinite from the garbage point and the backoff skips
            # forever (a livelock, measured: probe_natgrad_frontier lr=1.0,
            # DESIGN §7n).  The whitened parameterization gives absolute
            # units, so bound the per-step mean movement and the posterior
            # variance (see _NG_STEP_MAX/_NG_SANE_VAR) — generous enough
            # that healthy runs never touch them.
            d2 = jnp.sum(jnp.square(out[1]), axis=-1)  # diag(S_new)
            return (jnp.isfinite(out[0]).all() & jnp.isfinite(out[1]).all()
                    & (jnp.max(jnp.abs(out[0] - m)) < _NG_STEP_MAX)
                    & (jnp.max(d2) < _NG_SANE_VAR))

    def attempt_exact(lr_):
        """One NGD update at step size lr_; NaNs signal an indefinite A."""
        theta1_new = theta1 + lr_ * d_eta1
        # A = -2 theta2_new = S^{-1} - 2 lr dS  (must stay PD)
        A = S_inv - 2.0 * lr_ * g_S
        # Recover L_new with L_new L_new^T = S_new = A^{-1} via ONE
        # factorization: the reversed (UL) Cholesky.  With J the index-
        # reversal, chol(J A J) = L_r gives A = U U^T for the UPPER-
        # triangular U = J L_r J, so A^{-1} = U^{-T} U^{-1} and L_new =
        # U^{-T} = (J L_r^{-1} J)^T is lower-triangular with positive
        # diagonal — i.e. exactly chol(S_new) (uniqueness), without ever
        # forming S_new or running a second Cholesky.  m_new = S_new
        # theta1 becomes two matvecs.
        if config.adaptive_jitter:
            L_r = linalg.jitchol(A[..., ::-1, ::-1])
            iL_r = linalg.rec_tri_inverse(L_r)
            # S_new^{-1} = J (L_r L_r^T) J exactly (includes whatever
            # jitter jitchol escalated to)
            S_inv_n = jnp.matmul(
                L_r, jnp.swapaxes(L_r, -1, -2),
                precision=hi)[..., ::-1, ::-1]
        else:
            # throughput mode: fused blocked factorization + inverse
            # (shared panel inverses).  The fixed config.jitter floor
            # matches prior_cholesky's fixed-jitter branch — dropping it
            # would NaN on marginally indefinite operands at f32 roundoff;
            # the adaptive while_loop branch above is kept for oracle mode
            # (it would serialize the scan pipeline in throughput mode).
            j_eye = config.jitter * eye
            _, iL_r = linalg.blocked_cholesky_inverse(
                A[..., ::-1, ::-1] + j_eye)
            S_inv_n = A + j_eye  # exact: S_new = (A + jitter I)^{-1}
        L_new = jnp.swapaxes(iL_r[..., ::-1, ::-1], -1, -2)
        m_new = jnp.einsum("qmk,qk->qm", L_new,
                           jnp.einsum("qkm,qk->qm", L_new, theta1_new))
        return m_new, L_new, S_inv_n

    if retraction == "exact":
        attempt = attempt_exact

    # lr backoff (round-3 verdict weak #2): a large lr can drive the exact
    # retraction's A indefinite — the reversed Cholesky then surfaces
    # NaNs — or near-indefinite, where the step stays finite but blows up
    # (caught by _ok's whitened-unit bounds, DESIGN §7n).  Retry once at
    # lr/4 (a lax.cond branch: measured ZERO cost on the healthy path,
    # DESIGN §7i), and if even that fails keep the old state — the step
    # degrades to a no-op on q instead of poisoning the run (the GPy
    # analogue is jitchol's escalation, reference util.py:198).
    # The cholesky retraction's trust damping makes
    # backoff structurally unreachable (diag > 0 by construction); the
    # guard stays armed for non-finite gradients.  aux['ng_backoff']:
    # 0 = clean, 1 = lr/4 accepted, 2 = update skipped.
    if _NG_BACKOFF:
        out1 = attempt(lr)
        ok1 = _ok(out1)

        def _accept(_):
            return out1 + (jnp.zeros((), jnp.int32),)

        def _backoff(_):
            out2 = attempt(lr * 0.25)
            ok2 = _ok(out2)
            sel = tuple(jnp.where(ok2, a, b)
                        for a, b in zip(out2, kept_vals))
            return sel + (jnp.where(ok2, jnp.int32(1), jnp.int32(2)),)

        outs = jax.lax.cond(ok1, _accept, _backoff, None)
    else:
        # HETMOGP_NG_BACKOFF=0: measurement-only escape hatch; a bad step
        # then poisons q like the pre-round-4 behavior — pair with
        # skip_nonfinite_steps
        outs = attempt(lr) + (jnp.zeros((), jnp.int32),)
    if retraction == "cholesky":
        m_new, L_new, nb = outs
        S_inv_new = S_inv  # pass-through (None under the trainers)
    else:
        m_new, L_new, S_inv_new, nb = outs
    new_params = params.replace(q_mu=m_new, q_sqrt=L_new)
    aux = {"ve": ve_sums, "kl": kl, "ng_backoff": nb}
    return new_params, ve_total - kl, aux, S_inv_new


def natgrad_update(params: SVMOGPParams, data, scales, config: ModelConfig,
                   lr: float, Luu=None, retraction: str = "exact",
                   trust: float = 0.3) -> SVMOGPParams:
    """One natural-gradient ascent step on the whitened q(u); see
    natgrad_ve_step (this discards the fused ELBO value/aux and the
    carried S^{-1} — standalone/oracle use)."""
    return natgrad_ve_step(params, data, scales, config, lr, Luu=Luu,
                           retraction=retraction, trust=trust)[0]
