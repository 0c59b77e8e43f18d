"""Dense linear-algebra primitives for the sparse variational LMC model.

TPU-native replacements for the GPy/scipy symbols the reference leans on
(SURVEY.md §2b): ``jitchol`` (GPy linalg, used at reference util.py:198),
``flat_to_triang``/``triang_to_flat`` (GPy choleskies, used at reference
svmogp_inf.py:118,176-178), ``dpotrs`` (svmogp_inf.py:214) and ``dtrmm``
(svmogp_inf.py:217).  ``dpotri`` (explicit inverse, util.py:199) has no
equivalent here on purpose — the whitened path never forms an inverse and
the un-whitened path uses Cholesky solves.

Everything is batched over the leading Q axis so XLA can tile the
per-latent-GP Choleskys and triangular solves onto the MXU in one shot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def tril_indices(m: int):
    """Row-major lower-triangle index order: (0,0),(1,0),(1,1),(2,0),...

    Matches GPy ``choleskies._flat_to_triang_pure`` enumeration so packed
    vectors interchange with reference checkpoints.
    """
    return np.tril_indices(m)


def pack_tril(L: jnp.ndarray) -> jnp.ndarray:
    """(..., M, M) lower-triangular -> (..., M(M+1)/2) flat packing."""
    m = L.shape[-1]
    rows, cols = tril_indices(m)
    return L[..., rows, cols]


def unpack_tril(flat: jnp.ndarray, m: int) -> jnp.ndarray:
    """(..., M(M+1)/2) -> (..., M, M) lower-triangular (zeros above diag)."""
    rows, cols = tril_indices(m)
    out = jnp.zeros(flat.shape[:-1] + (m, m), dtype=flat.dtype)
    return out.at[..., rows, cols].set(flat)


def tril_param(L: jnp.ndarray) -> jnp.ndarray:
    """Project a dense square parameter onto its lower triangle.

    Parameters are stored dense (Q, M, M) for XLA-friendly updates; every
    consumer goes through this mask so the strictly-upper entries are inert.
    """
    return jnp.tril(L)


def _chol_ok(L: jnp.ndarray) -> jnp.ndarray:
    """Per-batch success flag for a batched Cholesky (Q, M, M) -> (Q,)."""
    return jnp.isfinite(L).all(axis=(-2, -1))


def jitchol(K: jnp.ndarray, jitter: float = 0.0, adaptive: bool = True,
            maxtries: int = 5) -> jnp.ndarray:
    """Batched Cholesky with escalating jitter on failure.

    Reproduces GPy's ``jitchol`` policy (start at jitter 0, escalate
    mean(diag) * 1e-6 * 10^i up to ``maxtries``) in a jit- and
    grad-compatible form: the per-batch jitter *level* is found under
    ``stop_gradient`` with a bounded ``lax.while_loop`` (whose predicate is
    almost always false after the first try), then a single differentiable
    Cholesky of K + jitter*I is returned, so ``jax.grad`` flows through the
    final factorization only.

    Args:
      K: (..., M, M) SPD matrices (any number of leading batch dims).
      jitter: base jitter added unconditionally (0.0 matches GPy's first try).
      adaptive: if False, a single Cholesky of K + jitter*I is returned.
    """
    m = K.shape[-1]
    eye = jnp.eye(m, dtype=K.dtype)
    K0 = K + jitter * eye if jitter else K
    if not adaptive:
        return jnp.linalg.cholesky(K0)

    def find_jitter(K_sg):
        batch_shape = K_sg.shape[:-2]
        diag_mean = jnp.mean(jnp.diagonal(K_sg, axis1=-2, axis2=-1), axis=-1)
        jit0 = jnp.zeros(batch_shape, K_sg.dtype)

        def cond(state):
            i, jit, L = state
            return jnp.logical_and(i < maxtries, ~_chol_ok(L).all())

        def body(state):
            i, jit, L = state
            jit_i = diag_mean * (1e-6 * (10.0 ** i))
            ok = _chol_ok(L)
            jit_new = jnp.where(ok, jit, jit_i)
            L_try = jnp.linalg.cholesky(K_sg + jit_new[..., None, None] * eye)
            L_new = jnp.where(ok[..., None, None], L, L_try)
            return i + 1.0, jit_new, L_new

        L0 = jnp.linalg.cholesky(K_sg)
        _, jit, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), K_sg.dtype), jit0, L0))
        return jit

    jit = jax.lax.stop_gradient(find_jitter(jax.lax.stop_gradient(K0)))
    return jnp.linalg.cholesky(K0 + jit[..., None, None] * eye)


def solve_tri(L: jnp.ndarray, B: jnp.ndarray, *, trans: bool = False) -> jnp.ndarray:
    """Batched lower-triangular solve: L X = B (or L^T X = B if trans).

    L: (..., M, M) lower-triangular; B: (..., M, N).
    """
    return jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1 if trans else 0)


def cho_solve_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) X = B given lower Cholesky factors; batched.

    Replaces GPy ``dpotrs`` (reference svmogp_inf.py:214).
    """
    return solve_tri(L, solve_tri(L, B), trans=True)


@jax.custom_vjp
def chol_mixed(K: jnp.ndarray) -> jnp.ndarray:
    """Cholesky with float64 forward and working-dtype backward.

    For float32 K: the factor is computed in f64 and downcast — recovering
    the ~half of the significand a f32 factorization loses at
    cond(K) ~ 1e6 — while the backward pass runs the standard Cholesky
    pullback with f32 triangular solves (differentiating through an
    emulated-f64 factorization on TPU costs ~0.7s at (4, 1024, 1024);
    the f32 pullback is ~1000x cheaper).  Requires jax_enable_x64 for the
    f64 forward; falls back to plain Cholesky otherwise.
    """
    if K.dtype == jnp.float64 or not jax.config.jax_enable_x64:
        return jnp.linalg.cholesky(K)
    return jnp.linalg.cholesky(K.astype(jnp.float64)).astype(K.dtype)


def _phi(A):
    """Lower triangle with halved diagonal (Cholesky pullback helper)."""
    return jnp.tril(A) - 0.5 * jnp.triu(jnp.tril(A))  # tril, diag * 0.5


def _chol_mixed_fwd(K):
    L = chol_mixed(K)
    return L, L


def _chol_mixed_bwd(L, gL):
    # standard Cholesky pullback: Kbar = 0.5 (S + S^T),
    # S = L^{-T} Phi(L^T gL) L^{-1}, computed with two triangular solves
    P = _phi(jnp.swapaxes(L, -1, -2) @ gL)
    T1 = solve_tri(L, P, trans=True)  # L^{-T} P
    S = jnp.swapaxes(solve_tri(L, jnp.swapaxes(T1, -1, -2), trans=True),
                     -1, -2)  # T1 L^{-1}
    return (0.5 * (S + jnp.swapaxes(S, -1, -2)),)


chol_mixed.defvjp(_chol_mixed_fwd, _chol_mixed_bwd)


# ---------------------------------------------------------------------------
# cached-inverse adjoints: the VM-step fast path
# ---------------------------------------------------------------------------
#
# During a VEM cycle the trainer caches (Luu, iLuu) for the current hypers;
# the cache is still VALID while the VM gradient is evaluated (it only goes
# stale after the VM update).  These primitives let the VM step reuse it:
# the expensive sequential ops (Cholesky forward+pullback, triangular
# solves: ~19 TFLOP/s and ~1 TFLOP/s on v5e at (4,1024,1024)) are replaced
# by HIGHEST-precision MXU matmuls against the cached factor/inverse, while
# the VJP formulas stay the exact linear algebra — so hyper gradients flow
# correctly through the factorization.  HIGHEST precision is load-bearing
# (see models/elbo.py latent_projections).

_HI = jax.lax.Precision.HIGHEST
# Adjoint (backward) matmuls run at HIGH (bfloat16_3x): these feed ONLY the
# VM-step hyperparameter gradients, where measured TPU error is ~5e-3
# relative (Lbar) / ~3e-5 (Kbar) — far below minibatch gradient noise —
# at half the cost of the 6-pass HIGHEST.  DEFAULT is catastrophic here
# (Lbar relerr ~1.1e0, same bfloat16 operand-rounding failure as the
# forward projection).  On CPU (the f64 parity tests) precision flags are
# no-ops, so the exactness tests stay exact.
_BWD = jax.lax.Precision.HIGH

# VM-step FORWARD solve precision (solve_tri_cached's iL @ B).  HIGHEST by
# default: the solve feeds v_F's kdiag - |P|^2 cancellation exactly like the
# VE projection, where 3-pass HIGH measured 6.3e-3 relative P error.
# HETMOGP_VM_FWD_PRECISION=high is an experimental knob for measuring the
# speed/accuracy trade (see docs/DESIGN.md §8 candidates).
import os as _os

_VM_FWD = (jax.lax.Precision.HIGH
           if _os.environ.get("HETMOGP_VM_FWD_PRECISION", "").lower() == "high"
           else _HI)

# Factorization-internal matmul precision (blocked Cholesky panels/inverse
# assembly, rec_tri_inverse corners).  HIGHEST by default: Luu/iLuu feed
# EVERY projection for the next VEM cycle, so their error multiplies into
# P's.  HETMOGP_CHOL_PRECISION=high is the measurement knob for the
# refresh-cost frontier (docs/DESIGN.md precision experiments).
_CHOL = (jax.lax.Precision.HIGH
         if _os.environ.get("HETMOGP_CHOL_PRECISION", "").lower() == "high"
         else _HI)


@jax.custom_vjp
def chol_cached(K: jnp.ndarray, L: jnp.ndarray, iL: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of K with a precomputed factor and inverse.

    Forward: returns ``L`` (assumed == chol(K) up to roundoff — the caller
    guarantees the cache matches the hypers K was built from).  Backward:
    the standard Cholesky pullback Kbar = 0.5(S + S^T),
    S = L^{-T} Phi(L^T Lbar) L^{-1}, evaluated with two matmuls against the
    cached ``iL`` instead of two triangular solves.  L/iL receive zero
    cotangents (they are lax.stop_gradient-style caches).
    """
    del K, iL
    return L


def _chol_cached_fwd(K, L, iL):
    del K
    return L, (L, iL)


def _chol_cached_bwd(res, gL):
    L, iL = res
    P = _phi(tril_t_matmul(L, gL, precision=_BWD))
    T1 = tril_t_matmul(iL, P, precision=_BWD)  # L^{-T} P
    S = matmul_tril(T1, iL, precision=_BWD)  # L^{-T} P L^{-1}
    Kbar = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    return (Kbar, jnp.zeros_like(L), jnp.zeros_like(iL))


chol_cached.defvjp(_chol_cached_fwd, _chol_cached_bwd)


@jax.custom_vjp
def solve_tri_cached(L: jnp.ndarray, B: jnp.ndarray, iL: jnp.ndarray
                     ) -> jnp.ndarray:
    """y = L^{-1} B via a matmul with the cached inverse ``iL``.

    Forward: iL @ B at HIGHEST precision (matches the triangular solve to
    ~2.3e-4 vs 1.6e-4 relative at bench conditioning).  Backward (exact
    solve adjoints, evaluated with iL matmuls):
      Bbar = L^{-T} ybar,   Lbar = -tril(Bbar y^T).
    iL receives a zero cotangent.
    """
    del L
    return tril_matmul(iL, B, precision=_VM_FWD)


def _solve_tri_cached_fwd(L, B, iL):
    y = tril_matmul(iL, B, precision=_VM_FWD)
    return y, (y, iL)


def _solve_tri_cached_bwd(res, ybar):
    y, iL = res
    Bbar = tril_t_matmul(iL, ybar, precision=_BWD)
    Lbar = -jnp.tril(jnp.matmul(Bbar, jnp.swapaxes(y, -1, -2),
                                precision=_BWD))
    return (Lbar, Bbar, jnp.zeros_like(iL))


solve_tri_cached.defvjp(_solve_tri_cached_fwd, _solve_tri_cached_bwd)


def newton_schulz_inv_sqrt(K: jnp.ndarray, iters: int = 32) -> jnp.ndarray:
    """Matmul-only symmetric inverse square root via coupled Newton-Schulz.

    Returns R with R K R ~= I (R symmetric PSD).  All work is batched
    matmuls — MXU-native, with a matmul-only gradient — unlike Cholesky +
    triangular solves whose forward and backward are sequential on TPU.
    (Direction from "Fast Matrix Square Roots with Applications to Gaussian
    Processes", Pleiss et al., 2020 — matmul-based roots for GP inference.)

    Normalize A = K/c with c = ||K||_F so spec(A) in (0, 1]; the coupled
    iteration Y_{k+1} = Y_k T_k, Z_{k+1} = T_k Z_k with T_k = (3I - Z_k Y_k)/2
    drives Y -> A^{1/2}, Z -> A^{-1/2}; K^{-1/2} = Z / sqrt(c).

    MEASURED LIMITS (see round-1 notes): float64 with moderate conditioning
    converges to ~1e-10 by 32 iterations; float32 at cond(K) ~ 1e8 (RBF
    grams at M=1024) DIVERGES — this primitive is therefore not wired into
    the training path, which keeps the Cholesky pipeline.  Use only for
    well-conditioned matrices or in float64.
    """
    m = K.shape[-1]
    eye = jnp.eye(m, dtype=K.dtype)
    c = jnp.sqrt(jnp.sum(jnp.square(K), axis=(-2, -1), keepdims=True))
    A = K / c
    Y = A
    Z = jnp.broadcast_to(eye, K.shape)
    for _ in range(iters):
        T = 0.5 * (3.0 * eye - Z @ Y)
        Y = Y @ T
        Z = T @ Z
    R = 0.5 * (Z + jnp.swapaxes(Z, -1, -2))
    return R / jnp.sqrt(c)


def logdet_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    """log|A| from A = L L^T; batched over leading dims -> (...,).

    The diagonal comes from an eye-masked row reduce, NOT jnp.diagonal:
    diagonal lowers to a strided gather whose reverse-mode transpose is a
    scatter-add into a zero (..., M, M) cotangent, and on TPU that pair
    costs five full-tensor relayout copies per step in the trainer's KL
    (~16.8 MB each at bench shapes — the largest single HBM-traffic item
    the per-step copy audit found, hlo_cost.scan_body_copy_bytes).  The
    masked reduce streams L once — fusing with the KL's trace reduce over
    the same operand — and its backward is an eye-masked broadcast of the
    (..., M) cotangent that fuses into the existing L-cotangent
    accumulation.  No gather, no scatter, no relayout.
    """
    m = L.shape[-1]
    eye = jnp.eye(m, dtype=bool)
    d = jnp.sum(jnp.where(eye, L, jnp.zeros((), L.dtype)), axis=-1)
    return 2.0 * jnp.sum(jnp.log(jnp.abs(d)), axis=-1)


@jax.custom_jvp
def _quad_diag(A: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    AL = matmul_tril(A, L)
    return jnp.sum(jnp.square(AL), axis=-1)


@_quad_diag.defjvp
def _quad_diag_jvp(primals, tangents):
    # The L-tangent enters via a DENSE masked matmul: autodiff of the
    # blocked forward would assemble the (M, M) L-cotangent from
    # variable-width per-block adjoints (concat + {1,2,0}->{2,1,0}
    # relayout copies, measured ~0.1 ms/step at bench shapes in the
    # profiler trace), while transposing A @ tril(dL) emits it as ONE
    # dense matmul + mask.  tril(dL) keeps the derivative exactly equal
    # to the value function's (zero w.r.t. the ignored strictly-upper
    # entries).  custom_jvp (not custom_vjp) so forward-mode autodiff
    # through the prediction paths keeps working; reverse mode arrives by
    # transposition of this linear tangent map, and the A-cotangent path
    # (transpose of matmul_tril(dA, L)) is dropped by XLA when unused —
    # e.g. VE steps, where A is constant.
    A, L = primals
    dA, dL = tangents
    AL = matmul_tril(A, L)
    out = jnp.sum(jnp.square(AL), axis=-1)
    dAL = matmul_tril(dA, L) + jnp.matmul(A, jnp.tril(dL))
    dout = 2.0 * jnp.sum(AL * dAL, axis=-1)
    return out, dout


@jax.jit
def quad_diag(A: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """diag(A S A^T) with S = L L^T, batched: (..., N, M),( ..., M, M) -> (..., N).

    The reference materializes the full N x N matrix S_fd
    (svmogp_inf.py:209,219) although training only ever consumes its
    diagonal; here only the diagonal is formed.  L must be LOWER
    triangular (every caller passes a jnp.tril'd factor): the matmul
    skips its structurally-zero blocks, and the strictly-upper entries
    have exactly zero derivative (see _quad_diag_jvp).

    jitted: the blocked forward is an eager slice+concat chain otherwise,
    which can hit backend InvalidArgument over a remote TPU tunnel (same
    issue as _tri_inverse; train.py docstrings).
    """
    return _quad_diag(A, L)


# ---------------------------------------------------------------------------
# blocked factorizations: the O(M^3) work as MXU matmuls
# ---------------------------------------------------------------------------
#
# XLA's native (batched) Cholesky runs serial panel factorizations at
# ~1 TFLOP/s on TPU v5e — the one hot op far off roofline (docs/DESIGN.md
# §7b).  The blocked forms below keep only (nb, nb) diagonal factorizations
# on the slow path and push the remaining O(M^3) FLOPs through
# HIGHEST-precision f32 matmuls (~25 TFLOP/s).  Measured at the bench shape
# (4, 1024, 1024): chol+inverse pair 1.96 -> 0.95 ms with residuals
# ||L L^T - K|| and ||L inv(L) - I|| identical to the stock kernels.
# Used by the trainer's VE-cache refresh and the natural-gradient update;
# fully differentiable (composed of differentiable primitives) but the
# custom-VJP cached adjoints remain the intended gradient path.

def _blocked_cholesky_panels(A: jnp.ndarray, nb: int):
    """Left-looking blocked factorization of one (m, m) SPD matrix.

    Returns (L, iLkks): the full factor and the list of inverted (nb, nb)
    diagonal panels (a byproduct of the below-panel update) — shared by
    ``blocked_cholesky`` and ``blocked_cholesky_inverse`` so the two
    never diverge.  Block columns accumulate in separate arrays (one
    concatenate at the end): repeated in-place updates of the full (m, m)
    buffer were measured ~50% slower on TPU.
    """
    m = A.shape[-1]
    dt = A.dtype
    Lleft = None
    cols = []
    iLkks = []
    for j in range(m // nb):
        r0 = j * nb
        Aj = A[r0:, r0:r0 + nb]
        if Lleft is not None:
            acc = Aj - jnp.matmul(Lleft[r0:, :], Lleft[r0:r0 + nb, :].T,
                                  precision=_CHOL)
        else:
            acc = Aj
        Lkk = jnp.linalg.cholesky(acc[:nb])
        iLkk = jax.scipy.linalg.solve_triangular(
            Lkk, jnp.eye(nb, dtype=dt), lower=True)
        below = jnp.matmul(acc[nb:], iLkk.T, precision=_CHOL)
        colj = jnp.concatenate(
            [jnp.zeros((r0, nb), dt), Lkk, below], axis=0)
        cols.append(colj)
        iLkks.append(iLkk)
        Lleft = colj if Lleft is None else jnp.concatenate(
            [Lleft, colj], axis=1)
    return jnp.concatenate(cols, axis=1), iLkks


def _blocked_cholesky_inverse_single(A: jnp.ndarray, nb: int):
    """(L, inv(L)) of one (m, m) SPD matrix, sharing the panel inverses.

    The left-looking factorization already inverts every (nb, nb) diagonal
    block (for the below-panel update); the triangular inverse is then
    assembled from those SAME inverses by a blocked forward substitution —
    row strip i: iL[i, :i] = -iLkk_i (L[i, :i] @ iL[:i, :i]) — so the
    separate InvertDiagBlocksLowerTriangular custom call (and its leaf
    solves) that ``rec_tri_inverse`` pays never runs.  All off-diagonal
    work is HIGHEST-precision MXU matmuls.
    """
    dt = A.dtype
    L, iLkks = _blocked_cholesky_panels(A, nb)
    # inverse assembly: iL_top is the growing (i*nb, i*nb) top-left block
    iL_top = iLkks[0]
    for i in range(1, A.shape[-1] // nb):
        r0 = i * nb
        strip = -jnp.matmul(
            iLkks[i], jnp.matmul(L[r0:r0 + nb, :r0], iL_top, precision=_CHOL),
            precision=_CHOL)  # (nb, r0)
        top = jnp.concatenate(
            [iL_top, jnp.zeros((r0, nb), dt)], axis=1)
        bot = jnp.concatenate([strip, iLkks[i]], axis=1)
        iL_top = jnp.concatenate([top, bot], axis=0)
    return L, iL_top


def _auto_nb(m: int) -> int:
    """Panel width for the blocked factorizations, by matrix size.

    Measured on one v5e chip (tools/probe_m4096_breakdown.py, round 5,
    serialized-dependency chains): at M=4096 nb=512 beats the old fixed
    nb=128 by ~8 ms per (4, M, M) chol+inverse pair (~23%) — fewer, larger
    panels keep the below-panel updates MXU-shaped; at M<=1024 the
    M=1024-tuned nb=128 stands (docs/DESIGN.md §7).  M=2048 sits between
    (nb=256 ~3% over nb=128, within run noise) — rounded up since the
    panel count halves.  HETMOGP_REFRESH_NB overrides for A/B probes.
    """
    env = _os.environ.get("HETMOGP_REFRESH_NB", "")
    if env:
        return int(env)
    if m >= 4096:
        return 512
    if m >= 2048:
        return 256
    return 128


def blocked_cholesky_inverse(K: jnp.ndarray, nb: Optional[int] = None):
    """(chol(K), inv(chol(K))) for (..., M, M) SPD K, fused and blocked.

    The trainer's VE-cache refresh needs both; computing them together
    reuses the factorization's panel inverses (see the single-matrix
    helper).  Falls back to the separate stock kernels when M is too
    small or not divisible by nb.  Failure surfaces as NaNs (like the
    fixed-jitter jitchol path), not an exception.

    nb: panel width; None (default) picks the measured per-M frontier
    (``_auto_nb``).
    """
    m = K.shape[-1]
    if nb is None:
        nb = _auto_nb(m)
    if m % nb or m <= nb:
        L = jnp.linalg.cholesky(K)
        eye = jnp.eye(m, dtype=K.dtype)
        iL = jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(eye, L.shape), lower=True)
        return L, iL
    f = _blocked_cholesky_inverse_single
    for _ in range(K.ndim - 2):
        f = jax.vmap(f, in_axes=(0, None))
    return f(K, nb)


def blocked_cholesky(K: jnp.ndarray, nb: Optional[int] = None) -> jnp.ndarray:
    """Cholesky of (..., M, M) SPD matrices, blocked onto the MXU.

    Falls back to ``jnp.linalg.cholesky`` when M is not divisible by nb or
    too small for blocking to pay.  Like the stock kernel (and the fixed-
    jitter jitchol path), failure surfaces as NaNs, not an exception.

    nb: panel width; None (default) picks the measured per-M frontier
    (``_auto_nb``).
    """
    m = K.shape[-1]
    if nb is None:
        nb = _auto_nb(m)
    if m % nb or m <= nb:
        return jnp.linalg.cholesky(K)
    def f(A, nb):
        return _blocked_cholesky_panels(A, nb)[0]

    for _ in range(K.ndim - 2):
        f = jax.vmap(f, in_axes=(0, None))
    return f(K, nb)



# ---------------------------------------------------------------------------
# triangular-structure-aware matmuls
# ---------------------------------------------------------------------------
#
# The VE fast path's dominant op is P = Kfu @ iLuu^T at HIGHEST precision
# (models/elbo.py latent_projections) where iLuu is LOWER triangular: with
# 128-lane MXU tiles at M=1024, 28 of 64 operand blocks are structural
# zeros the dense einsum still pays 6 bf16 passes for.  These helpers skip
# the zero blocks at the XLA level (block-column matmuls + one concat);
# measured on one v5e chip at bench shapes (Q=4, N=3072, M=1024, nb=256):
# dense HIGHEST 0.849 ms -> blocked 0.559 ms per application (1.52x), with
# bit-identical results on exactly-triangular operands.  Falls back to the
# dense matmul whenever M is too small or not divisible by the block size,
# so callers can use them unconditionally.

_TRI_NB = 256


def matmul_tril_t(A: jnp.ndarray, L: jnp.ndarray, precision=None,
                  nb: int = _TRI_NB) -> jnp.ndarray:
    """A @ L^T for lower-triangular L, skipping zero blocks.

    A: (..., N, M), L: (..., M, M) lower-triangular -> (..., N, M).
    out[..., n, k] = sum_{m <= k} A[..., n, m] L[..., k, m].
    """
    m = L.shape[-1]
    if m % nb or m <= nb:
        return jnp.einsum("...nm,...km->...nk", A, L, precision=precision)
    cols = []
    for j in range(m // nb):
        hi = (j + 1) * nb
        cols.append(jnp.einsum("...nm,...km->...nk", A[..., :hi],
                               L[..., j * nb:hi, :hi], precision=precision))
    return jnp.concatenate(cols, axis=-1)


def matmul_tril(A: jnp.ndarray, L: jnp.ndarray, precision=None,
                nb: int = _TRI_NB) -> jnp.ndarray:
    """A @ L for lower-triangular L, skipping zero blocks.

    out[..., n, k] = sum_{m >= k} A[..., n, m] L[..., m, k].
    """
    m = L.shape[-1]
    if m % nb or m <= nb:
        return jnp.matmul(A, L, precision=precision)
    cols = []
    for j in range(m // nb):
        lo = j * nb
        cols.append(jnp.matmul(A[..., lo:], L[..., lo:, lo:lo + nb],
                               precision=precision))
    return jnp.concatenate(cols, axis=-1)


def tril_matmul(L: jnp.ndarray, B: jnp.ndarray, precision=None,
                nb: int = _TRI_NB) -> jnp.ndarray:
    """L @ B for lower-triangular L, skipping zero blocks.

    out[..., i, :] rows in tile j use only B rows m <= (j+1) nb.
    """
    m = L.shape[-2]
    if m % nb or m <= nb:
        return jnp.matmul(L, B, precision=precision)
    rows = []
    for i in range(m // nb):
        hi = (i + 1) * nb
        rows.append(jnp.matmul(L[..., i * nb:hi, :hi], B[..., :hi, :],
                               precision=precision))
    return jnp.concatenate(rows, axis=-2)


def tril_t_matmul(L: jnp.ndarray, B: jnp.ndarray, precision=None,
                  nb: int = _TRI_NB) -> jnp.ndarray:
    """L^T @ B for lower-triangular L, skipping zero blocks.

    out[..., k, :] rows in tile j use only B rows m >= j nb.
    """
    m = L.shape[-1]
    if m % nb or m <= nb:
        return jnp.einsum("...mk,...mn->...kn", L, B, precision=precision)
    rows = []
    for j in range(m // nb):
        lo = j * nb
        rows.append(jnp.einsum("...mk,...mn->...kn",
                               L[..., lo:, lo:lo + nb], B[..., lo:, :],
                               precision=precision))
    return jnp.concatenate(rows, axis=-2)


def rec_tri_inverse(L: jnp.ndarray, leaf: int = 128) -> jnp.ndarray:
    """inv(L) for lower-triangular (..., m, m) L, recursive blocking.

    inv([[A, 0], [B, C]]) = [[iA, 0], [-iC B iA, iC]]; the two half-size
    inverses are independent, so each recursion level stacks them into the
    batch axis — one batched solve at the leaves, then log2(m/leaf) levels
    of batched matmuls.
    """
    m = L.shape[-1]
    if m <= leaf or m % 2:
        eye = jnp.eye(m, dtype=L.dtype)
        return jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(eye, L.shape), lower=True)
    h = m // 2
    A, C, B = L[..., :h, :h], L[..., h:, h:], L[..., h:, :h]
    inv = rec_tri_inverse(jnp.stack([A, C], axis=0), leaf=leaf)
    iA, iC = inv[0], inv[1]
    corner = -jnp.matmul(iC, jnp.matmul(B, iA, precision=_CHOL), precision=_CHOL)
    top = jnp.concatenate([iA, jnp.zeros_like(B).swapaxes(-1, -2)], axis=-1)
    bot = jnp.concatenate([corner, iC], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def t_matmul_tril_out(A: jnp.ndarray, B: jnp.ndarray, precision=None,
                      nb: int = _TRI_NB) -> jnp.ndarray:
    """tril(A^T @ B), computing ONLY the lower-triangular blocks.

    A, B: (..., N, M) -> (..., M, M) with out[m1, m2] = sum_n A[n, m1]
    B[n, m2] for m1 >= m2 and exact zeros above the diagonal.  Halves the
    flops of the dense product + mask when the consumer is a triangular
    cotangent (quad_diag_train's L-gradient).
    """
    m = A.shape[-1]
    if m % nb or m <= nb:
        return jnp.tril(jnp.einsum("...nm,...nk->...mk", A, B,
                                   precision=precision))
    cols = []
    for j in range(m // nb):
        lo = j * nb
        blk = jnp.einsum("...nm,...nk->...mk", A[..., lo:],
                         B[..., lo:lo + nb], precision=precision)
        pad = jnp.zeros(blk.shape[:-2] + (lo, nb), blk.dtype)
        cols.append(jnp.concatenate([pad, blk], axis=-2))
    return jnp.tril(jnp.concatenate(cols, axis=-1))


@jax.custom_vjp
def quad_diag_train(A: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """quad_diag with a structure-aware REVERSE-mode gradient.

    Same values as ``quad_diag`` (identical forward ops).  The difference
    is the backward: transposing quad_diag's custom JVP emits the
    L-cotangent as a DENSE (..., M, N) @ (..., N, M) matmul masked after
    (and the A-cotangent as a dense transpose chain), while this custom
    VJP computes gL = tril(A^T dAL) via ``t_matmul_tril_out`` and
    gA = dAL @ L^T via ``matmul_tril_t`` — both skip the structurally-zero
    half.  Reverse-mode ONLY (custom_vjp).

    MEASURED NEGATIVE on TPU v5e at bench shapes (round 4): ~2% SLOWER
    end-to-end than the dense backward despite half the flops — one big
    dense 1-pass matmul at ~0.7 physical MFU beats four block einsums +
    zero-pads + concats (see models/elbo.py _QUAD_VJP).  Kept as the
    re-measurement hook for hardware where the trade flips.
    """
    return jnp.sum(jnp.square(matmul_tril(A, L)), axis=-1)


def _quad_diag_train_fwd(A, L):
    AL = matmul_tril(A, L)
    return jnp.sum(jnp.square(AL), axis=-1), (A, L, AL)


def _quad_diag_train_bwd(res, c):
    A, L, AL = res
    dAL = 2.0 * c[..., None] * AL
    gA = matmul_tril_t(dAL, L)
    gL = t_matmul_tril_out(A, dAL)
    return gA, gL


quad_diag_train.defvjp(_quad_diag_train_fwd, _quad_diag_train_bwd)
