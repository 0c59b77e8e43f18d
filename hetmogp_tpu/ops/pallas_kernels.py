"""Fused Pallas TPU kernels for covariance-block construction.

The hot op in this model family is building Q RBF cross-covariance blocks
K_q = var_q * exp(-0.5 * ||(x - z)/ls_q||^2) of shape (N, M) and feeding
them straight into triangular solves/matmuls (SURVEY.md §7 step 7).  XLA
already fuses the exp epilogue into one HBM pass for moderate sizes; this
hand kernel exists for the large-N regime where controlling the tile walk
(the (TN, TM) block stays resident in VMEM across distance accumulation,
exp, and scale) beats the default schedule, and as the substrate for later
fusions (e.g. K -> solve epilogues).

Differentiation: ``rbf_K_batched`` carries a custom VJP.  The backward pass
is expressed as XLA einsums over the recomputed forward values — the
cotangent contractions are matmul-shaped and already MXU-optimal, so only
the forward needs Pallas.

Layout notes (pallas_guide.md):
* tiles are (TN, TM) = (256, 256) float32 — multiples of the (8, 128) tile;
* the Dx feature axis is tiny (1-8 for GP inputs), so distances accumulate
  as an unrolled loop of rank-1 broadcast differences on the VPU rather
  than an (N, Dx) x (Dx, M) matmul (cancellation-free, no MXU underfill);
* per-latent inverse lengthscales / variances ride in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_M = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rbf_block_kernel(x_ref, z_ref, ils_ref, var_ref, out_ref, *, dx: int):
    """One (1, TILE_N, TILE_M) output block.

    x_ref: (TILE_N, dx) VMEM; z_ref: (1, TILE_M, dx) VMEM;
    ils_ref: (Q, dx) SMEM (full table, row-indexed by the q grid axis);
    var_ref: (Q, 1) SMEM.
    """
    q = pl.program_id(0)
    acc = jnp.zeros((x_ref.shape[0], z_ref.shape[1]), jnp.float32)
    for d in range(dx):
        il = ils_ref[q, d]
        diff = (x_ref[:, d][:, None] - z_ref[0, :, d][None, :]) * il
        acc += diff * diff
    out_ref[0, :, :] = var_ref[q, 0] * jnp.exp(-0.5 * acc)


def _rbf_forward_impl(X, Z, ils, var, *, interpret: bool = False):
    """Padded pallas_call: (N, Dx), (Q, M, Dx), (Q, Dx), (Q,) -> (Q, N, M)."""
    N, Dx = X.shape
    Q, M, _ = Z.shape
    Np, Mp = _round_up(N, TILE_N), _round_up(M, TILE_M)
    Xp = jnp.pad(X, ((0, Np - N), (0, 0)))
    Zp = jnp.pad(Z, ((0, 0), (0, Mp - M), (0, 0)))
    grid = (Q, Np // TILE_N, Mp // TILE_M)
    kernel = functools.partial(_rbf_block_kernel, dx=Dx)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Q, Np, Mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, Dx), lambda q, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, Dx), lambda q, i, j: (q, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, Dx), lambda q, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q, 1), lambda q, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N, TILE_M),
                               lambda q, i, j: (q, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Xp.astype(jnp.float32), Zp.astype(jnp.float32),
      ils.astype(jnp.float32), var[:, None].astype(jnp.float32))
    return out[:, :N, :M]


@jax.custom_vjp
def rbf_K_batched(X, Z, lengthscale, variance):
    """Fused batched RBF cross-covariance: (Q, N, M), float32.

    Semantics match ops.kernels.K_batched("rbf", ...); lengthscale may be
    (Q, Dx) or isotropic (Q, 1).
    """
    Dx = X.shape[-1]
    ils = 1.0 / jnp.broadcast_to(lengthscale, (Z.shape[0], Dx))
    return _rbf_forward_impl(X, Z, ils, variance)


def _rbf_fwd(X, Z, lengthscale, variance):
    K = rbf_K_batched(X, Z, lengthscale, variance)
    return K, (X, Z, lengthscale, variance, K)


def _rbf_bwd(res, g):
    """Cotangents via XLA einsums (matmul-shaped, MXU-optimal).

    With S = g * K:
      dK/dvar    = K / var                       -> dvar = sum(S)/var
      dr2 cotangent R = -0.5 S and r2 = sum_d il_d^2 (x - z)^2, giving
      dX[n,d] = -sum_q il_qd^2 (x_nd rowsum(S)_qn - (S_q Z_q)_nd)
      dZ[q,m,d] = il_qd^2 ((S_q^T X)_md - colsum(S)_qm z_qmd)
      dls[q,d] = ls^-3 sum_nm S (x - z)^2
    """
    X, Z, ls, var, K = res
    Q, _, _ = Z.shape
    Dx = X.shape[-1]
    S = g * K  # (Q, N, M)
    ls_full = jnp.broadcast_to(ls, (Q, Dx))
    il2 = 1.0 / jnp.square(ls_full)

    dvar = jnp.sum(S, axis=(1, 2)) / var

    rowsum = jnp.sum(S, axis=2)  # (Q, N)
    colsum = jnp.sum(S, axis=1)  # (Q, M)
    SZ = jnp.einsum("qnm,qmd->qnd", S, Z)
    SX = jnp.einsum("qnm,nd->qmd", S, X)

    diff_sum = rowsum[..., None] * X[None, :, :] - SZ  # (Q, N, Dx)
    dX = -jnp.einsum("qnd,qd->nd", diff_sum, il2)
    dZ = (SX - colsum[..., None] * Z) * il2[:, None, :]

    X2S = jnp.einsum("qn,nd->qd", rowsum, jnp.square(X))
    Z2S = jnp.einsum("qm,qmd->qd", colsum, jnp.square(Z))
    XZS = jnp.einsum("qnd,nd->qd", SZ, X)
    E = X2S + Z2S - 2.0 * XZS  # sum_nm S (x - z)^2 per (q, d)
    dls_full = E / (ls_full ** 3)
    if ls.shape != dls_full.shape:  # isotropic: reduce the broadcast axis
        dls = jnp.sum(dls_full, axis=-1, keepdims=True)
        dls = jnp.broadcast_to(dls, ls.shape) if dls.shape != ls.shape else dls
    else:
        dls = dls_full
    return dX, dZ, dls, dvar


rbf_K_batched.defvjp(_rbf_fwd, _rbf_bwd)


def rbf_K_batched_interpret(X, Z, lengthscale, variance):
    """Interpreter-mode run of the forward (CPU correctness tests)."""
    Dx = X.shape[-1]
    ils = 1.0 / jnp.broadcast_to(lengthscale, (Z.shape[0], Dx))
    return _rbf_forward_impl(X, Z, ils, variance, interpret=True)
