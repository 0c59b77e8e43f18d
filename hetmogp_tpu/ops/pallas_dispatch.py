"""Dispatch between XLA and hand-written Pallas kernels.

Pallas kernels pay off when the fused distance+exp epilogue would otherwise
round-trip a large N x M block through HBM; for the small/medium blocks of
most workloads XLA's own fusion is already at the roofline.  Policy:

* the Pallas path AUTO-ENABLES on TPU/f32 blocks of N*M >= 2^26 elements
  (where it measures 1.75x over XLA — large-N prediction shapes);
* ``use_pallas=True`` or ``HETMOGP_USE_PALLAS=1`` forces it for smaller
  blocks; if the request cannot be honored (not on TPU, or non-f32 inputs)
  a warning is emitted and the XLA path runs;
* ``use_pallas=False`` or ``HETMOGP_USE_PALLAS=0`` disables it everywhere.
"""

from __future__ import annotations

import os
import warnings

import jax

# Measured on TPU v5e (f32, Q=4, M=1024): parity at N*M ~ 33M, 1.75x faster
# than XLA at N*M ~ 134M (291 vs 166 GB/s end-to-end).  Auto-enable above:
_MIN_ELEMS = 1 << 26  # ~67M elements per (N, M) block


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def should_use_pallas(use_pallas, X, Z) -> bool:
    if use_pallas is False:
        return False
    env = os.environ.get("HETMOGP_USE_PALLAS", "").lower()
    if env in ("0", "false", "off"):
        return False
    forced = use_pallas is True or env in ("1", "true", "on")
    if not _on_tpu():
        if forced:
            warnings.warn("use_pallas requested but backend is not TPU; "
                          "running the XLA kernel instead", stacklevel=3)
        return False
    if str(X.dtype) != "float32":  # the fused kernel is f32-only
        if forced:
            warnings.warn(f"use_pallas requested but dtype is {X.dtype} "
                          "(f32-only kernel); running the XLA kernel instead",
                          stacklevel=3)
        return False
    n, m = X.shape[0], Z.shape[1]
    big = n * m >= _MIN_ELEMS
    return forced or big


def rbf_K_batched_pallas(X, Z, lengthscale, variance):
    from hetmogp_tpu.ops import pallas_kernels

    return pallas_kernels.rbf_K_batched(X, Z, lengthscale, variance)
