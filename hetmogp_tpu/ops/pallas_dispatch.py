"""Dispatch between XLA and hand-written Pallas kernels.

Pallas kernels pay off when the fused distance+exp epilogue would otherwise
round-trip a large N x M block through HBM; for the small/medium blocks of
most workloads XLA's own fusion is already at the roofline.  The default
policy is therefore conservative and the Pallas path is opt-in via
``use_pallas=True`` or the ``HETMOGP_USE_PALLAS`` env var.
"""

from __future__ import annotations

import os

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
        return False
    if str(X.dtype) != "float32":  # the fused kernel is f32-only
        return False
    n, m = X.shape[0], Z.shape[1]
    big = n * m >= _MIN_ELEMS
    return forced or big


def rbf_K_batched_pallas(X, Z, lengthscale, variance):
    from hetmogp_tpu.ops import pallas_kernels

    return pallas_kernels.rbf_K_batched(X, Z, lengthscale, variance)
