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

_MIN_ELEMS = 1 << 22  # ~4M elements per (N, M) block before Pallas pays off


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
    n, m = X.shape[0], Z.shape[1]
    big = n * m >= _MIN_ELEMS
    return forced or big


def rbf_K_batched_pallas(X, Z, lengthscale, variance):
    from hetmogp_tpu.ops import pallas_kernels

    return pallas_kernels.rbf_K_batched(X, Z, lengthscale, variance)
