"""Tracing / profiling / numerical-debug hooks (SURVEY.md §5).

The reference has no observability beyond printed ELBOs and two ad-hoc
numerical checks (the Cholesky-instability ValueError at svmogp_inf.py:126
and the 'v negative!' print at svmogp_inf.py:221).  Equivalents here:

* ``trace(logdir)`` — capture an XLA profile viewable in TensorBoard/XProf.
* ``annotate(name)`` — name a region so it shows up in traces.
* ``debug_nans(True)`` — jax_debug_nans mode: any NaN produced under jit
  raises at the producing op (replaces the reference's print-and-continue).
* ``assert_finite(tree, name)`` — host-side check of a pytree (params,
  grads) with a precise error naming the offending leaf.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything in the block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for traces: ``with annotate('ve_step'): ...``."""
    return jax.profiler.TraceAnnotation(name)


def debug_nans(enable: bool = True):
    """Raise at the first NaN produced inside jitted code."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree: Any, name: str = "pytree"):
    """Host-side finiteness check with leaf-level error messages."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} "
                f"non-finite values (dtype={arr.dtype}, shape={arr.shape})")
