"""Data- and model-parallel execution over a TPU mesh.

The reference has zero inter-process code (SURVEY.md §2c); minibatch
subsampling with ELBO rescaling (svmogp.py:89-90) is its only N-scaling
mechanism.  Here the same ELBO becomes SPMD over two mesh axes:

* ``data`` — each task's minibatch is sharded along its N axis; XLA
  inserts the psum for the VE sums and their gradients during ``jax.jit``
  partitioning.
* ``latent`` (optional, 2-D mesh) — the model-parallel axis for this model
  class (SURVEY.md §2c "optional Q-sharding of latent functions"): every
  Q-leading array (q_mu, q_sqrt, Z, per-latent kernel hypers, W, kappa, and
  the cached Luu/iLuu) is sharded over latent GPs, so the per-q batched
  Cholesky/solves/grams run on different chips and the mixing contraction
  ``sum_q w_qd (...)`` becomes an ICI psum.  No hand-written collectives
  anywhere — placement + jit propagation emit them.

Per-task batch sizes must be divisible by the data-axis size; the
MinibatchStream's ``pad_multiple`` handles ragged tails with masked rows.
Q (times the coregionalization rank) must be divisible by the latent-axis
size.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.models.elbo import TaskData
from hetmogp_tpu.models.params import SVMOGPParams


def force_virtual_cpu(n_devices: int) -> list:
    """Force an n-device virtual CPU platform and return those devices.

    Never inherits an ambient accelerator platform pin (e.g. a TPU tunnel
    whose libtpu may be version-skewed): sets JAX_PLATFORMS=cpu +
    --xla_force_host_platform_device_count and, if no backend has been
    initialized yet, the config-level overrides too.  MUST run before
    anything initializes a jax backend (importing jax is fine; querying
    devices is not).  Raises RuntimeError if a backend was already
    initialized with fewer CPU devices.  Used by the multi-chip dryrun,
    ``bench.py --mesh``, and the model-parallel example.
    """
    import os
    import sys

    import re

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    # rewrite (not skip) a pre-existing count: a stale smaller value would
    # otherwise win and surface as a misleading "backend already
    # initialized" error below
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    bridge = sys.modules.get("jax._src.xla_bridge")
    if bridge is None or not getattr(bridge, "_backends", None):
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass  # older jax: XLA_FLAGS above covers it
    cpus = jax.devices("cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"needed {n_devices} virtual CPU devices, got {len(cpus)}; "
            "a jax backend was initialized before force_virtual_cpu ran")
    return cpus[:n_devices]


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("data",))


def model_mesh(devices: Optional[Sequence] = None, latent: int = 1) -> Mesh:
    """2-D ``('data', 'latent')`` mesh: n_devices/latent x latent."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n % latent:
        raise ValueError(f"{n} devices not divisible by latent={latent}")
    return Mesh(devices.reshape(n // latent, latent),
                axis_names=("data", "latent"))


def has_latent_axis(mesh: Mesh) -> bool:
    return "latent" in mesh.axis_names and mesh.shape["latent"] > 1


def _latent_spec(mesh: Mesh, leaf) -> NamedSharding:
    return NamedSharding(mesh, P("latent", *([None] * (np.ndim(leaf) - 1))))


def param_shardings(mesh: Mesh, params: SVMOGPParams):
    """Latent-axis shardings for the (Q-leading) parameter leaves.

    With coregionalization rank R > 1 the kernel hypers have Q rows while
    the latent copies (Z, q_mu, q_sqrt, W, kappa) have Q*R — leaves whose
    first dim the latent axis does not divide are replicated instead.
    """
    k = mesh.shape["latent"]

    def spec(leaf):
        if np.ndim(leaf) >= 1 and np.shape(leaf)[0] % k == 0:
            return _latent_spec(mesh, leaf)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def state_shardings(mesh: Mesh, state) -> Any:
    """Shardings for a ``train.TrainState`` over a 2-D model mesh.

    params and the params-shaped optimizer moments shard over 'latent';
    the cached Luu/iLuu (Q-leading) likewise; everything else replicates.
    On a 1-D data mesh this returns fully-replicated specs.
    """
    rep = NamedSharding(mesh, P())
    if not has_latent_axis(mesh):
        return jax.tree_util.tree_map(lambda _: rep, state)
    n_latent = int(np.shape(state.params.q_mu)[0])
    k = mesh.shape["latent"]

    def spec(node):
        if isinstance(node, SVMOGPParams):
            return param_shardings(mesh, node)
        # same divisibility guard as param_shardings: a latent-axis size
        # that does not divide the leading dim falls back to replication
        # instead of failing at device_put/jit
        if (np.ndim(node) >= 1 and np.shape(node)[0] == n_latent
                and n_latent % k == 0):
            return _latent_spec(mesh, node)
        return rep

    return jax.tree_util.tree_map(
        spec, state, is_leaf=lambda x: isinstance(x, SVMOGPParams))


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh (latent-sharded where applicable)."""
    return jax.tree_util.tree_map(jax.device_put, state,
                                  state_shardings(mesh, state))


def batch_shardings(mesh: Mesh, num_tasks: int):
    """Per-task TaskData shardings: rows split over the data axis."""
    xspec = NamedSharding(mesh, P("data", None))
    mspec = NamedSharding(mesh, P("data"))
    return tuple(TaskData(X=xspec, Y=xspec, mask=mspec)
                 for _ in range(num_tasks))


def shard_batch(mesh: Mesh, data: tuple) -> tuple:
    """Place each TaskData with X/Y/mask sharded on axis 0."""
    shardings = batch_shardings(mesh, len(data))
    return tuple(jax.device_put(td, sh) for td, sh in zip(data, shardings))


def make_sharded_svi_step(config: ModelConfig, train_config: TrainConfig,
                          mesh: Mesh, vem: bool = True):
    """The SVI train step jitted with explicit shardings over the mesh.

    Same body as ``train.make_svi_step`` — batches sharded on N, scales
    replicated.  On a 1-D data mesh the state is replicated; on a 2-D
    ``('data','latent')`` mesh the state keeps the caller's placement (use
    ``shard_state`` to put the Q-leading leaves on the latent axis), and
    XLA partitions the per-q linear algebra across the latent axis and the
    per-datapoint VE work across the data axis, inserting ICI collectives
    for the q-contractions and the gradient reductions.
    """
    from hetmogp_tpu import train as train_mod

    body = train_mod.make_svi_step_body(config, train_config, vem=vem)
    data_sh = batch_shardings(mesh, config.num_tasks)
    rep = NamedSharding(mesh, P())
    state_sh = None if has_latent_axis(mesh) else rep
    return jax.jit(body, in_shardings=(state_sh, data_sh, rep))


def make_sharded_predictive_task(config: ModelConfig, mesh: Mesh, task: int):
    """Observation-space predictive moments of one task, SPMD over the mesh.

    The serving-scale path (reference ``predictive``, svmogp.py:333-351,
    computed via the direct inducing-point moments): prediction rows shard
    over the 'data' axis, so each chip builds only its rows' Kfu /
    projection / likelihood-quadrature chain — zero row-sized collectives
    on a 1-D mesh (the computation is row-independent).  On a 2-D
    ('data','latent') mesh the params keep the caller's latent placement
    (use ``param_shardings``/``shard_state``) and the q-mixing contractions
    in ``task_qf_moments`` become ICI psums, emitted by jit partitioning.

    The projection runs through the explicit triangular inverse (the
    single-chip serving fast path, ``predict.make_serving_predictive``):
    XLA's SPMD partitioner cannot split a ``triangular_solve`` on its RHS
    columns and would ALL-GATHER every prediction row to every device
    (measured: an (Q, M, N_total) gather in the compiled program —
    tests/test_sharding.py::test_sharded_predictive_splits_compute_eight_
    ways would catch a regression), while the cached-inverse matmul
    partitions cleanly on rows.  The replicated O(M^3) factorization+
    inverse per call is the same cost the solve path paid for its
    factorization.

    Returns a jitted ``(params, X) -> (m_pred, v_pred)`` with row-sharded
    outputs.  X's row count must be divisible by the data-axis size —
    ``predict.predictive_sharded`` pads and unpads for callers.
    """
    from hetmogp_tpu.models import elbo as elbo_mod

    lik = config.likelihoods[task]
    rep = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data", None))
    params_sh = None if has_latent_axis(mesh) else rep

    def f(params, X):
        Luu, iLuu = elbo_mod.prior_cholesky_inverse(params, config)
        m_F, v_F = elbo_mod.task_qf_moments(params, config, Luu, X, task,
                                            iLuu=iLuu)
        return lik.predictive(m_F, v_F)

    return jax.jit(f, in_shardings=(params_sh, rows),
                   out_shardings=(rows, rows))


def make_sharded_elbo(config: ModelConfig, mesh: Mesh):
    """Jitted (elbo, aux) over the mesh — for sharded evaluation tests."""
    from hetmogp_tpu.models import elbo as elbo_mod

    rep = NamedSharding(mesh, P())
    data_sh = batch_shardings(mesh, config.num_tasks)

    def f(params, data, scales):
        return elbo_mod.elbo_fn(params, data, scales, config)

    return jax.jit(f, in_shardings=(rep, data_sh, rep))
