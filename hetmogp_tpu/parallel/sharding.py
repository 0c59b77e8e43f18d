"""Data-parallel execution over a TPU mesh.

The reference has zero inter-process code (SURVEY.md §2c); minibatch
subsampling with ELBO rescaling (svmogp.py:89-90) is its only N-scaling
mechanism.  Here the same ELBO becomes SPMD: each task's minibatch is
sharded along its N axis over a 1-D ``('data',)`` mesh, the (Q, M, M)
variational state is replicated, and XLA inserts the psum for the VE sums
and their gradients during ``jax.jit`` partitioning — no hand-written
collectives, and the communication rides the ICI.

Per-task batch sizes must be divisible by the mesh size; the
MinibatchStream's ``pad_multiple`` handles ragged tails with masked rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.models.elbo import TaskData


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("data",))


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

    Same body as ``train.make_svi_step`` — state replicated, batches sharded
    on N, scales replicated.  XLA partitions the per-datapoint VE work across
    devices and inserts an ICI psum for the scalar/gradient reductions.
    """
    from hetmogp_tpu import train as train_mod

    body = train_mod.make_svi_step_body(config, train_config, vem=vem)
    rep = NamedSharding(mesh, P())
    data_sh = batch_shardings(mesh, config.num_tasks)
    return jax.jit(body, in_shardings=(rep, data_sh, rep))


def make_sharded_elbo(config: ModelConfig, mesh: Mesh):
    """Jitted (elbo, aux) over the mesh — for sharded evaluation tests."""
    from hetmogp_tpu.models import elbo as elbo_mod

    rep = NamedSharding(mesh, P())
    data_sh = batch_shardings(mesh, config.num_tasks)

    def f(params, data, scales):
        return elbo_mod.elbo_fn(params, data, scales, config)

    return jax.jit(f, in_shardings=(rep, data_sh, rep))
