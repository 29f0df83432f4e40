"""Device mesh + sharding layer.

This single module replaces the reference's DataParallel, DistributedDataParallel,
NCCL process groups, SyncBatchNorm conversion, and DistributedSampler wiring
(SURVEY.md section 2.6): on TPU, data parallelism is a 1-line sharding
declaration — parameters replicated, batch split over the 'data' mesh axis —
and XLA inserts the gradient all-reduces over ICI. BatchNorm statistics are
computed over the full global batch by construction (the reduction crosses
the sharded axis), which IS SyncBatchNorm.

A second 'model' axis is provisioned for tensor-parallel experiments on large
backbones; every reference workload runs with model=1.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the leading axis sharded over 'data'.

    Multi-host: each process passes its LOCAL portion of the global batch
    (the input pipeline shards by process index) and the pieces are assembled
    into one global array — the DistributedSampler + DDP wiring of the
    reference collapses into this call.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sh, a), batch)


def shard_batch_stacked(mesh: Mesh, batch: Any) -> Any:
    """Like shard_batch for [chain, batch, ...] stacks (the device-side
    multi-step loop): dim 0 is the scan axis, dim 1 shards over 'data'."""
    sh = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sh, a), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
