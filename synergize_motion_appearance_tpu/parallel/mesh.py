"""Device mesh + sharding utilities — the TPU-native distributed layer.

Replaces the reference's entire distributed-communication stack
(utils/dist_util.py NCCL init, models/base_model.py DDP wrap, sync-BN's
master/slave protocol, reduce_loss_dict): one Mesh, batch sharded on a
'data' axis, params replicated. XLA inserts the gradient all-reduce and
global batch-norm statistics automatically; rank gating becomes
`jax.process_index() == 0`. See SURVEY.md section 2.3 / 5.8.

The mesh is N-D ready: pass extra axes (e.g. ('data', 'model')) for
tensor-sharded codebooks/attention, though the flagship config runs pure
data parallel like the reference.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host init (jax.distributed) — the `init_dist` equivalent
    (utils/dist_util.py:10-57). No-op for single-process runs; reads the
    standard env rendezvous vars when args are omitted."""
    if num_processes is None and "JAX_NUM_PROCESSES" not in os.environ:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_master() -> bool:
    """`master_only` predicate (utils/dist_util.py:74-82)."""
    return jax.process_index() == 0


def create_mesh(axes: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch so its leading dim is sharded across `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
