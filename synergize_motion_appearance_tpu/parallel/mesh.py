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


def _slurm_first_hostname(node_list: str) -> str:
    """First hostname of a slurm nodelist. Prefers `scontrol show
    hostname` (what the reference shells out to, dist_util.py:44); falls
    back to a pure-Python expansion of the `prefix[a-b,c]` syntax so the
    rendezvous also works off-cluster (tests, login nodes)."""
    import shutil
    import subprocess

    if shutil.which("scontrol"):
        out = subprocess.run(
            ["scontrol", "show", "hostname", node_list],
            capture_output=True, text=True, check=False,
        ).stdout.strip().splitlines()
        if out:
            return out[0]
    # pure-Python fallback: "node[003-005,9],other" -> "node003"
    head = node_list.split(",")[0]
    if "[" in head:
        prefix, rest = head.split("[", 1)
        first = rest.split("]", 1)[0].split(",")[0].split("-")[0]
        return prefix + first
    return head


def slurm_rendezvous(environ=None, port: Optional[int] = None):
    """Derive (coordinator_address, num_processes, process_id) from the
    slurm environment — the TPU-native mirror of `_init_dist_slurm`
    (utils/dist_util.py:28-57): SLURM_PROCID -> process_id,
    SLURM_NTASKS -> world size, first host of SLURM_NODELIST (via
    scontrol) -> coordinator; port precedence arg > MASTER_PORT > 29500
    exactly like the reference."""
    env = os.environ if environ is None else environ
    proc_id = int(env["SLURM_PROCID"])
    ntasks = int(env["SLURM_NTASKS"])
    addr = _slurm_first_hostname(env["SLURM_NODELIST"])
    if port is None:
        port = int(env.get("MASTER_PORT", 29500))
    return f"{addr}:{port}", ntasks, proc_id


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     launcher: Optional[str] = None,
                     port: Optional[int] = None):
    """Multi-host init (jax.distributed) — the `init_dist` equivalent
    (utils/dist_util.py:10-57). No-op for single-process runs.

    launcher=None auto-detects: explicit args / JAX_NUM_PROCESSES env ->
    generic rendezvous; SLURM_PROCID present -> slurm rendezvous (the
    reference's `--launcher slurm` path). launcher='slurm' forces slurm;
    launcher='none' forces single-process."""
    if launcher == "none":
        return
    in_slurm = "SLURM_PROCID" in os.environ and "SLURM_NTASKS" in os.environ
    if launcher == "slurm" or (launcher is None and num_processes is None
                               and "JAX_NUM_PROCESSES" not in os.environ
                               and in_slurm):
        if not in_slurm:
            raise RuntimeError(
                "launcher='slurm' but SLURM_PROCID/SLURM_NTASKS are not "
                "set — not inside a slurm step")
        coordinator, num_processes, process_id = slurm_rendezvous(
            port=port)
        if num_processes == 1:
            return  # single-task slurm job: nothing to rendezvous
    elif num_processes is None and "JAX_NUM_PROCESSES" not in os.environ:
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
