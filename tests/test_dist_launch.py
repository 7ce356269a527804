"""Launcher rendezvous parity (reference utils/dist_util.py:28-57) and a
real 2-process jax.distributed CPU smoke test (the multi-host bring-up the
reference only ever exercises by launching DDP)."""
import os
import subprocess
import sys
import textwrap
from os import path as osp

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_slurm_rendezvous_env_derivation():
    from synergize_motion_appearance_tpu.parallel.mesh import (
        slurm_rendezvous,
    )

    env = {"SLURM_PROCID": "3", "SLURM_NTASKS": "8",
           "SLURM_NODELIST": "node[003-005,9],extra7"}
    addr, n, pid = slurm_rendezvous(environ=env)
    # reference: scontrol's first hostname + default port 29500
    host = addr.rsplit(":", 1)[0]
    assert host in ("node003", "node3")  # scontrol may strip zero-padding
    assert addr.endswith(":29500")
    assert (n, pid) == (8, 3)

    # port precedence: MASTER_PORT env (dist_util.py:46-52)
    env["MASTER_PORT"] = "12345"
    addr, _, _ = slurm_rendezvous(environ=env)
    assert addr.endswith(":12345")
    # explicit arg wins over env
    addr, _, _ = slurm_rendezvous(environ=env, port=777)
    assert addr.endswith(":777")


def test_slurm_rendezvous_plain_hostname():
    from synergize_motion_appearance_tpu.parallel.mesh import (
        slurm_rendezvous,
    )

    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_NODELIST": "tpu-host-a,tpu-host-b"}
    addr, n, pid = slurm_rendezvous(environ=env)
    assert addr == "tpu-host-a:29500"


def test_init_distributed_single_task_slurm_noop(monkeypatch):
    """A 1-task slurm job must not try to rendezvous."""
    from synergize_motion_appearance_tpu.parallel import mesh

    monkeypatch.setenv("SLURM_PROCID", "0")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    monkeypatch.setenv("SLURM_NODELIST", "solo-node")
    called = {}
    monkeypatch.setattr(
        mesh.jax.distributed, "initialize",
        lambda **kw: called.setdefault("init", kw))
    mesh.init_distributed(launcher="slurm")
    assert "init" not in called


def test_init_distributed_slurm_outside_slurm_raises(monkeypatch):
    from synergize_motion_appearance_tpu.parallel import mesh

    monkeypatch.delenv("SLURM_PROCID", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    with pytest.raises(RuntimeError, match="slurm"):
        mesh.init_distributed(launcher="slurm")


_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from synergize_motion_appearance_tpu.parallel.mesh import (
        init_distributed, is_master)
    init_distributed(launcher="slurm")
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() >= 2
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(jax.devices(), ("data",))
    # one global array sharded over both processes; a global sum must see
    # every process's shard
    n = jax.device_count()
    pid = jax.process_index()
    arrs = [jax.device_put(jnp.full((1,), float(pid + 1)), d)
            for d in jax.local_devices()]
    ga = jax.make_array_from_single_device_arrays(
        (n,), NamedSharding(mesh, P("data")), arrs)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(ga)
    # every process contributes (pid+1) per local device; with 1 local
    # device each and 2 processes the global sum must be 1 + 2 = 3
    expect = sum(d.process_index + 1 for d in jax.devices())
    assert float(total) == expect, (float(total), expect)
    print(f"rank {jax.process_index()} ok total={float(total)}",
          flush=True)
""")


@pytest.mark.slow
def test_two_process_jax_distributed_smoke(tmp_path):
    """Real multi-process bring-up on CPU: 2 processes rendezvous through
    the slurm launcher path and jointly compute a global sharded sum."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = 29611
    procs = []
    for rank in range(2):
        env = dict(
            os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
            SLURM_PROCID=str(rank), SLURM_NTASKS="2",
            SLURM_NODELIST="localhost", MASTER_PORT=str(port),
        )
        env.pop("JAX_NUM_PROCESSES", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "ok total=" in out
