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


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)  # 2 procs x 4 = 8 global
    jax.config.update("jax_default_matmul_precision", "highest")
    from synergize_motion_appearance_tpu.parallel.mesh import (
        init_distributed)
    init_distributed(launcher="slurm")
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from synergize_motion_appearance_tpu.training import Trainer
    from test_train_step import tiny_opt, make_batch

    opt = tiny_opt()
    opt["train"]["net_d_start_iter"] = 1
    trainer = Trainer(opt)
    # identical deterministic init on every process (same key, same
    # batch shapes) -- the reference reaches the same point by rank-0
    # broadcast inside DDP's constructor
    state, vgg = trainer.init_state(jax.random.PRNGKey(0), make_batch(8))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def gput(tree, sh):
        def one(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])
        return jax.tree_util.tree_map(one, tree)

    state = gput(state, repl)
    vgg = gput(vgg, repl)
    batch = gput(jax.tree_util.tree_map(np.asarray, make_batch(8)), shard)

    step = jax.jit(trainer.make_train_step())
    key = jax.random.PRNGKey(7)
    logs1 = None
    for i in range(3):
        key, sub = jax.random.split(key)
        state, logs = step(state, batch, gput(np.asarray(sub), repl), vgg)
        if i == 0:
            logs1 = {k: float(v) for k, v in logs.items()}
    logs3 = {k: float(v) for k, v in logs.items()}
    for k, v in logs3.items():
        assert np.isfinite(v), (k, v)

    if jax.process_index() == 0:
        base = np.load(os.environ["BASELINE_NPZ"])
        # step-1 logs, argmin-insensitive subset: float reduction noise
        TIE = ("l_g_motion_codebook_recon", "l_g_total",
               "l_g_motion_codebook_code", "l_g_app_codebook_code")
        for k, v in logs1.items():
            if k in TIE:
                continue
            b = float(base["log1_" + k])
            assert abs(v - b) <= 1e-5 * max(1.0, abs(b)), (k, v, b)
        # post-3-step params vs the single-process 8-device step
        # (tolerance = test_train_convergence.py's measured VQ-tie bound)
        for name in ("params_g", "params_d", "params_m", "ema_g"):
            leaves = jax.tree_util.tree_leaves(getattr(state, name))
            worst = 0.0
            for j, leaf in enumerate(leaves):
                assert leaf.is_fully_replicated
                mine = np.asarray(leaf.addressable_data(0))
                ref = base[f"{name}_{j}"]
                worst = max(worst, float(np.abs(mine - ref).max()))
            assert worst < 1.5e-3, (name, worst)
        print("rank 0 params ok", flush=True)
    print(f"rank {jax.process_index()} train step ok", flush=True)
""")


@pytest.mark.slow
def test_two_process_train_step_equivalence(tmp_path):
    """The REAL Trainer step across a process boundary: 2 CPU processes x
    4 virtual devices rendezvous into one 8-device global mesh, run 3
    full G+D train steps on a data-sharded global batch, and the
    resulting params must match the single-process 8-device step on the
    identical batch (the reference's 4-process DDP mode,
    utils/dist_util.py:21-25 + base_model.py:63-77, proven rather than
    assumed)."""
    import numpy as np

    import jax

    from synergize_motion_appearance_tpu.training import Trainer
    from synergize_motion_appearance_tpu.parallel import (
        create_mesh, replicate, shard_batch,
    )

    sys.path.insert(0, osp.join(REPO, "tests"))
    from test_train_step import make_batch, tiny_opt

    # ---- baseline: single-process, 8 virtual devices (conftest) ----
    assert jax.device_count() >= 8
    opt = tiny_opt()
    opt["train"]["net_d_start_iter"] = 1
    trainer = Trainer(opt)
    batch = make_batch(8)
    state, vgg = trainer.init_state(jax.random.PRNGKey(0), batch)
    mesh = create_mesh(("data",))
    state = replicate(state, mesh)
    vgg = replicate(vgg, mesh)
    batch8 = shard_batch(batch, mesh)
    step = jax.jit(trainer.make_train_step())
    key = jax.random.PRNGKey(7)
    logs1 = None
    for i in range(3):
        key, sub = jax.random.split(key)
        state, logs = step(state, batch8, sub, vgg)
        if i == 0:
            logs1 = {k: float(v) for k, v in logs.items()}

    payload = {"log1_" + k: np.float64(v) for k, v in logs1.items()}
    for name in ("params_g", "params_d", "params_m", "ema_g"):
        for j, leaf in enumerate(
                jax.tree_util.tree_leaves(getattr(state, name))):
            payload[f"{name}_{j}"] = np.asarray(leaf)
    npz = tmp_path / "baseline.npz"
    np.savez(npz, **payload)

    # ---- 2-process run of the same 3 steps ----
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    port = 29671
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO + os.pathsep + osp.join(REPO, "tests"),
            JAX_PLATFORMS="cpu",
            SLURM_PROCID=str(rank), SLURM_NTASKS="2",
            SLURM_NODELIST="localhost", MASTER_PORT=str(port),
            BASELINE_NPZ=str(npz),
            # workers don't load tests/conftest — give them the same
            # persistent compile cache so reruns skip the cold compile
            # (the 2-proc sharded step is a distinct graph from the
            # baseline's; both workers compiling it cold concurrently
            # on this 1-core host is what used to blow the timeout)
            JAX_COMPILATION_CACHE_DIR=os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/samt_test_jax_cache"),
        )
        env.pop("JAX_NUM_PROCESSES", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        # 3600 s: two concurrent cold XLA-CPU compiles of the full tiny
        # G+D step on one core measured ~25 min each under tier load
        out, _ = p.communicate(timeout=3600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert "train step ok" in out
    assert "params ok" in outs[0]


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
