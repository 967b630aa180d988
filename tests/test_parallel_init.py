"""Multi-host init: rank discovery + a real 2-process CPU initialization."""

import os
import subprocess
import sys
import textwrap

import pytest

from iggt_official_tpu.parallel.init import (
    DistributedEnv,
    _first_slurm_node,
    discover_env,
)


def test_discover_env_explicit(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "MASTER_PORT",
              "NUM_PROCESSES", "WORLD_SIZE", "PROCESS_ID", "RANK",
              "SLURM_PROCID", "SLURM_NPROCS"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "1234")
    env = discover_env()
    assert env == DistributedEnv("10.0.0.1:1234", 4, 2)
    assert env.distributed


def test_discover_env_slurm(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "NUM_PROCESSES",
              "WORLD_SIZE", "PROCESS_ID", "RANK"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NPROCS", "8")
    monkeypatch.setenv("SLURM_JOB_NODELIST", "tpu[12-19]")
    env = discover_env(default_port=9999)
    assert env.num_processes == 8
    assert env.process_id == 3
    assert env.coordinator_address == "tpu12:9999"


def test_discover_env_single(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "NUM_PROCESSES",
              "WORLD_SIZE", "PROCESS_ID", "RANK", "SLURM_PROCID"):
        monkeypatch.delenv(k, raising=False)
    env = discover_env()
    assert not env.distributed
    assert env.num_processes == 1 and env.process_id == 0


def test_first_slurm_node():
    assert _first_slurm_node("node[3-17,21]") == "node3"
    assert _first_slurm_node("a,b,c") == "a"
    assert _first_slurm_node("host7") == "host7"
    assert _first_slurm_node("") is None


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from iggt_official_tpu.parallel.init import initialize, discover_env, make_global_mesh
    env = initialize()
    assert env.distributed, env
    cpus = [d for d in jax.devices() if d.platform == "cpu"]
    assert len(cpus) == 4, cpus  # 2 procs x 2 virtual devices
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_global_mesh(n_seq=2, devices=cpus)
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 1}
    arr = jax.make_array_from_callback(
        (4, 2), NamedSharding(mesh, P("data", "seq")),
        lambda idx: np.ones((2, 1), np.float32),
    )
    s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(s) == 8.0, float(s)
    print("WORKER_OK", jax.process_index())
    """
)


def test_two_process_cpu_initialize(tmp_path):
    """Real jax.distributed over two local CPU processes: global device
    visibility, a ("data","seq") global mesh, and a cross-process reduction."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    # ephemeral port: a fixed one collides with leftover workers from a
    # previous (killed) run and fails the whole suite
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(rank),
            PYTHONPATH=os.getcwd(),
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "gloo" in out.lower() or "collectives" in out.lower()
        ):
            pytest.skip(f"cpu collectives unavailable: {out[-400:]}")
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
        assert "WORKER_OK" in out
