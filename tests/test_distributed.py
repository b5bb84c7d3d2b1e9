"""Multi-host entry path: maybe_initialize_distributed with a REAL 2-process
jax.distributed cluster over CPU (gloo collectives), plus the no-op branch.

This covers the flagship distributed axis end-to-end on one machine: two
processes each owning 2 virtual CPU devices form a global 4-device mesh, and
a jitted global reduction moves data across the process boundary.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vpt_tpu.parallel.mesh import maybe_initialize_distributed, make_mesh

    assert maybe_initialize_distributed(), "env vars present: must initialize"
    assert maybe_initialize_distributed(), "second call: already-initialized no-op"
    assert jax.process_count() == 2, jax.process_count()
    mesh = make_mesh()
    assert mesh.devices.size == 4, mesh.devices

    pid = jax.process_index()
    local = np.full((2, 3), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("dp")), local, (4, 3))
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
    val = float(np.asarray(jax.device_get(total)))
    assert val == 6.0 * 1 + 6.0 * 2, val
    print(f"DIST_OK {pid} {val}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(240)
def test_two_process_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": repo})
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {pid} failed:\n{err[-2000:]}"
        assert f"DIST_OK {pid} 18.0" in out, out


def test_no_env_vars_is_noop(monkeypatch):
    from vpt_tpu.parallel.mesh import maybe_initialize_distributed

    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    # single-process suite: not initialized, no env vars → False, no side effects
    assert maybe_initialize_distributed() is False
