"""Multi-host (2-process) validation of the parallel/ mesh recipe.

The docstring contract in mv3d_tpu/parallel/mesh.py:17-19 — "call
jax.distributed.initialize() before building the mesh and feed each process
its local shard via jax.make_array_from_process_local_data — nothing else
changes" — is executed here for real: two OS processes, each with 4 virtual
CPU devices, form one 8-device global mesh (Gloo collectives) and run a
sharded global-mean computation whose result must match on both processes.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.getcwd())   # launched with cwd = repo root
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from mv3d_tpu.parallel.mesh import make_mesh, replicate

devs = jax.devices()
assert len(devs) == 8 and jax.process_count() == 2, (devs, jax.process_count())
mesh = make_mesh(8, devices=devs)

# replicated "parameters", per-process local batch shard (the loader's role)
w = replicate(jnp.float32(2.0), mesh)
local = np.arange(pid * 12, (pid + 1) * 12, dtype=np.float32).reshape(4, 3)
batch = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8, 3))

# global-mean loss: XLA inserts the cross-process psum (Gloo on CPU)
loss = jax.jit(lambda w, x: jnp.mean(w * x),
               out_shardings=NamedSharding(mesh, P()))(w, batch)
expected = 2.0 * sum(range(24)) / 24.0
assert abs(float(loss) - expected) < 1e-5, float(loss)
print("DIST_OK", pid, flush=True)
"""


def test_two_process_data_parallel_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # keep the subprocess imports off this test process's pinned config
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out
