"""Two-process jax.distributed smoke on CPU (SURVEY §2 comm-backend row /
NEXT round-2 #9): initialize_distributed() with an explicit coordinator must
produce a GLOBAL device view in every process, and a pod-style mesh
computation (psum over the global batch mesh) must agree across processes.

Runs real subprocesses — the same code path a multi-host TPU pod launch
takes, minus the TPU topology discovery.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from harp_tpu.parallel.sharding import (
    initialize_distributed, global_batch_mesh, FRAME_AXIS,
)

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 procs

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_batch_mesh()  # (sequences=2, frames=2)
assert mesh.axis_names == ("sequences", FRAME_AXIS)
assert mesh.devices.shape == (2, 2), mesh.devices.shape

# Each process contributes its own rows of a globally-sharded array; a
# jitted global sum must see ALL of them (the cross-process collective).
local = np.full((1, 2, 8), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("sequences", FRAME_AXIS)), local, (2, 2, 8)
)
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
expect = (1.0 + 2.0) * 2 * 8
np.testing.assert_allclose(jax.device_get(total), expect)
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.skipif(os.environ.get("HARP_SKIP_MULTIHOST") == "1",
                    reason="multihost smoke disabled")
def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    # jax.distributed on CPU uses the proxy-free gRPC path.
    env.pop("http_proxy", None)
    env.pop("https_proxy", None)

    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    procs = [
        subprocess.Popen([sys.executable, script, coord, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out, out[-3000:]
