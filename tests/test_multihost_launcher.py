"""Multi-host launcher test (SURVEY.md §4 item 4, VERDICT round-1 item 8):
two OS processes wire up `jax.distributed` through
`parallel.multihost.initialize_multihost`, form ONE global 4-device mesh
(2 virtual CPU devices per process), run a cross-process psum over it, and
prove the per-host loader shards are disjoint and complete."""
import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import json, os, sys
port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.getcwd())
from infomax3d_tpu.parallel.multihost import (
    host_shard_indices, initialize_multihost, local_mesh_devices)

initialize_multihost()          # env-fallback wiring
assert jax.process_count() == 2 and jax.process_index() == pid
assert jax.device_count() == 4, jax.device_count()
assert len(local_mesh_devices()) == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))
# each global device row carries its global index + 1 -> psum = 1+2+3+4 = 10
local_rows = np.array([[2.0 * pid + 1.0], [2.0 * pid + 2.0]], np.float32)
x = jax.make_array_from_process_local_data(sharding, local_rows)

def f(v):
    return jax.lax.psum(v, "data")

y = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P(),
                          check_vma=False))(x)
total = float(np.asarray(jax.device_get(y.addressable_shards[0].data))[0])

shard = host_shard_indices(11, seed=3).tolist()
with open(out_path, "w") as fh:
    json.dump({"psum": total, "shard": shard,
               "process_index": jax.process_index()}, fh)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_launcher(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    outs = [str(tmp_path / f"out_{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(i), outs[i]],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.load(open(o)) for o in outs]
    # cross-process psum saw all 4 devices: 1 + 2 + 3 + 4
    assert results[0]["psum"] == 10.0
    assert results[1]["psum"] == 10.0
    # per-host shards: disjoint, complete, deterministic
    s0, s1 = set(results[0]["shard"]), set(results[1]["shard"])
    assert not (s0 & s1)
    assert sorted(s0 | s1) == list(range(11))
    assert abs(len(s0) - len(s1)) <= 1
