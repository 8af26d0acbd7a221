"""True multi-process (multi-host) validation of the sharded query path.

Spawns two worker processes that jax.distributed.initialize against each
other, build one global ('dp','tp') mesh over 2x4 virtual CPU devices, run
sharded_count on globally-sharded arrays, and check the gathered result
against the dense reference. This exercises exactly the code path a real
multi-host TPU pod runs (per-process addressable shards + cross-process
collectives); skipped if the jax build lacks multi-process CPU collectives.
"""

import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n, process_id=pid)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from niqki_tpu.parallel.mesh import make_mesh
from niqki_tpu.parallel.sharded import sharded_count

devs = jax.devices()
assert len(devs) == 8, devs
mesh = make_mesh(devs, dp=2, tp=4)
rng = np.random.default_rng(0)          # identical data on every process
G, Q, F = 16, 4, 64
g = rng.integers(0, 4096, (G, F)).astype(np.int32)
q = rng.integers(0, 4096, (Q, F)).astype(np.int32)
q[1] = g[5]

def put(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

out = sharded_count(mesh)(put(q, P("dp", None)), put(g, P("tp", None)))
got = np.asarray(multihost_utils.process_allgather(out, tiled=True))
want = (q[:, None, :] == g[None, :, :]).sum(-1)
assert got.shape == want.shape and np.array_equal(got, want), \
    (got.shape, want.shape)
assert got[1, 5] == F
print(f"MULTIHOST_OK {pid}", flush=True)
"""


def test_two_process_sharded_count(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    import os
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env = dict(os.environ,
               PYTHONPATH=repo + ":" + os.environ.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo, env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process CPU collectives hung (unsupported build)")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "collectives" in joined.lower() \
                or "initialize" in joined.lower():
            pytest.skip(f"multi-process CPU unsupported: {joined[-400:]}")
        raise AssertionError(joined[-2000:])
    assert "MULTIHOST_OK 0" in outs[0]
    assert "MULTIHOST_OK 1" in outs[1]
