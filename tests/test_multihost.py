"""Multi-host initialisation exercised for real: two OS processes, each a
JAX "host" with 2 virtual CPU devices, joined via ``multihost.initialize``
(the jax.distributed coordination service) into one 4-device global mesh;
a cross-process psum must see every shard. Turns SURVEY §3.7's "multi-host
init" row from unexercisable-veneer into a tested component."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from elektronn2_tpu.parallel import multihost

multihost.initialize(f"127.0.0.1:{port}", n, pid)
assert jax.process_count() == n, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * n

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.global_mesh({"data": 2 * n})
sh = NamedSharding(mesh, P("data"))
# every device holds its global index; psum over the data axis -> 0+1+2+3
x = jax.make_array_from_callback(
    (2 * n,), sh, lambda idx: np.arange(2 * n, dtype=np.float32)[idx])
total = jax.shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)(x)
want = float(sum(range(2 * n)))
for s in total.addressable_shards:
    assert float(np.asarray(s.data)[0]) == want, np.asarray(s.data)
assert multihost.is_main_process() == (pid == 0)
print("MULTIHOST OK", pid, flush=True)
'''


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=220)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST OK {i}" in out, out
