"""Multi-process jax.distributed validation (SURVEY §4: multi-host behavior
must be testable with multi-process CPU JAX since the reference offers no
harness). Two local processes x two CPU devices; a shard_map psum over the
4-device global mesh must agree on every process."""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("PYTHONPATH", None)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=n,
                           process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = jax.devices()
assert len(devs) == 2 * n
mesh = Mesh(np.array(devs), ("ep",))
try:
    from jax import shard_map as _sm
    sm = lambda f, **kw: _sm(f, check_vma=False, **kw)
except ImportError:
    from jax.experimental.shard_map import shard_map as _sm
    sm = lambda f, **kw: _sm(f, check_rep=False, **kw)
f = sm(lambda v: jax.lax.psum(jnp.sum(v), "ep"),
       mesh=mesh, in_specs=P("ep"), out_specs=P())
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("ep")),
    np.arange(8, dtype=np.float32) + pid * 8)
out = jax.jit(f)(arr)
print(f"RESULT {pid} {float(out)}", flush=True)
jax.distributed.shutdown()
"""


def test_two_process_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    port = "39731"
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2", port],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"proc {i} failed:\n{err[-2000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                results[int(pid)] = float(val)
    # global sum of 0..15 over 4 devices
    assert results == {0: 120.0, 1: 120.0}
