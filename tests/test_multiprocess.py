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


EP_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
repo = os.environ.pop("REPO_DIR")
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=n,
                           process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from dualmessagepassing_tpu.parallel import (
    init_edge_parallel_params, make_edge_parallel_dmp_apply, pad_to_multiple)

devs = jax.devices()
n_dev = len(devs)
mesh = Mesh(np.array(devs), ("ep",))
rng = np.random.default_rng(0)  # same on every process
V, E, H = 10, 48, 8
arrays = pad_to_multiple({
    "senders": rng.integers(0, V, E).astype(np.int32),
    "receivers": rng.integers(0, V, E).astype(np.int32),
    "rev_flag": rng.random(E) < 0.5,
}, n_dev)
node_feat = jnp.asarray(rng.normal(size=(V, H)), jnp.float32)
edge_feat_np = rng.normal(size=(len(arrays["senders"]), H)).astype(np.float32)
params = init_edge_parallel_params(jax.random.PRNGKey(0), 1, H)
fwd = make_edge_parallel_dmp_apply(mesh, V, num_layers=1)

ep = NamedSharding(mesh, P("ep"))
per = len(arrays["senders"]) // n
lo, hi = pid * per, (pid + 1) * per

def shard(x):
    return jax.make_array_from_process_local_data(ep, np.asarray(x)[lo:hi])

with mesh:
    h_out, e_out = jax.jit(fwd)(
        params, node_feat, shard(edge_feat_np),
        shard(arrays["senders"]), shard(arrays["receivers"]),
        shard(arrays["rev_flag"]), shard(arrays["edge_mask"]))
    # node output is replicated; checksum must agree across processes
    print(f"RESULT {pid} {float(jnp.sum(h_out)):.6f}", flush=True)
jax.distributed.shutdown()
"""


def test_two_process_edge_partition(tmp_path):
    """The edge-partitioned DMP forward over a global mesh spanning two
    processes — the multi-host north-star shape, on local CPU processes."""
    worker = tmp_path / "ep_worker.py"
    worker.write_text(EP_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["REPO_DIR"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = "39741"
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2", port],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"proc {i} failed:\n{err[-2000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                results[int(pid)] = float(val)
    assert len(results) == 2
    assert abs(results[0] - results[1]) < 1e-4, results


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
