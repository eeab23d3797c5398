"""Multi-process jax.distributed validation (SURVEY §4: multi-host behavior
must be testable with multi-process CPU JAX since the reference offers no
harness). Two local processes x two CPU devices; a shard_map psum over the
4-device global mesh must agree on every process."""

import os
import subprocess
import sys

import numpy as np
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


EP_TRAIN_WORKER = r"""
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
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from dualmessagepassing_tpu.parallel.ep_unc import (
    EDGE_KEYS, make_ep_train_step, pad_e_max)
from dualmessagepassing_tpu.unc.data import (
    WholeGraph, compute_edgenorm, negative_sampling, pad_subgraph,
    sample_subgraph_by_randomwalks)
from dualmessagepassing_tpu.unc.model import UNCTrainModel, init_unc_variables

devs = jax.devices(); n_dev = len(devs)
mesh = Mesh(np.array(devs), ("ep",))
rng = np.random.default_rng(0)   # identical host data on every process
V, E, R = 24, 96, 3
src = rng.integers(0, V, E); dst = (src + rng.integers(1, V, E)) % V
trip = np.stack([src, rng.integers(0, R, E), dst], 1).astype(np.int64)
g = WholeGraph(V, R, trip)
e_max = pad_e_max(2 * E, n_dev)

def make_sub(srng):
    pos = trip[srng.integers(0, E, 8)]
    neg = negative_sampling(pos, V, 2, srng)
    seeds = np.unique(pos[:, [0, 2]].reshape(-1))
    sub = sample_subgraph_by_randomwalks(g, seeds, 2, 6, srng)
    samples = np.concatenate([pos, neg]).copy()
    lut = {int(v): i for i, v in enumerate(sub["nid"])}
    samples[:, 0] = [lut.get(int(x), 0) for x in samples[:, 0]]
    samples[:, 2] = [lut.get(int(x), 0) for x in samples[:, 2]]
    labels = np.zeros(len(samples), np.float32); labels[:8] = 1.0
    return pad_subgraph(sub, samples, labels, V, e_max, 32,
                        edge_norm=compute_edgenorm(sub))

mkw = dict(num_nodes=V, num_rels=R, h_dim=8, nlabel=0,
           num_hidden_layers=1, dropout=0.0, reg_param=0.01,
           backbone="DMPNN")
model = UNCTrainModel(ep_axis="ep", **mkw)
first = make_sub(np.random.default_rng(1))
variables = init_unc_variables(
    UNCTrainModel(**mkw), jax.random.PRNGKey(0),
    {k: jnp.asarray(v) for k, v in first.items()})

rep = NamedSharding(mesh, P())
glob_rep = lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x))

def glob_sub(sub):
    out = {}
    for k, v in sub.items():
        if k in EDGE_KEYS:
            per = len(v) // n
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("ep")), v[pid * per:(pid + 1) * per])
        else:
            out[k] = glob_rep(v)
    return out

params = jax.tree.map(glob_rep, variables["params"])
stats = jax.tree.map(glob_rep, variables.get("batch_stats", {}))
tx = optax.adam(1e-2)
opt = jax.jit(tx.init)(params)
step = make_ep_train_step(model, tx, mesh)
for k in range(3):
    sub = glob_sub(make_sub(np.random.default_rng(10 + k)))
    params, opt, stats, loss = step(params, opt, stats, sub,
                                    np.asarray(jax.random.PRNGKey(20 + k)))
    print(f"LOSS {pid} {k} {float(loss):.6f}", flush=True)
checksum = jax.jit(lambda p: sum(jnp.sum(jnp.abs(x))
                                 for x in jax.tree.leaves(p)))(params)
print(f"RESULT {pid} {float(checksum):.6f}", flush=True)
jax.distributed.shutdown()
"""


DP_SCM_WORKER = r"""
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
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from dualmessagepassing_tpu import (ModelConfig, batch_graphs, build_model,
                                    single_graph)

devs = jax.devices(); n_dev = len(devs)
mesh = Mesh(np.array(devs), ("dp",))
rng = np.random.default_rng(0)   # identical batch on every process
bsz = 2 * n_dev
pats, gras = [], []
for _ in range(bsz):
    pats.append(single_graph(4, rng.integers(0, 4, 8), rng.integers(0, 4, 8),
                             node_labels=rng.integers(0, 3, 4),
                             edge_labels=rng.integers(0, 3, 8),
                             v_max=4, e_max=8))
    gras.append(single_graph(8, rng.integers(0, 8, 16), rng.integers(0, 8, 16),
                             node_labels=rng.integers(0, 3, 8),
                             edge_labels=rng.integers(0, 3, 16),
                             v_max=8, e_max=16))
pattern, graph = batch_graphs(pats), batch_graphs(gras)
counts = np.ones((bsz, 1), np.float32)

cfg = ModelConfig(max_ngv=8, max_ngvl=3, max_nge=16, max_ngel=3,
                  max_npv=4, max_npvl=3, max_npe=8, max_npel=3,
                  hid_dim=8, rep_num_pattern_layers=1, rep_num_graph_layers=1,
                  pred_hid_dim=8, filter_net="ScalarFilter",
                  pred_return_weights="nodeedge")
model = build_model(cfg)
params_local = model.init(jax.random.PRNGKey(0), pattern, graph)

rep = NamedSharding(mesh, P())
glob_rep = lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x))
per = bsz // n
lo, hi = pid * per, (pid + 1) * per

def glob_batch(x):
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))), x[lo:hi])

params = jax.tree.map(glob_rep, params_local)
pattern = jax.tree.map(glob_batch, pattern)
graph = jax.tree.map(glob_batch, graph)
counts_g = glob_batch(counts)
tx = optax.adamw(1e-3, weight_decay=1e-5)
opt = jax.jit(tx.init)(params)

def loss_fn(p, pattern, graph, counts):
    out = model.apply(p, pattern, graph)
    return (jnp.mean((out["pred_c"] - counts) ** 2)
            + 0.1 * jnp.mean(out["pred_v"] ** 2)
            + 0.1 * jnp.mean(out["pred_e"] ** 2))

@jax.jit
def train_step(params, opt, pattern, graph, counts):
    loss, grads = jax.value_and_grad(loss_fn)(params, pattern, graph, counts)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

for k in range(3):
    params, opt, loss = train_step(params, opt, pattern, graph, counts_g)
    print(f"LOSS {pid} {k} {float(loss):.6f}", flush=True)
checksum = jax.jit(lambda p: sum(jnp.sum(jnp.abs(x))
                                 for x in jax.tree.leaves(p)))(params)
print(f"RESULT {pid} {float(checksum):.6f}", flush=True)
jax.distributed.shutdown()
"""


def _run_pair(tmp_path, source, port, timeout=420):
    worker = tmp_path / "worker.py"
    worker.write_text(source)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["REPO_DIR"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2", port],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    results, losses = {}, {0: [], 1: []}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"proc {i} failed:\n{err[-2000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                results[int(pid)] = float(val)
            elif line.startswith("LOSS"):
                _, pid, k, val = line.split()
                losses[int(pid)].append(float(val))
    return results, losses


def test_two_process_ep_train_step(tmp_path):
    """Multi-host training bring-up: 3 edge-partitioned train steps of the
    REAL UNC model (DualGraphConv + BN + DistMult loss + regs, Adam) over a
    4-device global mesh spanning two processes. Loss trajectory and final
    parameter checksum must agree across processes."""
    results, losses = _run_pair(tmp_path, EP_TRAIN_WORKER, "39751")
    assert len(results) == 2
    assert len(losses[0]) == 3 and losses[0] == losses[1], losses
    assert abs(results[0] - results[1]) < 1e-4, results
    assert all(np.isfinite(l) for l in losses[0])


def test_two_process_dp_scm_train_step(tmp_path):
    """DP-across-processes for SCM: 3 data-parallel train steps of the
    flagship counting model (batch sharded over 'dp' spanning both
    processes, params replicated, grads all-reduced by jit). Loss and
    params must agree across processes."""
    results, losses = _run_pair(tmp_path, DP_SCM_WORKER, "39761")
    assert len(results) == 2
    assert len(losses[0]) == 3 and losses[0] == losses[1], losses
    assert abs(results[0] - results[1]) < 1e-4, results
    assert all(np.isfinite(l) for l in losses[0])


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


HALO_TRAIN_WORKER = r"""
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
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from dualmessagepassing_tpu.parallel.halo_unc import (
    SHARD_KEYS, build_halo_sub, halo_envelope, make_halo_train_step)
from dualmessagepassing_tpu.unc.data import (
    WholeGraph, compute_edgenorm, negative_sampling, pad_subgraph,
    sample_subgraph_by_randomwalks)
from dualmessagepassing_tpu.unc.model import UNCTrainModel, init_unc_variables

devs = jax.devices(); n_dev = len(devs)
mesh = Mesh(np.array(devs), ("ep",))
rng = np.random.default_rng(0)   # identical host data on every process
V, E, R = 24, 96, 3
src = rng.integers(0, V, E); dst = (src + rng.integers(1, V, E)) % V
trip = np.stack([src, rng.integers(0, R, E), dst], 1).astype(np.int64)
g = WholeGraph(V, R, trip)
e_max = 2 * E
vp, ep_env, b = halo_envelope(V, e_max, n_dev)

def make_sub(srng):
    pos = trip[srng.integers(0, E, 8)]
    neg = negative_sampling(pos, V, 2, srng)
    seeds = np.unique(pos[:, [0, 2]].reshape(-1))
    sub = sample_subgraph_by_randomwalks(g, seeds, 2, 6, srng)
    samples = np.concatenate([pos, neg]).copy()
    lut = {int(v): i for i, v in enumerate(sub["nid"])}
    samples[:, 0] = [lut.get(int(x), 0) for x in samples[:, 0]]
    samples[:, 2] = [lut.get(int(x), 0) for x in samples[:, 2]]
    labels = np.zeros(len(samples), np.float32); labels[:8] = 1.0
    padded = pad_subgraph(sub, samples, labels, V, e_max, 32,
                          edge_norm=compute_edgenorm(sub))
    dev, _meta = build_halo_sub(padded, n_dev, vp, ep_env, b)
    return dev

mkw = dict(num_nodes=V, num_rels=R, h_dim=8, nlabel=0,
           num_hidden_layers=1, dropout=0.0, reg_param=0.01,
           backbone="DMPNN")
model = UNCTrainModel(ep_axis="ep", node_sharding="owner",
                      sorted_edges=True, **mkw)
# init on an axis-free twin with a plain (non-halo) padded sub
first_rng = np.random.default_rng(1)
pos = trip[first_rng.integers(0, E, 8)]
neg = negative_sampling(pos, V, 2, first_rng)
seeds = np.unique(pos[:, [0, 2]].reshape(-1))
s0 = sample_subgraph_by_randomwalks(g, seeds, 2, 6, first_rng)
samples = np.concatenate([pos, neg]).copy()
lut = {int(v): i for i, v in enumerate(s0["nid"])}
samples[:, 0] = [lut.get(int(x), 0) for x in samples[:, 0]]
samples[:, 2] = [lut.get(int(x), 0) for x in samples[:, 2]]
labels = np.zeros(len(samples), np.float32); labels[:8] = 1.0
first = pad_subgraph(s0, samples, labels, V, e_max, 32,
                     edge_norm=compute_edgenorm(s0))
variables = init_unc_variables(
    UNCTrainModel(**mkw), jax.random.PRNGKey(0),
    {k: jnp.asarray(v) for k, v in first.items()})

rep = NamedSharding(mesh, P())
glob_rep = lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x))

def glob_dev(dev):
    out = {}
    per = n_dev // n     # shards per process (leading [n_dev] axis)
    for k, v in dev.items():
        if k in SHARD_KEYS:
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("ep")), v[pid * per:(pid + 1) * per])
        else:
            out[k] = glob_rep(v)
    return out

params = jax.tree.map(glob_rep, variables["params"])
stats = jax.tree.map(glob_rep, variables.get("batch_stats", {}))
tx = optax.adam(1e-2)
opt = jax.jit(tx.init)(params)
step = make_halo_train_step(model, tx, mesh)
for k in range(3):
    dev = glob_dev(make_sub(np.random.default_rng(10 + k)))
    params, opt, stats, loss = step(params, opt, stats, dev,
                                    np.asarray(jax.random.PRNGKey(20 + k)))
    print(f"LOSS {pid} {k} {float(loss):.6f}", flush=True)
checksum = jax.jit(lambda p: sum(jnp.sum(jnp.abs(x))
                                 for x in jax.tree.leaves(p)))(params)
print(f"RESULT {pid} {float(checksum):.6f}", flush=True)
jax.distributed.shutdown()
"""


def test_two_process_halo_train_step(tmp_path):
    """Multi-host halo bring-up: 3 owner-sharded train steps (boundary
    all_to_all spanning two processes, fully-local aggregation, DistMult
    loss) over a 4-shard global mesh; loss trajectory and parameter
    checksum agree across processes."""
    results, losses = _run_pair(tmp_path, HALO_TRAIN_WORKER, "39754")
    assert len(results) == 2
    assert len(losses[0]) == 3 and losses[0] == losses[1], losses
    assert abs(results[0] - results[1]) < 1e-4, results
    assert all(np.isfinite(l) for l in losses[0])
