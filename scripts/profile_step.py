"""Device-trace witness for train-step time (VERDICT round-1 next #1).

Runs a few flagship train steps under jax.profiler.trace and reports the
per-step DEVICE time parsed from the xplane proto — the ground truth that
the relay's host-side clocks (block_until_ready / transfer) are checked
against.

Usage: python scripts/profile_step.py [bsz] [iters]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_lanes(logdir: str):
    """Per-lane totals from the newest Chrome trace (*.trace.json.gz) under
    logdir: {(pid, lane_name): (total_us, n_events)}. (The xplane.pb proto
    bindings are not importable in this image; the Chrome trace carries the
    same lane structure.)"""
    import gzip
    import json as _json

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    data = _json.load(gzip.open(paths[-1]))
    evs = data.get("traceEvents", [])
    names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    out = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        key = (e["pid"], names.get((e["pid"], e.get("tid")), ""))
        us, n = out.get(key, (0.0, 0))
        out[key] = (us + e.get("dur", 0.0), n + 1)
    return out


def main(bsz=2048, iters=5):
    import jax
    import jax.numpy as jnp
    import optax

    from dualmessagepassing_tpu import build_model
    from __graft_entry__ import _flagship_config, _make_batch

    cfg = _flagship_config()
    model = build_model(cfg)
    pattern, graph = _make_batch(bsz, 8, 8, 64, 256, 16, 16)
    counts = jnp.asarray(
        np.random.default_rng(0).poisson(4.0, size=(bsz, 1)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pattern, graph)
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)

    def loss_fn(p, pattern, graph, counts):
        out = model.apply(p, pattern, graph)
        return (jnp.mean((out["pred_c"] - counts) ** 2)
                + 0.1 * (jnp.mean(out["pred_v"] ** 2)
                         + jnp.mean(out["pred_e"] ** 2)))

    def train_step(params, opt_state, pattern, graph, counts):
        loss, grads = jax.value_and_grad(loss_fn)(params, pattern, graph,
                                                  counts)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = jax.jit(train_step, donate_argnums=(0, 1)).lower(
        params, opt_state, pattern, graph, counts).compile()
    flops = compiled.cost_analysis().get("flops", float("nan"))
    p, o = params, opt_state
    for _ in range(3):
        p, o, loss = compiled(p, o, pattern, graph, counts)
    jax.block_until_ready(loss)

    logdir = tempfile.mkdtemp(prefix="dmp_profile_")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            p, o, loss = compiled(p, o, pattern, graph, counts)
        jax.block_until_ready(loss)
    wall = time.perf_counter() - t0
    print(f"bsz={bsz} iters={iters} wall={wall:.3f}s "
          f"({wall/iters*1e3:.2f} ms/step host clock) flops/step={flops:.3e}",
          flush=True)

    for (pid, lane), (us, n) in sorted(device_lanes(logdir).items(),
                                       key=lambda kv: -kv[1][0]):
        print(f"  pid {pid} {lane:24s} {us/1e3:10.3f} ms total  {n:6d} events"
              f"  -> {us/1e3/iters:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(bsz, iters)
