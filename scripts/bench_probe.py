"""Diagnose the relay timing artifact (VERDICT round-1 weak #1).

Times the flagship train step three ways at several batch sizes:
  chained : N dispatches, one block_until_ready at the end (round-1 method)
  blocked : block_until_ready after EVERY step
  fetched : np.asarray(loss) after every step (forces device->host transfer,
            cannot complete before the device has produced the value)
and prints FLOPs/step from compiled cost_analysis plus the apparent TFLOP/s
under each clock. v5e bf16 peak ~197 TFLOP/s (f32 ~99); anything above is
an artifact of that clock.

Usage: python scripts/bench_probe.py [bsz ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(bsz: int, iters: int = 20):
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
        c_loss = jnp.mean((out["pred_c"] - counts) ** 2)
        v_loss = jnp.mean(out["pred_v"] ** 2)
        e_loss = jnp.mean(out["pred_e"] ** 2)
        return c_loss + 0.1 * (v_loss + e_loss)

    def train_step(params, opt_state, pattern, graph, counts):
        loss, grads = jax.value_and_grad(loss_fn)(params, pattern, graph, counts)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    lowered = jax.jit(train_step, donate_argnums=(0, 1)).lower(
        params, opt_state, pattern, graph, counts)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = ca.get("flops", float("nan")) if ca else float("nan")
    print(f"bsz={bsz}: flops/step={flops:.3e}", flush=True)

    p, o = params, opt_state
    for _ in range(3):
        p, o, loss = compiled(p, o, pattern, graph, counts)
    jax.block_until_ready(loss)

    # chained
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, loss = compiled(p, o, pattern, graph, counts)
    jax.block_until_ready(loss)
    dt_chained = (time.perf_counter() - t0) / iters

    # blocked per step
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, loss = compiled(p, o, pattern, graph, counts)
        jax.block_until_ready(loss)
    dt_blocked = (time.perf_counter() - t0) / iters

    # fetched per step
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, loss = compiled(p, o, pattern, graph, counts)
        _ = np.asarray(loss)
    dt_fetched = (time.perf_counter() - t0) / iters

    # fetched, but blocking on the full updated params pytree
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, loss = compiled(p, o, pattern, graph, counts)
        jax.block_until_ready(p)
    dt_ptree = (time.perf_counter() - t0) / iters

    edges = bsz * (256 * 2 + 8 * 2)
    for name, dt in [("chained", dt_chained), ("blocked", dt_blocked),
                     ("fetched", dt_fetched), ("block_params", dt_ptree)]:
        print(f"  {name:13s} {dt*1e3:8.3f} ms/step  "
              f"{flops/dt/1e12:8.2f} TFLOP/s  {edges/dt/1e9:6.3f} B edges/s",
              flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [512, 2048, 8192]
    for b in sizes:
        probe(b)
