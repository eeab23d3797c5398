"""Benchmark harness: DMPNN training-step throughput on the flagship config.

Measures edges/second (pattern+graph edges, reversed included) of the full
jitted training step (forward + backward + AdamW update) on the Complex
dataset envelope (reference README.md:88-92: pattern 8V/8E, graph 64V/256E,
16 labels, bsz 512) with reversed-edge augmentation — the heaviest published
SCM configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against BASELINE_BENCH.json in the repo root if
present (written once from the first TPU measurement); otherwise 1.0 —
the reference publishes no throughput numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dualmessagepassing_tpu import build_model
    from __graft_entry__ import _flagship_config, _make_batch

    # Throughput sweep on 1x v5e (full train step, donated buffers):
    #   bsz  512 ->  238M edges/s      (dispatch-overhead-bound)
    #   bsz 1024 ->  744M edges/s
    #   bsz 2048 -> 1.44B edges/s
    #   bsz 4096 -> 2.8-2.9B edges/s
    #   bsz 8192 -> 3.4-5.7B edges/s   <- default (saturation point;
    #   bsz 16384 -> 5.4B edges/s       16k measures the same)
    # scatter backends: one-hot einsum vs XLA scatter-add — the MXU path
    # wins on the SCM envelope at every size tried (bsz 4096: 2.78B vs
    # 1.67B; bsz 8192: ~5.2B vs 3.78B; BENCH_SCATTER=segment re-measures)
    # matmul precision at bsz 4096: forcing single-pass bfloat16 measured
    # no better than default (BENCH_PRECISION to re-measure); short runs
    # (ITERS<20) carry ~±30% relay/warmup noise — hence the default below
    bsz = int(os.environ.get("BENCH_BSZ", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    prec = os.environ.get("BENCH_PRECISION")
    if prec:
        jax.config.update("jax_default_matmul_precision", prec)
    cfg = _flagship_config()
    sm = os.environ.get("BENCH_SCATTER")
    if sm:
        cfg = cfg.replace(scatter_method=sm)
    model = build_model(cfg)
    pattern, graph = _make_batch(bsz, 8, 8, 64, 256, 16, 16)

    counts = jnp.asarray(
        np.random.default_rng(0).poisson(4.0, size=(bsz, 1)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pattern, graph)
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)

    def loss_fn(p, pattern, graph, counts):
        out = model.apply(p, pattern, graph)
        c_loss = jnp.mean((out["pred_c"] - counts) ** 2)
        v_loss = jnp.mean(out["pred_v"] ** 2)
        e_loss = jnp.mean(out["pred_e"] ** 2)
        return c_loss + 0.1 * (v_loss + e_loss)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, pattern, graph, counts):
        loss, grads = jax.value_and_grad(loss_fn)(params, pattern, graph, counts)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup (compile)
    for _ in range(3):
        params, opt_state, loss = train_step(params, opt_state, pattern, graph, counts)
    loss.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state, pattern, graph, counts)
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    # real (non-padded) edges per step: graph 256*2(rev) + pattern 8*2 per pair
    edges_per_step = bsz * (256 * 2 + 8 * 2)
    eps = edges_per_step * iters / dt

    vs = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_BENCH.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("scm_train_edges_per_sec")
        if ref:
            vs = eps / ref

    print(json.dumps({
        "metric": "scm_train_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
