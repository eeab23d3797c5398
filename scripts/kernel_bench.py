"""Device-trace microbenchmark of the segment-sum backends (VERDICT r1 #7).

Round-1 kernel verdicts (Pallas 0.28-0.95x, sorted-scatter 100x-slower
in-step) were reached with the relay's host clock, which the round-2 bench
work proved untrustworthy in both directions. This script re-litigates them
with the only honest clock: jax.profiler device traces ("XLA Modules" lane,
same parser as bench.py).

For each (V, E, H) size it times, per call:
  xla_scatter         zeros.at[recv].add(msg)                (default path)
  xla_scatter_sorted  same, receiver-sorted + indices_are_sorted=True
  onehot_einsum       masked one-hot matmul (MXU; O(E*V*H) FLOPs)
  pallas_full         ops.pallas_scatter.pallas_segment_sum
  pallas_csr          ops.pallas_scatter.pallas_csr_segment_sum
and prints an HBM-roofline bound: ideal bytes = E*H*4 (read) + V*H*4
(write) + E*4 (indices) over the v5e ~819 GB/s HBM bandwidth.

Usage:  python scripts/kernel_bench.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0  # v5e


def time_op(fn, args, iters):
    import jax

    from bench import device_ms_per_step
    import tempfile

    out = fn(*args)
    jax.block_until_ready(out)  # warmup/compile
    logdir = tempfile.mkdtemp(prefix="kbench_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return device_ms_per_step(logdir, iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sizes", type=str,
                    default="64x4096,512x65536,2048x262144,82465x497664")
    ap.add_argument("--h", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dualmessagepassing_tpu.ops.pallas_scatter import (
        csr_sort_host, pallas_csr_segment_sum, pallas_segment_sum)

    H = args.h
    rows = []
    for spec in args.sizes.split(","):
        V, E = (int(x) for x in spec.split("x"))
        rng = np.random.default_rng(0)
        recv = rng.integers(0, V, E).astype(np.int32)
        msg = rng.normal(size=(E, H)).astype(np.float32)
        order, row_ptr = csr_sort_host(recv, V)
        recv_sorted = recv[order]
        msg_sorted = msg[order]

        recv_d = jnp.asarray(recv)
        msg_d = jnp.asarray(msg)
        recv_s = jnp.asarray(recv_sorted)
        msg_s = jnp.asarray(msg_sorted)

        @jax.jit
        def xla_scatter(m, r):
            return jnp.zeros((V, H), m.dtype).at[r].add(m)

        @jax.jit
        def xla_scatter_sorted(m, r):
            return jnp.zeros((V, H), m.dtype).at[r].add(
                m, indices_are_sorted=True)

        @jax.jit
        def onehot_einsum(m, r):
            oh = (r[:, None] == jnp.arange(V)[None, :]).astype(m.dtype)
            return jnp.einsum("ev,eh->vh", oh, m)

        variants = {
            "xla_scatter": (xla_scatter, (msg_d, recv_d)),
            "xla_scatter_sorted": (xla_scatter_sorted, (msg_s, recv_s)),
            "onehot_einsum": (onehot_einsum, (msg_d, recv_d)),
        }
        # pallas_full builds a [V, H] accumulator resident in VMEM: only
        # feasible for small V
        if V * H * 4 <= 8 * 2**20:
            variants["pallas_full"] = (
                lambda m, r: pallas_segment_sum(m, r, V), (msg_d, recv_d))
        tile_v = 256
        if V % tile_v == 0 or V > tile_v:
            v_pad = -(-V // tile_v) * tile_v
            rp = np.concatenate(
                [row_ptr, np.full(v_pad - V, row_ptr[-1], np.int32)])
            e_pad = len(msg_sorted) + 512
            ms = np.zeros((e_pad, H), np.float32)
            ms[: len(msg_sorted)] = msg_sorted
            rs = np.zeros(e_pad, np.int32)
            rs[: len(recv_sorted)] = recv_sorted
            rs[len(recv_sorted):] = v_pad  # out of range -> masked
            ms_d, rs_d, rp_d = jnp.asarray(ms), jnp.asarray(rs), jnp.asarray(rp)
            variants["pallas_csr"] = (
                lambda m, r, p: pallas_csr_segment_sum(m, r, p, v_pad,
                                                       tile_v=tile_v),
                (ms_d, rs_d, rp_d))

        # windowed pass-per-(chunk, window) kernel (ops/segment_kernel.py)
        from dualmessagepassing_tpu.ops import segment_kernel as sk

        plan = sk.build_pass_plan(recv_sorted, V, e_env=E, v_env=V)

        def mk_v5(mode, plan=plan, V=V):
            @jax.jit
            def f(m):
                return sk.windowed_segment_sum(m, plan, V, mode=mode)
            return f

        for mode in ("highest", "hilo"):
            variants[f"v5_windowed_{mode}"] = (mk_v5(mode), (msg_s,))

        # --- row-GATHER variants (the round-4 broadcast kernel's op:
        # rows[e] = table[recv[e]] for a receiver-sorted stream and a
        # [V, 128] bf16 table — the UNC forward endpoint gather) ---
        tbl = jnp.asarray(rng.normal(size=(V, 128)), jnp.bfloat16)
        bplan = sk.build_bcast_plan(recv_sorted, V, e_env=E, v_env=V)
        recv_col_d = jnp.asarray(plan["recv_col"])
        sb_d = tuple(jnp.asarray(bplan[k]) for k in ("blk", "win", "first"))

        @jax.jit
        def xla_gather_sorted(t, r):
            return t[r]

        @jax.jit
        def bcast_windowed(t):
            return sk.windowed_row_broadcast(t, recv_col_d, *sb_d)

        gather_bytes = E * 128 * 2 + V * 128 * 2 + E * 4
        gather_bound = gather_bytes / (HBM_GBPS * 1e9) * 1e3
        for name, (fn, a) in (
                ("gather_xla_sorted", (xla_gather_sorted, (tbl, recv_s))),
                ("gather_bcast_windowed", (bcast_windowed, (tbl,)))):
            ms = time_op(fn, a, args.iters)
            rows.append({
                "V": V, "E": E, "H": 128, "variant": name,
                "device_ms": None if ms is None else round(ms, 4),
                "roofline_ms": round(gather_bound, 4),
                "x_roofline": None if ms is None
                else round(ms / gather_bound, 2),
            })
            print(json.dumps(rows[-1]), flush=True)

        ideal_bytes = E * H * 4 + V * H * 4 + E * 4
        bound_ms = ideal_bytes / (HBM_GBPS * 1e9) * 1e3
        for name, (fn, a) in variants.items():
            ms = time_op(fn, a, args.iters)
            rows.append({
                "V": V, "E": E, "H": H, "variant": name,
                "device_ms": None if ms is None else round(ms, 4),
                "roofline_ms": round(bound_ms, 4),
                "x_roofline": None if ms is None else round(ms / bound_ms, 2),
            })
            print(json.dumps(rows[-1]), flush=True)

    # relative table
    print("\n=== relative to xla_scatter (same size) ===")
    base = {(r["V"], r["E"]): r["device_ms"] for r in rows
            if r["variant"] == "xla_scatter" and r["device_ms"]}
    for r in rows:
        b = base.get((r["V"], r["E"]))
        if b and r["device_ms"]:
            print(f"V={r['V']:>6} E={r['E']:>7} {r['variant']:>20}: "
                  f"{r['device_ms']:8.3f} ms  "
                  f"{b / r['device_ms']:5.2f}x of scatter  "
                  f"{r['x_roofline']:6.2f}x roofline")


if __name__ == "__main__":
    main()
