"""Sweep (bsz, BENCH_CHUNKS) with the device-trace clock in ONE process.

Measures the flagship amp train step for each (bsz, chunks) config and
prints a JSON line per config — the data behind the bench defaults
(ARCHITECTURE.md §8.5: chunked scans keep each microbatch's activations
in VMEM, so the best config is a throughput tradeoff between VMEM
residency and per-chunk fixed cost).

Usage: python scripts/chunk_sweep.py "2048:1,2048:4,2048:16,512:1,512:4"
       (default sweep if no arg)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    spec = (sys.argv[1] if len(sys.argv) > 1
            else "2048:1,2048:4,2048:8,2048:16,1024:4,512:1,512:4,256:2,128:1")
    iters = int(os.environ.get("SWEEP_ITERS", "4"))
    configs = []
    for part in spec.split(","):
        b, c = part.split(":")
        configs.append((int(b), int(c)))

    import bench

    for bsz, chunks in configs:
        os.environ["BENCH_CHUNKS"] = str(chunks)
        try:
            advance, state, flops = bench.build_step(bsz)
            dev_ms, host_ms = bench.time_step(advance, state, iters)
            step_ms = dev_ms if dev_ms else host_ms
            eps = bsz * (256 * 2 + 8 * 2) / (step_ms / 1e3)
            print(json.dumps({
                "bsz": bsz, "chunks": chunks,
                "step_ms": round(step_ms, 3),
                "clock": "device_trace" if dev_ms else "host",
                "edges_per_sec": round(eps, 1),
                "mfu": round(flops / (step_ms / 1e3) / bench.PEAK_FLOPS, 4),
            }), flush=True)
        except Exception as e:  # keep sweeping past OOM/compile failures
            print(json.dumps({"bsz": bsz, "chunks": chunks,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
