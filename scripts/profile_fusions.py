"""Per-fusion (un-stripped op name) breakdown of the flagship train step.

profile_ops.py aggregates all `fusion.N` events into one "fusion" bucket;
this script keeps each HLO op distinct and prints its per-step time, call
count, and any provenance the trace carries (args.long_name / tf_op) —
the map for finding a single badly-scaling fusion.

Usage: python scripts/profile_fusions.py [bsz] [iters] [top_n]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax

    from bench import build_step

    advance, state, flops = build_step(bsz)
    for _ in range(2):
        state = advance(state)
    jax.block_until_ready(state)
    logdir = tempfile.mkdtemp(prefix="fuprof_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            state = advance(state)
        jax.block_until_ready(state)

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    data = json.load(gzip.open(paths[-1]))
    evs = data.get("traceEvents", [])
    names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    per_op = defaultdict(lambda: [0.0, 0, None])
    total = 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        lane = names.get((e["pid"], e.get("tid")), "")
        if not lane.startswith("XLA Ops"):
            continue
        name = e.get("name", "")
        rec = per_op[name]
        rec[0] += e.get("dur", 0.0)
        rec[1] += 1
        if rec[2] is None:
            rec[2] = e.get("args", {})
        total += e.get("dur", 0.0)
    print(f"bsz={bsz} iters={iters} flops/step={flops:.3e} "
          f"ops-lane total {total/1e3/iters:.2f} ms/step")
    for name, (us, n, args) in sorted(per_op.items(),
                                      key=lambda kv: -kv[1][0])[:top_n]:
        print(f"\n  {us/1e3/iters:9.3f} ms/step  x{n//iters:<4d} "
              f"{100*us/max(total,1e-9):5.1f}%  {name}")
        if args:
            for k in ("long_name", "tf_op", "shape", "layout",
                      "memory_bandwidth", "flops"):
                if k in args:
                    v = str(args[k])
                    print(f"        {k}: {v[:300]}")


if __name__ == "__main__":
    main()
