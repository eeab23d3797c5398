"""Top-op breakdown of the flagship train step from the device trace.

Sums per-event durations in the "XLA Ops" / "XLA Modules" lanes of the
Chrome trace and prints the top fusions by total device time — the map
for kernel-level optimization work.

Usage: python scripts/profile_ops.py [bsz] [iters] [top_n]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    import jax

    from bench import build_step

    advance, state, flops = build_step(bsz)
    for _ in range(2):
        state = advance(state)
    jax.block_until_ready(state)
    logdir = tempfile.mkdtemp(prefix="opprof_")
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
    per_op = defaultdict(float)
    total = 0.0
    module_total = 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        lane = names.get((e["pid"], e.get("tid")), "")
        if lane == "XLA Modules":
            module_total += e.get("dur", 0.0)
        if not lane.startswith("XLA Ops"):
            continue
        # strip uniquing suffixes: fusion.1234 -> fusion
        name = re.sub(r"[.\d]+$", "", e.get("name", ""))
        per_op[name] += e.get("dur", 0.0)
        total += e.get("dur", 0.0)
    print(f"bsz={bsz} iters={iters} flops/step={flops:.3e}")
    print(f"module total {module_total/1e3/iters:.2f} ms/step; "
          f"ops lane total {total/1e3/iters:.2f} ms/step")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {us/1e3/iters:9.3f} ms/step  {100*us/max(total,1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
