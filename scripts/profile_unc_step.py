"""Per-fusion (un-stripped op name) breakdown of the UNC train step.

The SCM step got this treatment in round 3 (ARCHITECTURE §8.6) and the
top op turned out to be a 25x-off-roofline gather; the UNC step at the
Yelp-ish envelope runs at raw MFU ~0.005 (116 ms for 119 GFLOP and a
few GB of HBM traffic) — far below even a bandwidth-bound estimate —
and had never been dissected. Same method as profile_fusions.py but on
bench.build_unc_step (the BENCH_WORKLOAD=unc program).

Usage: python scripts/profile_unc_step.py [iters] [top_n]
Env:   BENCH_AMP / BENCH_UNC_BACKEND / BENCH_UNC_V / BENCH_UNC_E as in
       bench.py.
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax

    from bench import build_unc_step

    v = int(os.environ.get("BENCH_UNC_V", "65536"))
    e = int(os.environ.get("BENCH_UNC_E", "524288"))
    advance, state, flops = build_unc_step(v, e)
    for _ in range(2):
        state = advance(state)
    jax.block_until_ready(state[3])
    logdir = tempfile.mkdtemp(prefix="uncprof_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            state = advance(state)
        jax.block_until_ready(state[3])

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    data = json.load(gzip.open(paths[-1]))
    evs = data.get("traceEvents", [])
    names = {}
    for ev in evs:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    per_op = defaultdict(lambda: [0.0, 0, None])
    total = 0.0
    for ev in evs:
        if ev.get("ph") != "X":
            continue
        if not names.get((ev["pid"], ev.get("tid")), "").startswith("XLA Ops"):
            continue
        rec = per_op[ev.get("name", "")]
        rec[0] += ev.get("dur", 0.0)
        rec[1] += 1
        if rec[2] is None:
            rec[2] = ev.get("args", {})
        total += ev.get("dur", 0.0)
    print(f"V={v} E={e} iters={iters} flops/step={flops:.3e} "
          f"ops-lane total {total / 1e3 / iters:.2f} ms/step")
    for name, (us, n, args) in sorted(per_op.items(),
                                      key=lambda kv: -kv[1][0])[:top_n]:
        print(f"\n  {us / 1e3 / iters:9.3f} ms/step  x{n // iters:<4d} "
              f"{100 * us / max(total, 1e-9):5.1f}%  {name}")
        if args:
            for k in ("long_name", "tf_op", "shape"):
                if k in args:
                    print(f"        {k}: {str(args[k])[:300]}")


if __name__ == "__main__":
    main()
