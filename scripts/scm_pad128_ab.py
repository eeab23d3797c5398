"""Within-session A/B: 128-lane table padding on the SCM step (round 5,
VERDICT r4 item 5 — "try the r4 toolkit on the SCM step").

The round-4 UNC levers (pad_cols, row-broadcast) live in the flat
sorted-stream / HBM-resident-table regime; the SCM step is batched
dense [B, V<=64, H=64] one-hot matmuls whose tables all fit VMEM. The
transferable piece is explicit 128-lane alignment of the encoding/
embedding table contractions (models/embed.py:_apply_table,
SCM_TABLE_PAD128=1). The row-broadcast kernel itself does not apply:
it requires a receiver-sorted flat edge stream and a >=VMEM-size
gather table, neither of which exists in the SCM step.

Both programs are built and traced in ONE process (same session —
cross-session drift is +/-26%, ARCHITECTURE §8.7). Emits one JSON line
per variant plus a verdict line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    bsz = int(os.environ.get("BENCH_BSZ", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    out = {}
    for flag in ("0", "1"):
        os.environ["SCM_TABLE_PAD128"] = flag
        dev_ms, host_ms, flops = bench.measure(bsz, iters)
        key = "pad128" if flag == "1" else "base"
        out[key] = {"device_ms": None if dev_ms is None
                    else round(dev_ms, 4),
                    "flops": flops}
        print(json.dumps({key: out[key]}), flush=True)
    os.environ.pop("SCM_TABLE_PAD128", None)
    if out["base"]["device_ms"] and out["pad128"]["device_ms"]:
        r = out["base"]["device_ms"] / out["pad128"]["device_ms"]
        print(json.dumps({"verdict": {
            "speedup_pad128": round(r, 4), "bsz": bsz,
            "note": "ratio > 1 means explicit 128-lane table padding "
                    "beats the XLA-default lowering"}}))


if __name__ == "__main__":
    main()
