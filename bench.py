"""Benchmark harness: DMPNN training-step throughput on the flagship config.

Measures edges/second (pattern+graph edges, reversed included) of the full
jitted training step (forward + backward + AdamW update) on the Complex
dataset envelope (reference README.md:88-92: pattern 8V/8E, graph 64V/256E,
16 labels) with reversed-edge augmentation — the heaviest published SCM
configuration.

Timing method (round-2 rework; round-1 VERDICT "what's weak" #1):
  * the PRIMARY clock is the DEVICE trace — steps run under
    jax.profiler.trace and per-step time is the "XLA Modules" lane of the
    exported Chrome trace. Host-side clocks through the remote-dispatch
    relay are untrustworthy in BOTH directions (block_until_ready measured
    1 ms for a 91 ms step in one session and 437 ms for a 376 ms step in
    another); the device trace is the only witness of chip execution.
  * FLOPs/step come from compiled.cost_analysis(); the run FAILS (exit 1)
    if the implied MFU exceeds 1.0 of the v5e bf16 peak — a physically
    impossible number means the clock lied.
  * a batch-size scaling check (BENCH_SCALECHECK=1, default on) re-times
    at bsz/4 and fails if step time does not grow with batch size.

By default the step runs the production mixed-precision configuration
(bf16 compute, f32 master params — utils/amp.py, validated by
tests/test_amp.py; disclosed as "amp": true in the JSON). BENCH_AMP=0
measures pure f32: 90.9 ms vs 51.7 ms at bsz 2048 on v5e (1.76x).
vs_baseline is DELIBERATELY against the round-1 f32 model
(BASELINE_BENCH.json): mixed precision is one of the round-2 model
improvements being measured, not a change of measurement conditions —
use BENCH_AMP=0 for a like-for-like f32 comparison.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
`vs_baseline` compares against BASELINE_BENCH.json in the repo root —
re-anchored in round 2 with this device-trace method on the round-1 model
(376.4 ms/step at bsz 2048 => 2.87M edges/s; the reference publishes no
throughput numbers, BASELINE.md).

Workloads (BENCH_WORKLOAD):
  scm (default)  SCM train step (above).
  unc            UNC train step, Yelp-ish envelope (main_unc docstring).
  scm_infer      forward-only SCM serving latency/throughput — mirrors the
                 reference's per-sample eval forward time (train.py:939-940).
  unc_infer      forward-only UNC embedding export (main.py:184-209), the
                 full-graph eval pass. Anchors: BASELINE_BENCH_*_INFER.json
                 (own f32 starting points; amp/windowed are the deltas).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np
from typing import Optional

# v5e peak: ~197 TFLOP/s bf16, ~99 TFLOP/s f32. Use bf16 peak (default
# matmul precision on TPU is bf16) — conservative for the MFU<=1 gate.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))


def device_ms_per_step(logdir: str, iters: int):
    """Per-step device time from the newest Chrome trace under logdir.

    Sums the "XLA Modules" lane (one event per executed XLA program) on
    every device plane. Returns None if no trace was produced (e.g. CPU
    test runs where the profiler plugin is absent)."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        return None
    data = json.load(gzip.open(paths[-1]))
    evs = data.get("traceEvents", [])
    lane_names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    total_us = 0.0
    n = 0
    for e in evs:
        if e.get("ph") != "X":
            continue
        if lane_names.get((e["pid"], e.get("tid"))) == "XLA Modules":
            total_us += e.get("dur", 0.0)
            n += 1
    if n == 0:
        return None
    # n may exceed iters (e.g. stray dispatches); normalize by events seen
    # of the dominant module — in practice the train step is the only
    # program running, so total/iters is the honest per-step time.
    return total_us / 1e3 / max(iters, 1)


def time_step(advance, state, iters: int):
    """(device_ms, host_blocked_ms) for `iters` calls of state = advance(state)."""
    import jax

    for _ in range(2):   # warmup
        state = advance(state)
    jax.block_until_ready(state)

    logdir = tempfile.mkdtemp(prefix="bench_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            state = advance(state)
        jax.block_until_ready(state)
    host_ms = (time.perf_counter() - t0) / iters * 1e3
    dev_ms = device_ms_per_step(logdir, iters)
    return dev_ms, host_ms


def build_step(bsz: int, anchor: bool = False):
    """anchor=True builds the in-session baseline variant: f32 (amp off),
    unchunked, default scatter — the closest same-code stand-in for the
    BASELINE_BENCH.json round-1 program (whose exact model predates the
    round-2/3 lookup rework and cannot be rebuilt); the JSON labels the
    ratio accordingly (round-5, VERDICT r4 item 4)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dualmessagepassing_tpu import build_model
    from __graft_entry__ import _flagship_config, _make_batch

    cfg = _flagship_config()
    sm = os.environ.get("BENCH_SCATTER")
    if sm:
        cfg = cfg.replace(scatter_method=sm)
    # BENCH_HID widens the model off the flagship hid=64 (NOT a headline
    # config — an MFU-vs-width probe of the §8.6 feed-roofline claim:
    # arithmetic intensity scales ~H/4 FLOP/byte, so MFU should rise
    # near-linearly with H if the step is feed-bound, flat if it is not)
    hid = int(os.environ.get("BENCH_HID", "64"))
    if hid != 64:
        cfg = cfg.replace(hid_dim=hid, pred_hid_dim=hid)
    model = build_model(cfg)
    pattern, graph = _make_batch(bsz, 8, 8, 64, 256, 16, 16)
    counts = jnp.asarray(
        np.random.default_rng(0).poisson(4.0, size=(bsz, 1)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pattern, graph)
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)

    # bf16 compute with f32 master params is the framework's production
    # training configuration (validated: tests/test_amp.py learning +
    # gradient-alignment gates); BENCH_AMP=0 measures pure f32
    amp = os.environ.get("BENCH_AMP", "1") == "1" and not anchor

    def loss_fn(p, pattern, graph, counts):
        if amp:
            # bf16 forward/backward, f32 master params + loss (utils/amp.py)
            from dualmessagepassing_tpu.utils.amp import (cast_floats,
                                                          compute_dtype_scope)

            with compute_dtype_scope(jnp.bfloat16):
                out = model.apply(cast_floats(p, jnp.bfloat16),
                                  cast_floats(pattern, jnp.bfloat16),
                                  cast_floats(graph, jnp.bfloat16))
            out = cast_floats(out, jnp.float32)
        else:
            out = model.apply(p, pattern, graph)
        c_loss = jnp.mean((out["pred_c"] - counts) ** 2)
        v_loss = jnp.mean(out["pred_v"] ** 2)
        e_loss = jnp.mean(out["pred_e"] ** 2)
        return c_loss + 0.1 * (v_loss + e_loss)

    # BENCH_CHUNKS=k scans the batch as k equal microbatches inside the
    # one jitted step (identical mean gradient; each chunk's activations
    # stay in VMEM instead of spilling [B, E, H] intermediates to HBM —
    # see scm_driver.make_train_step(accum_chunks))
    # auto by default (round-5, mirroring make_train_step): ~128-pair
    # chunks — the measured best at every batch (§8.5 chunk sweep);
    # bsz<=128 stays unchunked, so the headline config is unchanged
    chunks = 1 if anchor else _effective_chunks(bsz)
    if chunks > 1 and bsz % chunks:
        chunks = 1   # indivisible batch (e.g. the scale-check bsz/4 rerun)

    def train_step(params, opt_state, pattern, graph, counts):
        if chunks <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, pattern, graph, counts)
        else:
            def split(x):
                return x.reshape((chunks, x.shape[0] // chunks) + x.shape[1:])

            xs = jax.tree.map(split, (pattern, graph, counts))

            def body(g_acc, chunk):
                l, g = jax.value_and_grad(loss_fn)(params, *chunk)
                return jax.tree.map(jnp.add, g_acc, g), l

            g_sum, ls = jax.lax.scan(
                body, jax.tree.map(jnp.zeros_like, params), xs)
            grads = jax.tree.map(lambda g: g / chunks, g_sum)
            loss = ls.mean()
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = jax.jit(train_step, donate_argnums=(0, 1)).lower(
        params, opt_state, pattern, graph, counts).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))
    if chunks > 1:
        # cost_analysis counts the lax.scan BODY once, not `chunks`
        # times (measured: hid=128 reports 98.7e9 at chunks=2 vs
        # 197.4e9 unchunked — exactly the body share). Scale the
        # model/grad share back up; the once-per-step optimizer tail it
        # also multiplies is <1% of the total at these shapes.
        flops *= chunks

    def advance(state):
        p, o, _loss = compiled(state[0], state[1], pattern, graph, counts)
        return (p, o, _loss)

    return advance, (params, opt_state, counts), flops


def _effective_chunks(bsz: int) -> int:
    """The chunk count build_step actually uses (BENCH_CHUNKS=0 = auto)."""
    chunks = int(os.environ.get("BENCH_CHUNKS", "0"))
    if chunks == 0:
        chunks = max(bsz // 128, 1)
        while bsz % chunks:
            chunks -= 1
    return chunks


def measure(bsz: int, iters: int, anchor: bool = False):
    advance, state0, flops = build_step(bsz, anchor=anchor)
    dev_ms, host_ms = time_step(advance, state0, iters)
    return dev_ms, host_ms, flops


def unc_lever_flags(h: int = 50, anchor: bool = False) -> dict:
    """Resolve the UNC lever env flags ONCE (attach, model, and JSON all
    read this), with *_effective derived the same way the model/driver
    gate the kernel paths — a recorded flag must describe the program
    that actually ran (round-4 A/B artifacts are keyed on these).

    anchor=True ignores the env and returns the BASELINE_BENCH_UNC.json
    variant (f32, XLA scatter, no levers) so main_unc can re-measure the
    anchor IN THE SAME SESSION — cross-session drift on this rig is ±26%
    with byte-identical code (ARCHITECTURE §8.7), so only a same-process
    ratio is trustworthy (round-5, VERDICT r4 item 4)."""
    env = os.environ.get
    if anchor:
        env = {"BENCH_AMP": "0", "BENCH_UNC_BACKEND": "xla",
               "BENCH_UNC_ENDPOINTS": "split", "BENCH_UNC_PADCOLS": "0",
               "BENCH_UNC_SENDWIN": "0", "BENCH_UNC_RECVBCAST": "0"}.get
    amp = env("BENCH_AMP", "1") == "1"
    backend = env("BENCH_UNC_BACKEND", "windowed")
    endpoints = env("BENCH_UNC_ENDPOINTS", "split")
    pad_cols = env("BENCH_UNC_PADCOLS", "1") == "1"
    sendwin = env("BENCH_UNC_SENDWIN", "1") == "1"
    recv_bcast = env("BENCH_UNC_RECVBCAST", "1") == "1"
    fits = 2 * h + 1 <= 128      # the cotangent kernels' 128-lane tile
    base = amp and backend == "windowed" and endpoints != "fused" and fits
    return {
        "amp": amp, "backend": backend, "endpoints": endpoints,
        "pad_cols": pad_cols, "sendwin": sendwin,
        "recv_bcast": recv_bcast,
        "sendwin_effective": bool(sendwin and base),
        "recv_bcast_effective": bool(recv_bcast and base and pad_cols),
    }


def build_unc_step(v: int, e: int, h: int = 50, layers: int = 2,
                   s: int = 60000, anchor: bool = False):
    """Real UNC train step (driver's make_unc_train_step) on a synthetic
    receiver-sorted Yelp-ish envelope — the scale workload's benchmark.

    The default composition is the measured best full-step variant
    (ARCHITECTURE §8.3/§8.7, device-trace verified): sorted edges +
    windowed kernel + bf16 amp + 128-lane endpoint column table
    (BENCH_UNC_PADCOLS=0 opts out; +15% at V=65k, neutral at 262k).
    BENCH_AMP=0 -> f32; BENCH_UNC_BACKEND=xla -> sorted XLA scatter.
    The reference has no throughput number anywhere (train.py:939-940 is
    per-sample eval latency only) — the anchor is BASELINE_BENCH_UNC.json,
    this harness's own f32/unsorted starting point."""
    import jax
    import jax.numpy as jnp
    import optax

    from dualmessagepassing_tpu.unc.driver import make_unc_train_step
    from dualmessagepassing_tpu.unc.model import (UNCTrainModel,
                                                  init_unc_variables)

    R = 3
    rng = np.random.default_rng(0)
    senders = rng.integers(0, v, e).astype(np.int32)
    receivers = rng.integers(0, v, e).astype(np.int32)
    order = np.argsort(receivers, kind="stable")
    sub_np = {
        "nid": np.arange(v, dtype=np.int64),
        "senders": senders[order],
        "receivers": receivers[order],
        "edge_type": rng.integers(0, 2 * R, e).astype(np.int32)[order],
        "rev_flag": (rng.random(e) < 0.5)[order],
        "edge_mask": np.ones(e, bool),
        "node_mask": np.ones(v, bool),
        "edge_norm": (1.0 / np.maximum(
            np.bincount(receivers, minlength=v)[receivers], 1)
        ).astype(np.float32)[order][:, None],
        "samples": np.stack([
            rng.integers(0, v, s), rng.integers(0, R, s),
            rng.integers(0, v, s)], 1).astype(np.int64),
        "labels": (rng.random(s) < 0.2).astype(np.float32),
        "sample_mask": np.ones(s, bool),
    }
    # host-precomputed accelerators, as pad_subgraph ships in production
    # (global out-degrees + the sender-sort permutation for the sorted
    # backward-scatter fast path — unc/model._take_rows_perm); the
    # in-session anchor variant drops them (pre-optimization program)
    if not anchor:
        sub_np["out_deg"] = np.bincount(
            sub_np["senders"], minlength=v).astype(np.float32)
        so = np.argsort(sub_np["senders"], kind="stable")
        sub_np["send_order"] = so.astype(np.int64)
        sub_np["senders_sorted"] = sub_np["senders"][so]
    # BENCH_UNC_ENDPOINTS=fused: one gather over the concatenated [2E]
    # endpoint stream (one sorted cotangent scatter per layer instead of
    # two) — round-4 experiment, VERDICT r3 item 5a
    if os.environ.get("BENCH_UNC_ENDPOINTS") == "fused":
        from dualmessagepassing_tpu.unc.data import add_pair_keys

        sub_np = add_pair_keys(sub_np)
    # windowed is the measured-best production composition after the
    # round-3 gather-VJP restructure (52.5 ms vs 55.9 xla at this
    # envelope — the kernel's margin returned once the scatter share
    # grew; ARCHITECTURE §8.3)
    flags = unc_lever_flags(h, anchor=anchor)
    backend = flags["backend"]
    if backend == "windowed":
        from dualmessagepassing_tpu.ops.segment_kernel import \
            attach_scatter_plan

        # plans are attached only when the lever is EFFECTIVE (fully
        # gated in the model), so sb_*/sk2_* presence — and therefore
        # the program measured — matches the *_effective JSON flags
        sub_np = attach_scatter_plan(
            sub_np,
            sender_plan=flags["sendwin_effective"],
            bcast_plan=flags["recv_bcast_effective"])
    sub = {k: jnp.asarray(val) for k, val in sub_np.items()}
    amp = flags["amp"]

    model = UNCTrainModel(
        num_nodes=v, num_rels=R, h_dim=h, nlabel=0,
        num_hidden_layers=layers, dropout=0.2, reg_param=0.01,
        backbone="DMPNN", sorted_edges=not anchor,  # anchor: unsorted hint
        scatter_backend=backend, pad_cols=flags["pad_cols"])
    variables = init_unc_variables(model, jax.random.PRNGKey(0), sub)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    step = make_unc_train_step(model, tx, amp=amp)
    compiled = step.lower(params, opt, stats, sub,
                          jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))

    # hoisted: an eager PRNGKey() per advance serializes two ~0.6 ms
    # jit(_threefry_seed) programs into the measured device stream
    # (1.2 ms of the step time was harness RNG, not the step)
    key = jax.random.PRNGKey(2)

    def advance(state):
        p, o, st, loss = compiled(state[0], state[1], state[2], sub, key)
        return (p, o, st, loss)

    return advance, (params, opt, stats), flops


def measure_unc(v: int, e: int, iters: int, anchor: bool = False):
    advance, state0, flops = build_unc_step(v, e, anchor=anchor)
    dev_ms, host_ms = time_step(advance, state0, iters)
    return dev_ms, host_ms, flops


def _drift_vs_pinned(value: float, pinned_name: str, metric: str) -> dict:
    """this session's default-config number vs the round-pinned artifact
    of the SAME config — cross-session drift is ±26% on this rig
    (ARCHITECTURE §8.7), and a ratio field that says so beats a silent
    stale comparison (round-5, VERDICT r4 item 4)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        pinned_name)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        rec = json.load(f)
    if rec.get("metric") != metric and "tail" in rec:
        # driver-written round artifacts wrap the bench line in "tail"
        for line in rec["tail"].splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if cand.get("metric") == metric:
                    rec = cand
                    break
    pinned = rec.get("value") if rec.get("metric") == metric else None
    if not pinned:
        return {}
    return {"drift_vs_pinned": round(value / pinned, 3),
            "pinned_artifact": pinned_name}


def main_unc():
    """BENCH_WORKLOAD=unc: one JSON line for the UNC scale workload."""
    v = int(os.environ.get("BENCH_UNC_V", "65536"))
    e = int(os.environ.get("BENCH_UNC_E", "524288"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    scale_check = os.environ.get("BENCH_SCALECHECK", "1") == "1"

    dev_ms, host_ms, flops = measure_unc(v, e, iters)
    clock = "device_trace"
    step_ms = dev_ms
    if step_ms is None:
        clock = "host_blocked"
        step_ms = host_ms

    mfu = flops / (step_ms / 1e3) / PEAK_FLOPS
    eps = e / (step_ms / 1e3)

    err = None
    if mfu > 1.0:
        err = (f"IMPOSSIBLE: apparent MFU {mfu:.2f} > 1.0 "
               f"({flops:.3e} FLOP in {step_ms:.3f} ms) — clock is lying")

    scale_ratio = None
    if scale_check and err is None:
        small_dev, small_host, _ = measure_unc(v, e // 4,
                                               max(iters // 2, 3))
        # compare like clocks ONLY (device vs host disagree by up to 90x
        # through the relay — a cross-clock ratio is meaningless)
        small_ms = small_dev if clock == "device_trace" else small_host
        if small_ms:
            scale_ratio = step_ms / max(small_ms, 1e-9)
            if scale_ratio < 1.5:
                err = (f"SCALE CHECK FAILED: step(E={e})={step_ms:.2f} ms vs "
                       f"step(E={e // 4})={small_ms:.2f} ms (ratio "
                       f"{scale_ratio:.2f} < 1.5) — timing not tracking compute")

    vs = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_BENCH_UNC.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            ref = json.load(f).get("unc_train_edges_per_sec")
        if ref:
            vs = eps / ref

    out = {
        "metric": "unc_train_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
        "v": v, "e": e,
        "step_ms": round(step_ms, 3),
        "clock": clock,
        "host_step_ms": round(host_ms, 3),
        "flops_per_step": flops,
        "mfu": round(mfu, 4),
        # round-4 lever flags — recorded so A/B artifacts are
        # self-describing; resolved ONCE in unc_lever_flags so the
        # attach/model/JSON always agree on the program measured
        **unc_lever_flags(),
    }
    if scale_ratio is not None:
        out["scale_ratio_4x"] = round(scale_ratio, 2)
    # re-measure the ANCHOR variant (f32/unsorted/XLA — the
    # BASELINE_BENCH_UNC.json program) in this same process: the
    # cross-session vs_baseline above carries ±26% session drift
    # (ARCHITECTURE §8.7); this ratio does not. BENCH_INSESSION_ANCHOR=0
    # opts out (e.g. ablation sweeps that only need the default row).
    if (os.environ.get("BENCH_INSESSION_ANCHOR", "1") == "1"
            and err is None and clock == "device_trace"):
        a_dev, a_host, _ = measure_unc(v, e, max(iters // 2, 3),
                                       anchor=True)
        if a_dev:
            out["anchor_step_ms"] = round(a_dev, 3)
            out["vs_baseline_in_session"] = round(a_dev / step_ms, 3)
    if v == 65536 and e == 524288:  # drift only vs the SAME envelope
        out.update(_drift_vs_pinned(eps, "BENCH_UNC_r04.json",
                                    "unc_train_edges_per_sec"))
    if err:
        out["error"] = err
    print(json.dumps(out))
    if err:
        sys.exit(1)


def build_scm_infer(bsz: int):
    """Forward-only SCM inference step (the serving path): the reference's
    only latency metric is eval forward time per sample
    (SubgraphCountingMatching/train.py:939-940, no published value).
    Same flagship Complex envelope and amp default as the train bench."""
    import jax
    import jax.numpy as jnp

    from dualmessagepassing_tpu import build_model
    from __graft_entry__ import _flagship_config, _make_batch

    cfg = _flagship_config()
    model = build_model(cfg)
    pattern, graph = _make_batch(bsz, 8, 8, 64, 256, 16, 16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pattern, graph)
    amp = os.environ.get("BENCH_AMP", "1") == "1"

    def forward(p, pattern, graph):
        if amp:
            from dualmessagepassing_tpu.utils.amp import (cast_floats,
                                                          compute_dtype_scope)

            with compute_dtype_scope(jnp.bfloat16):
                out = model.apply(cast_floats(p, jnp.bfloat16),
                                  cast_floats(pattern, jnp.bfloat16),
                                  cast_floats(graph, jnp.bfloat16))
            return cast_floats(out["pred_c"], jnp.float32)
        return model.apply(p, pattern, graph)["pred_c"]

    compiled = jax.jit(forward).lower(params, pattern, graph).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))

    # iterations are independent programs; the TPU executes queued
    # programs in order on one stream and the XLA-Modules lane sums
    # every execution, so no dependency threading is needed
    def advance(state):
        return (compiled(params, pattern, graph),)

    return advance, (jnp.zeros((1, 1), jnp.float32),), flops


def build_unc_infer(v: int, e: int):
    """Forward-only UNC inference (the embedding-export serving path,
    unc/driver.py:make_unc_embed_step; reference main.py:184-209 exports
    embeddings with the trained model in eval mode)."""
    import jax
    import jax.numpy as jnp

    from dualmessagepassing_tpu.unc.model import (UNCTrainModel,
                                                  apply_unc_forward,
                                                  init_unc_variables)

    h = int(os.environ.get("BENCH_UNC_H", "50"))
    R = 3
    rng = np.random.default_rng(0)
    senders = rng.integers(0, v, e).astype(np.int32)
    receivers = rng.integers(0, v, e).astype(np.int32)
    order = np.argsort(receivers, kind="stable")
    sub_np = {
        "nid": np.arange(v, dtype=np.int64),
        "senders": senders[order],
        "receivers": receivers[order],
        "edge_type": rng.integers(0, 2 * R, e).astype(np.int32)[order],
        "rev_flag": (rng.random(e) < 0.5)[order],
        "edge_mask": np.ones(e, bool),
        "node_mask": np.ones(v, bool),
        "edge_norm": (1.0 / np.maximum(
            np.bincount(receivers, minlength=v)[receivers], 1)
        ).astype(np.float32)[order][:, None],
        "samples": np.zeros((8, 3), np.int64),
        "labels": np.zeros(8, np.float32),
        "sample_mask": np.zeros(8, bool),
    }
    sub_np["out_deg"] = np.bincount(
        sub_np["senders"], minlength=v).astype(np.float32)
    flags = unc_lever_flags(h)
    backend = flags["backend"]
    if backend == "windowed":
        from dualmessagepassing_tpu.ops.segment_kernel import \
            attach_scatter_plan

        # recv_bcast on here too: back-to-back A/B reads 9.53 vs 9.61 ms
        # (+0.9% for the kernel). A cross-phase comparison first read it
        # as a 5% loss — that was session drift (§9), the within-minutes
        # A/B is the signal.
        sub_np = attach_scatter_plan(
            sub_np, bcast_plan=flags["recv_bcast_effective"])
    sub = {k: jnp.asarray(val) for k, val in sub_np.items()}
    amp = flags["amp"]

    model = UNCTrainModel(
        num_nodes=v, num_rels=R, h_dim=h, nlabel=0,
        num_hidden_layers=2, dropout=0.0, reg_param=0.01,
        backbone="DMPNN", sorted_edges=True, scatter_backend=backend,
        pad_cols=flags["pad_cols"])
    variables = init_unc_variables(model, jax.random.PRNGKey(0), sub)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    key = jax.random.PRNGKey(1)

    def forward(p, st, sub):
        (out, _pred), _ = apply_unc_forward(model, p, st, sub, key,
                                            amp=amp, train=False)
        return out[0]

    compiled = jax.jit(forward).lower(params, stats, sub).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))

    def advance(state):
        emb = compiled(params, stats, sub)
        return (emb,)

    return advance, (jnp.zeros((v, h), jnp.float32),), flops


def main_infer(workload: str):
    """BENCH_WORKLOAD=scm_infer|unc_infer: forward-only serving bench."""
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    if workload == "scm_infer":
        bsz = int(os.environ.get("BENCH_BSZ", "512"))
        advance, state0, flops = build_scm_infer(bsz)
        dev_ms, host_ms = time_step(advance, state0, iters)
        denom_name, denom = "samples", bsz
        metric = "scm_infer_samples_per_sec"
        extras = {"bsz": bsz}
        base_name = "BASELINE_BENCH_SCM_INFER.json"
    else:
        v = int(os.environ.get("BENCH_UNC_V", "65536"))
        e = int(os.environ.get("BENCH_UNC_E", "524288"))
        advance, state0, flops = build_unc_infer(v, e)
        dev_ms, host_ms = time_step(advance, state0, iters)
        denom_name, denom = "edges", e
        metric = "unc_infer_edges_per_sec"
        extras = {"v": v, "e": e,
                  "backend": os.environ.get("BENCH_UNC_BACKEND", "windowed")}
        base_name = "BASELINE_BENCH_UNC_INFER.json"

    clock, step_ms = "device_trace", dev_ms
    if step_ms is None:
        clock, step_ms = "host_blocked", host_ms
    mfu = flops / (step_ms / 1e3) / PEAK_FLOPS
    rate = denom / (step_ms / 1e3)

    err = None
    if mfu > 1.0:
        err = (f"IMPOSSIBLE: apparent MFU {mfu:.2f} > 1.0 — clock is lying")

    # scaling gate (same spirit as the train benches; the MFU<=1 gate
    # alone is inert when cost_analysis has no flops -> mfu NaN)
    scale_ratio = None
    if os.environ.get("BENCH_SCALECHECK", "1") == "1" and err is None:
        if workload == "scm_infer":
            s_adv, s_state, _ = build_scm_infer(max(extras["bsz"] // 4, 1))
        else:
            s_adv, s_state, _ = build_unc_infer(extras["v"],
                                                extras["e"] // 4)
        s_dev, s_host = time_step(s_adv, s_state, max(iters // 2, 3))
        small_ms = s_dev if clock == "device_trace" else s_host
        if small_ms:   # like clocks only
            scale_ratio = step_ms / max(small_ms, 1e-9)
            if scale_ratio < 1.5:
                err = (f"SCALE CHECK FAILED: {step_ms:.2f} ms full vs "
                       f"{small_ms:.2f} ms at 1/4 size (ratio "
                       f"{scale_ratio:.2f} < 1.5) — timing not tracking"
                       " compute")

    vs = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             base_name)
    if os.path.exists(base_path):
        with open(base_path) as f:
            ref = json.load(f).get(metric)
        if ref:
            vs = rate / ref

    out = {
        "metric": metric, "value": round(rate, 1),
        "unit": f"{denom_name}/s", "vs_baseline": round(vs, 3),
        "step_ms": round(step_ms, 3), "clock": clock,
        "host_step_ms": round(host_ms, 3), "flops_per_step": flops,
        "mfu": round(mfu, 4),
        "amp": os.environ.get("BENCH_AMP", "1") == "1", **extras,
    }
    if scale_ratio is not None:
        out["scale_ratio_4x"] = round(scale_ratio, 2)
    if err:
        out["error"] = err
    print(json.dumps(out))
    if err:
        sys.exit(1)


def _probe_backend(timeout_s: float = 300.0) -> Optional[str]:
    """Initialize the device backend in a side thread with a timeout.

    The remote-dispatch relay has been observed to go fully dead for
    hours (jax.devices() hangs at PJRT init in every new process —
    CLAUDE.md); without this guard the bench hangs instead of reporting.
    Returns an error string on timeout/failure, None when healthy."""
    import threading

    result = {}

    def init():
        try:
            import jax

            result["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, don't raise in thread
            result["error"] = f"backend init failed: {e!r}"

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return (f"backend init did not complete within {timeout_s:.0f}s "
                "— remote-dispatch relay unreachable")
    return result.get("error")


def main():
    err = _probe_backend(float(os.environ.get("BENCH_INIT_TIMEOUT", "300")))
    if err:
        fail_metric = {
            "scm": ("scm_train_edges_per_sec", "edges/s"),
            "unc": ("unc_train_edges_per_sec", "edges/s"),
            "scm_infer": ("scm_infer_samples_per_sec", "samples/s"),
            "unc_infer": ("unc_infer_edges_per_sec", "edges/s"),
        }.get(os.environ.get("BENCH_WORKLOAD", "scm"),
              ("scm_train_edges_per_sec", "edges/s"))
        print(json.dumps({
            "metric": fail_metric[0], "value": 0.0,
            "unit": fail_metric[1], "vs_baseline": 0.0, "error": err}))
        sys.exit(1)

    prec = os.environ.get("BENCH_PRECISION")
    if prec:
        import jax
        jax.config.update("jax_default_matmul_precision", prec)

    workload = os.environ.get("BENCH_WORKLOAD", "scm")
    if workload == "unc":
        main_unc()
        return
    if workload in ("scm_infer", "unc_infer"):
        main_infer(workload)
        return

    # tracing through the remote-dispatch relay is slow host-side (~80 s
    # per traced step observed) — 5 iters is enough for a stable device
    # number and keeps the run under ~15 min.
    # Default bsz 128: the best device-trace throughput point of the full
    # chunk sweep (58.5M edges/s, MFU 0.255 — vs 20.9M at unchunked 2048,
    # whose [B, E, H] fusion intermediates spill VMEM; chunking recovers
    # the rate at any batch: 2048:16 = 58.2M. Sweep reproduced twice on
    # the live relay, ARCHITECTURE §8.5 / scripts/chunk_sweep.py).
    bsz = int(os.environ.get("BENCH_BSZ", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    scale_check = os.environ.get("BENCH_SCALECHECK", "1") == "1"

    dev_ms, host_ms, flops = measure(bsz, iters)
    clock = "device_trace"
    step_ms = dev_ms
    if step_ms is None:      # no trace (CPU run) -> host clock fallback
        clock = "host_blocked"
        step_ms = host_ms

    mfu = flops / (step_ms / 1e3) / PEAK_FLOPS
    # real (non-padded) edges per step: graph 256*2(rev) + pattern 8*2 per pair
    edges_per_step = bsz * (256 * 2 + 8 * 2)
    eps = edges_per_step / (step_ms / 1e3)

    err = None
    if mfu > 1.0:
        err = (f"IMPOSSIBLE: apparent MFU {mfu:.2f} > 1.0 "
               f"({flops:.3e} FLOP in {step_ms:.3f} ms) — clock is lying")

    scale_ratio = None
    if scale_check and err is None and bsz >= 4:
        small_dev, small_host, _ = measure(bsz // 4, max(iters // 2, 3))
        small_ms = small_dev if clock == "device_trace" else small_host
        if small_ms:   # like clocks only (see main_unc note)
            scale_ratio = step_ms / max(small_ms, 1e-9)
            if scale_ratio < 1.5:
                err = (f"SCALE CHECK FAILED: step({bsz})={step_ms:.2f} ms vs "
                       f"step({bsz // 4})={small_ms:.2f} ms (ratio "
                       f"{scale_ratio:.2f} < 1.5) — timing not tracking compute")

    vs = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_BENCH.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("scm_train_edges_per_sec")
        if ref:
            # edges/s compare directly across bsz (both are
            # saturated-device numbers)
            vs = eps / ref

    out = {
        "metric": "scm_train_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
        "bsz": bsz,
        "step_ms": round(step_ms, 3),
        "clock": clock,
        "host_step_ms": round(host_ms, 3),
        "flops_per_step": flops,
        "mfu": round(mfu, 4),
        "amp": os.environ.get("BENCH_AMP", "1") == "1",
        "chunks": _effective_chunks(bsz),
    }
    hid = int(os.environ.get("BENCH_HID", "64"))
    if hid != 64:
        out["hid"] = hid
    if scale_ratio is not None:
        out["scale_ratio_4x"] = round(scale_ratio, 2)
    # in-session anchor (f32 unchunked, SAME code/session — the closest
    # rebuildable stand-in for the round-1 program; cross-session
    # vs_baseline carries ±26% session drift, §8.7) + drift vs the
    # pinned round artifact. BENCH_INSESSION_ANCHOR=0 opts out.
    if (os.environ.get("BENCH_INSESSION_ANCHOR", "1") == "1"
            and err is None and clock == "device_trace" and hid == 64):
        a_dev, _a_host, _ = measure(bsz, max(iters // 2, 3), anchor=True)
        if a_dev:
            out["anchor_step_ms"] = round(a_dev, 3)
            out["vs_f32_in_session"] = round(a_dev / step_ms, 3)
    out.update(_drift_vs_pinned(eps, "BENCH_r04.json",
                                "scm_train_edges_per_sec"))
    if err:
        out["error"] = err
    print(json.dumps(out))
    if err:
        sys.exit(1)


if __name__ == "__main__":
    main()
