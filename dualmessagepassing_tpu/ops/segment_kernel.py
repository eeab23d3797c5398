"""Windowed pass-per-(chunk, window) segment-sum — the round-2 TPU kernel
that finally beats XLA's scatter at large V.

The op: ``out[v] = sum_{e: receivers[e] == v} messages[e]`` for a stream
SORTED BY RECEIVER (the repo's pad_subgraph convention), the aggregation
at the heart of every message-passing layer (SURVEY §2.3 "builtin
reducer"; reference DGL fn.sum call sites dmpnn.py:92, rgcn.py:96).

Design (all knobs host-precomputed, kernel = one matmul per pass):
  * the sorted edge stream is cut into fixed T-edge chunks; a chunk whose
    receivers span k W-row output windows is processed k times ("passes").
    Consecutive passes with the same chunk index re-use the DMA'd input
    block (Mosaic only re-copies when the BlockSpec index changes), so the
    stream is read from HBM exactly once;
  * the output BlockSpec revisions per window through a scalar-prefetched
    index map; the first pass touching a window OVERWRITES it (no zero
    init, no initialization read of garbage), later passes accumulate;
  * each pass builds a one-hot [T, W] on the VPU — the receiver column is
    compared against a LANE iota, never transposed — and contracts it with
    the [T, 128] message block over the sublane dim on the MXU;
  * empty windows get explicit zero passes (no stream edge can match an
    empty window, so their one-hot part is identically zero); trailing
    envelope-pad passes aim at a dump window beyond the real rows.

Measured on 1x TPU v5e (device-trace clock, V=82465, E=497664, H=64,
uniform random receivers; scripts/kernel_bench.py --v5):

    backend                      device_ms    vs best XLA
    xla_scatter (unsorted)          7.47
    xla_scatter_sorted              4.49         1.00x
    v5 mode="highest" (err 2e-6)    2.22         2.02x
    v5 mode="hilo"    (err 6e-5)    1.87         2.40x
    HBM roofline (H=64 ideal)       0.18

Residual distance to the roofline (~10x) decomposes into: the 128-lane
packing of H=64 messages (2x read), the VPU one-hot build (E*W compares),
the MXU one-hot contraction (E*W*128 MACs), and ~0.4us of fixed cost per
pass. mode="hilo" splits f32 messages into two exact bf16 halves and runs
two DEFAULT-precision matmuls against the (exactly representable) bf16
one-hot — 2 MXU passes instead of HIGHEST's 6 for ~1e-4-level accuracy;
mode="highest" reproduces f32 scatter to 2e-6.

Mosaic lessons added by this round (kept here with round 1's in
pallas_scatter.py):
  * A LANE->SUBLANE relayout (e.g. making a [1, T] row out of a [T, 1]
    column) inside the kernel costs ~16us per call — it singlehandedly
    made the round-2 CSR kernel 4.5x slower than this one. Keep per-edge
    scalars as COLUMNS and compare against lane iotas.
  * BlockSpec-pipelined HBM reads hit full bandwidth only with 128-lane
    rows: [T, 128] blocks stream at 671 GB/s, [T, 64] at 131 GB/s, and a
    [T, 1] column costs ~0.8us per block regardless of width (amortize it
    by covering 8 chunks per recv block).
  * XLA's gather FUSED with a lane-slice (``table[idx, :64]``) lowers
    catastrophically (29.7ms where the plain ``table[idx]`` row gather
    takes 0.11ms) — materialize gathers, slice separately.

Falls back to XLA scatter off-TPU (same semantics, tested equal).
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

# Tile knobs shared by the host planner and the in-model call sites (the
# model must know them statically to size the padded output). T=512/W=128
# won the v5e sweep (module docstring).
DEFAULT_TILE_E = 512
DEFAULT_WINDOW = 128

# sub-dict keys carrying a pass plan into the model (attach_scatter_plan)
PLAN_KEYS = ("sk_blk", "sk_win", "sk_first", "sk_recv")


def _envelope(e_env: int, v_env: int, tile_e: int, window: int):
    """Shared static-envelope math for BOTH planners — the broadcast
    plan's pass arrays index the scatter plan's recv_col blocks, so the
    two MUST round e_pad/v_pad/P_env identically."""
    v_pad = -(-v_env // window) * window
    e_pad = -(-e_env // (8 * tile_e)) * (8 * tile_e)
    p_env = e_pad // tile_e + v_pad // window + 2
    return v_pad, e_pad, p_env


def _check_stream(receivers_sorted: np.ndarray, num_nodes: int,
                  e_env: int, v_env: int) -> np.ndarray:
    recv = np.asarray(receivers_sorted, np.int64)
    if e_env < len(recv):
        raise ValueError(f"e_env={e_env} < stream length {len(recv)}")
    if v_env < num_nodes:
        raise ValueError(f"v_env={v_env} < num_nodes {num_nodes}")
    if len(recv) and (np.diff(recv) < 0).any():
        raise ValueError("receivers must be sorted (pad_subgraph order)")
    return recv


def build_pass_plan(receivers_sorted: np.ndarray, num_nodes: int,
                    e_env: int, v_env: int,
                    tile_e: int = DEFAULT_TILE_E,
                    window: int = DEFAULT_WINDOW) -> Dict[str, np.ndarray]:
    """Host-side static pass plan for a receiver-sorted edge stream.

    e_env / v_env are the ENVELOPE sizes (static across batches); the
    actual stream may be shorter. Returns arrays with static shapes:
      blk   [P_env] input chunk per pass
      win   [P_env] output window per pass
      first [P_env] 1 iff the pass is its window's first touch
      recv_col [E8, 1] int32 receiver per padded edge slot (pads -> dump)
    plus scalars v_pad (padded rows) and e_pad (padded edges, mult of 8T).
    """
    T, W = tile_e, window
    recv = _check_stream(receivers_sorted, num_nodes, e_env, v_env)
    E_real = len(recv)
    v_pad, e_pad, P_env = _envelope(e_env, v_env, T, W)
    n_windows = v_pad // W
    dump = n_windows

    # one pass per distinct (chunk, window) pair, in stream order
    chunk_of = np.arange(E_real) // T
    win_of = recv // W
    key = chunk_of * (n_windows + 1) + win_of
    uniq = np.unique(key)                      # sorted = stream order
    blk = (uniq // (n_windows + 1)).astype(np.int32)
    win = (uniq % (n_windows + 1)).astype(np.int32)
    # stream order makes win nondecreasing -> first touch = win changed
    first = np.ones(len(win), np.int32)
    first[1:] = (win[1:] != win[:-1]).astype(np.int32)
    # zero passes for windows no edge touches (first-touch writes zeros)
    touched = np.zeros(n_windows, bool)
    touched[win] = True
    empty = np.flatnonzero(~touched).astype(np.int32)
    last_blk = blk[-1] if len(blk) else np.int32(0)
    blk = np.concatenate([blk, np.full(len(empty), last_blk, np.int32)])
    win = np.concatenate([win, empty])
    first = np.concatenate([first, np.ones(len(empty), np.int32)])
    P = len(blk)
    if P > P_env:
        raise ValueError(f"pass count {P} exceeds envelope {P_env}")
    pad = P_env - P
    blk = np.concatenate([blk, np.full(pad, last_blk, np.int32)])
    win = np.concatenate([win, np.full(pad, dump, np.int32)])
    first_pad = np.zeros(pad, np.int32)
    if pad:
        first_pad[0] = 1
    first = np.concatenate([first, first_pad])

    recv_col = np.full((e_pad, 1), v_pad, np.int32)  # pads hit the dump win
    recv_col[:E_real, 0] = recv
    return {"blk": blk, "win": win, "first": first, "recv_col": recv_col,
            "v_pad": v_pad, "e_pad": e_pad, "tile_e": T, "window": W}


def _v5_kernel(blk_ref, win_ref, first_ref, msg_ref, recv_ref, out_ref,
               *, T, W, mode):
    import jax.experimental.pallas as pl

    p = pl.program_id(0)
    w = win_ref[p]
    c = blk_ref[p]
    sub = jax.lax.rem(c, 8)                    # my chunk inside the 8-chunk
    rcol = recv_ref[pl.ds(sub * T, T), :]      # recv block   [T, 1] int32
    local = rcol - w * W
    onehot_bool = (
        local == jax.lax.broadcasted_iota(jnp.int32, (T, W), 1))
    chunk = msg_ref[:]                         # [T, 128]
    dn = (((0,), (0,)), ((), ()))              # contract the sublane dim
    if mode == "highest":
        part = jax.lax.dot_general(
            onehot_bool.astype(jnp.float32), chunk, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "bf16":
        # bf16 INPUT stream, f32 accumulate: exactly XLA's semantics for
        # an f32-accumulating scatter of bf16 rows, in ONE MXU pass (the
        # values are already bf16 — there is no lo half to preserve)
        part = jax.lax.dot_general(
            onehot_bool.astype(jnp.bfloat16), chunk, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    else:  # "hilo": exact bf16 one-hot x (hi + lo) bf16 split, 2 passes
        onehot = onehot_bool.astype(jnp.bfloat16)
        hi = chunk.astype(jnp.bfloat16)
        lo = (chunk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        part = (jax.lax.dot_general(onehot, hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot, lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))

    @pl.when(first_ref[p] == 1)
    def _():
        out_ref[:] = part

    @pl.when(first_ref[p] == 0)
    def _():
        out_ref[:] += part


def windowed_segment_sum(messages: jnp.ndarray, plan: Dict[str, np.ndarray],
                         num_nodes: int, mode: str = "highest") -> jnp.ndarray:
    """messages [E, H] (receiver-sorted, H <= 128) -> [num_nodes, H].

    `plan` comes from build_pass_plan for the SAME sorted receiver stream
    and envelope. Differentiable in messages (VJP = one plain row gather).
    Masked/pad edges must carry zero messages (as pad_subgraph guarantees
    through the callers' edge-mask multiply).
    """
    e, h = messages.shape
    T, W = int(plan["tile_e"]), int(plan["window"])
    v_pad, e_pad = int(plan["v_pad"]), int(plan["e_pad"])
    if h > 128:
        raise ValueError("H must be <= 128 (split wider features)")
    msg128 = jnp.zeros((e_pad, 128), jnp.float32)
    msg128 = msg128.at[:e, :h].set(messages.astype(jnp.float32))
    out = _v5_call(msg128, jnp.asarray(plan["recv_col"]),
                   jnp.asarray(plan["blk"]), jnp.asarray(plan["win"]),
                   jnp.asarray(plan["first"]), v_pad, T, W, mode)
    return out[:num_nodes, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _v5_call(msg128, recv_col, blk, win, first, v_pad, T, W, mode):
    return _v5_impl(msg128, recv_col, blk, win, first, v_pad, T, W, mode)


# tests flip this to run the real kernel through the pallas interpreter
# on CPU (slow; small sizes only)
INTERPRET = False


def _v5_impl(msg128, recv_col, blk, win, first, v_pad, T, W, mode):
    if jax.default_backend() != "tpu" and not INTERPRET:
        # same semantics via XLA scatter (tests compare the two);
        # astype: the bf16 input mode still accumulates f32
        r = recv_col[: msg128.shape[0], 0]
        safe = jnp.minimum(r, v_pad + W - 1)
        return jnp.zeros((v_pad + W, 128), jnp.float32).at[safe].add(
            msg128.astype(jnp.float32), indices_are_sorted=True)[:v_pad]

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_v5_kernel, T=T, W=W, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(len(blk),),
        in_specs=[
            pl.BlockSpec((T, 128), lambda p, blk, win, first: (blk[p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * T, 1),
                         lambda p, blk, win, first: (blk[p] // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, 128),
                               lambda p, blk, win, first: (win[p], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad + W, 128), jnp.float32),
        interpret=INTERPRET,
    )(blk, win, first, msg128, recv_col)
    return out[:v_pad]


def attach_scatter_plan(padded: Dict[str, np.ndarray],
                        tile_e: int = DEFAULT_TILE_E,
                        window: int = DEFAULT_WINDOW,
                        sender_plan: bool = False,
                        bcast_plan: bool = False) -> Dict[str, np.ndarray]:
    """Add the windowed-kernel pass plan to a pad_subgraph dict (host side).

    The padded dict's edge arrays are already receiver-sorted with pad
    rows at the tail; the envelope (v_max, e_max) is taken from the array
    shapes, so every batch of a run shares one static plan shape. The
    model consumes the plan when UNCTrainModel(scatter_backend="windowed").

    sender_plan=True additionally ships a SECOND plan (sk2_*) built from
    the sorted SENDER stream, enabling the windowed sender-cotangent path
    (unc.model._take_rows_win_perm — the §8.3 'senders-sorted twin plan'
    for the large-V regime). Pad rows sort among the sender-0 rows and
    carry exactly-zero cotangents, so the plan treats the full stream as
    real.
    """
    v_max = len(padded["node_mask"])
    e_max = len(padded["receivers"])
    n_real = int(np.asarray(padded["edge_mask"]).sum())
    recv_real = np.asarray(padded["receivers"])[:n_real]
    plan = build_pass_plan(recv_real, v_max, e_env=e_max, v_env=v_max,
                           tile_e=tile_e, window=window)
    out = dict(padded)
    out["sk_blk"] = plan["blk"]
    out["sk_win"] = plan["win"]
    out["sk_first"] = plan["first"]
    out["sk_recv"] = plan["recv_col"]
    if bcast_plan:
        # twin plan for the forward windowed row-broadcast over the same
        # stream (unc/model.recv_bcast — the §8.3 large-V gather lever)
        bp = build_bcast_plan(recv_real, v_max, e_env=e_max, v_env=v_max,
                              tile_e=tile_e, window=window)
        out["sb_blk"] = bp["blk"]
        out["sb_win"] = bp["win"]
        out["sb_first"] = bp["first"]
    if sender_plan:
        if "senders_sorted" in out:
            send_sorted = np.asarray(out["senders_sorted"])
        else:
            so = np.argsort(np.asarray(out["senders"]), kind="stable")
            out["send_order"] = so.astype(np.int64)
            send_sorted = np.asarray(out["senders"])[so]
            out["senders_sorted"] = send_sorted
        plan2 = build_pass_plan(send_sorted, v_max, e_env=e_max,
                                v_env=v_max, tile_e=tile_e, window=window)
        out["sk2_blk"] = plan2["blk"]
        out["sk2_win"] = plan2["win"]
        out["sk2_first"] = plan2["first"]
        out["sk2_recv"] = plan2["recv_col"]
    return out


def plan_sk_arrays(recv_real: np.ndarray, v_env: int, e_env: int,
                   tile_e: int = DEFAULT_TILE_E,
                   window: int = DEFAULT_WINDOW) -> Dict[str, np.ndarray]:
    """build_pass_plan -> the sk_* key naming the model consumes.

    One shard's worth of plan: `recv_real` is the real (unpadded) prefix
    of a receiver-sorted edge stream, `v_env`/`e_env` the static node/edge
    envelope of that stream. Used per shard by parallel/ep_unc.py
    (contiguous slices of the global stream, full-V output) and
    parallel/halo_unc.py (owner-local streams, [Vp] output) so the
    windowed kernel runs inside shard_map with traced plan arrays."""
    plan = build_pass_plan(np.asarray(recv_real), v_env, e_env=e_env,
                           v_env=v_env, tile_e=tile_e, window=window)
    return {"sk_blk": plan["blk"], "sk_win": plan["win"],
            "sk_first": plan["first"], "sk_recv": plan["recv_col"]}


def plan_bcast_arrays(recv_real: np.ndarray, v_env: int, e_env: int,
                      tile_e: int = DEFAULT_TILE_E,
                      window: int = DEFAULT_WINDOW,
                      prefix: str = "sb",
                      with_recv: bool = False) -> Dict[str, np.ndarray]:
    """build_bcast_plan -> the {prefix}_* key naming the model consumes.

    One shard's worth of broadcast plan (the sharded twin of
    plan_sk_arrays): `recv_real` is the real prefix of a receiver-sorted
    stream, `v_env` the ROW ENVELOPE OF THE GATHER TABLE — under owner
    sharding the composite [owned; halo; dump] table is LARGER than the
    aggregation's [Vp] output, so the cols-gather plan (prefix='sbt')
    carries its own v_env and, via `with_recv=True`, its own receiver
    column whose pad slots map to THIS envelope's dump window (the
    aggregation-envelope sk_recv would alias pad rows into real halo
    rows)."""
    bp = build_bcast_plan(np.asarray(recv_real), v_env, e_env=e_env,
                          v_env=v_env, tile_e=tile_e, window=window)
    out = {f"{prefix}_blk": bp["blk"], f"{prefix}_win": bp["win"],
           f"{prefix}_first": bp["first"]}
    if with_recv:
        recv_col = np.full((bp["e_pad"], 1), bp["v_pad"], np.int32)
        recv_col[: len(recv_real), 0] = np.asarray(recv_real, np.int64)
        out[f"{prefix}_recv"] = recv_col
    return out


def segment_sum_windowed_arrays(messages, recv_col, blk, win, first,
                                num_nodes: int,
                                tile_e: int = DEFAULT_TILE_E,
                                window: int = DEFAULT_WINDOW,
                                mode: str = "hilo", out_width=None,
                                sb_blk=None, sb_win=None, sb_first=None):
    """In-model entry point: plan arrays are TRACED (they ride the sub
    pytree through jit/shard_map); only the tile knobs and num_nodes are
    static. messages [E, H] receiver-sorted with zeroed masked rows.

    FUSION NOTE: when H < 128 the [E, 128] kernel input costs a full
    materialization here. Hot callers should instead pad the PRODUCING
    matmul's weight columns to 128 (free on the MXU) and pass messages
    already 128 wide with E == recv_col rows — then this wrapper adds
    zero copies. `out_width` (default H) controls how many lanes of the
    result to return.
    """
    e, h = messages.shape
    e_pad = recv_col.shape[0]
    v_pad = -(-num_nodes // window) * window
    if messages.dtype == jnp.bfloat16 and mode == "hilo":
        # bf16 stream: keep it bf16 (half the input bytes, ONE MXU pass
        # instead of hilo's two, no f32 materialization buffer) — the
        # kernel still accumulates f32, so numerics match XLA's
        # f32-accumulating scatter of the same bf16 rows exactly
        mode = "bf16"
        if h == 128 and e == e_pad:
            msg128 = messages
        else:
            msg128 = jnp.zeros((e_pad, 128), jnp.bfloat16)
            msg128 = msg128.at[:e, :h].set(messages)
    elif h == 128 and e == e_pad:
        msg128 = messages.astype(jnp.float32)
    else:
        msg128 = jnp.zeros((e_pad, 128), jnp.float32)
        msg128 = msg128.at[:e, :h].set(messages.astype(jnp.float32))
    if sb_blk is not None and mode == "bf16":
        # windowed backward gather on the bcast twin plan (bf16 only —
        # the kernel's one-hot row copy is exact for bf16 tables)
        out = _v5_call_b(msg128, recv_col, blk, win, first,
                         sb_blk, sb_win, sb_first, v_pad, tile_e,
                         window, mode)
    else:
        out = _v5_call(msg128, recv_col, blk, win, first, v_pad, tile_e,
                       window, mode)
    w_out = out_width if out_width is not None else h
    return out[:num_nodes, :w_out].astype(messages.dtype)


# ---------------------------------------------------------------------------
# Windowed row-BROADCAST — the gather inverse of the kernel above.
#
# The op: ``rows[e] = table[receivers[e]]`` for the same receiver-sorted
# stream, i.e. the forward endpoint-table gather of the UNC layer
# (unc/model.py receiver branch). Motivation (ARCHITECTURE §8.3 large-V
# decomposition): once a [V, 128] endpoint table falls out of VMEM
# (V >= ~200k at H=50), XLA's row gather runs at ~40 GB/s from HBM
# (22-24 ms per gather at V=262k/E=2M) because it fetches one 256 B row
# per element with no locality exploitation — even though the receiver
# stream is SORTED, so consecutive edges hit the same or adjacent rows.
# This kernel streams the table through VMEM one W-row window at a time
# (each window DMA'd ~once — sequential HBM traffic) and emits each
# T-edge output chunk as one-hot [T, W] @ window [W, 128] MXU passes —
# the scatter kernel with input and output roles swapped:
#   * out BlockSpec revisits the edge CHUNK across its (few) windows;
#     first pass overwrites, later passes accumulate (each row receives
#     its value in exactly one pass, zeros elsewhere — bf16 += 0 exact);
#   * pad edge slots aim at the dump window (recv_col rows == v_pad);
#     dump passes zero their one-hot (they also cover otherwise
#     untouched all-pad chunks, which would hold garbage out-blocks);
#   * plan arrays (sb_*) are built by build_bcast_plan over the SAME
#     recv_col; the backward of a gather over this stream is the
#     windowed SCATTER above, so a custom VJP pairs the two kernels on
#     their twin plans (unc/model._take_rows_bcast).
# ---------------------------------------------------------------------------

BCAST_KEYS = ("sb_blk", "sb_win", "sb_first")


def build_bcast_plan(receivers_sorted: np.ndarray, num_nodes: int,
                     e_env: int, v_env: int,
                     tile_e: int = DEFAULT_TILE_E,
                     window: int = DEFAULT_WINDOW) -> Dict[str, np.ndarray]:
    """Pass plan for the broadcast kernel (one pass per (chunk, window)).

    Unlike build_pass_plan, EVERY edge chunk of the e_env envelope gets
    at least one pass (pad slots map to the dump window), because the
    output blocks are the chunks and an unvisited block would be
    garbage. Windows nobody touches need no pass (the table is input
    here). `first` marks the first pass of each CHUNK. Same P envelope:
    passes <= chunks + window transitions <= e_pad/T + v_pad/W + 1.
    """
    T, W = tile_e, window
    recv = _check_stream(receivers_sorted, num_nodes, e_env, v_env)
    E_real = len(recv)
    v_pad, e_pad, P_env = _envelope(e_env, v_env, T, W)
    n_windows = v_pad // W
    dump = n_windows
    recv_full = np.full(e_pad, v_pad, np.int64)
    recv_full[:E_real] = recv
    chunk_of = np.arange(e_pad) // T
    win_of = recv_full // W                      # pads -> dump
    key = chunk_of * (n_windows + 1) + win_of
    uniq = np.unique(key)                        # sorted = stream order
    blk = (uniq // (n_windows + 1)).astype(np.int32)
    win = (uniq % (n_windows + 1)).astype(np.int32)
    first = np.ones(len(blk), np.int32)
    first[1:] = (blk[1:] != blk[:-1]).astype(np.int32)
    P = len(blk)
    if P > P_env:
        raise ValueError(f"pass count {P} exceeds envelope {P_env}")
    pad = P_env - P
    last_blk = blk[-1] if len(blk) else np.int32(0)
    # pad passes accumulate a zeroed dump one-hot into the last chunk
    blk = np.concatenate([blk, np.full(pad, last_blk, np.int32)])
    win = np.concatenate([win, np.full(pad, dump, np.int32)])
    first = np.concatenate([first, np.zeros(pad, np.int32)])
    return {"blk": blk, "win": win, "first": first,
            "v_pad": v_pad, "e_pad": e_pad}


def _bcast_kernel(blk_ref, win_ref, first_ref, tbl_ref, recv_ref, out_ref,
                  *, T, W, dump):
    import jax.experimental.pallas as pl

    p = pl.program_id(0)
    w = win_ref[p]
    c = blk_ref[p]
    sub = jax.lax.rem(c, 8)                    # my chunk inside the 8-chunk
    rcol = recv_ref[pl.ds(sub * T, T), :]      # recv block   [T, 1] int32
    local = rcol - w * W
    onehot = jnp.logical_and(
        local == jax.lax.broadcasted_iota(jnp.int32, (T, W), 1),
        w != dump)                             # dump passes write zeros
    # one-hot row-select on the MXU: each output row is exactly one bf16
    # table row (single product, f32 accumulate exact, cast back bitwise)
    part = jax.lax.dot_general(
        onehot.astype(tbl_ref.dtype), tbl_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(first_ref[p] == 1)
    def _():
        out_ref[:] = part.astype(out_ref.dtype)

    @pl.when(first_ref[p] == 0)
    def _():
        out_ref[:] += part.astype(out_ref.dtype)


def windowed_row_broadcast(table: jnp.ndarray, recv_col: jnp.ndarray,
                           sb_blk, sb_win, sb_first,
                           tile_e: int = DEFAULT_TILE_E,
                           window: int = DEFAULT_WINDOW) -> jnp.ndarray:
    """table [Vt, 128] -> rows [e_pad, 128] == table[recv] in stream order.

    `recv_col` is the scatter plan's [e_pad, 1] receiver column (pad
    slots carry v_pad and come back ZERO rows, unlike an XLA gather of
    whatever index the padded stream holds — callers mask pad edges
    anyway); sb_* comes from build_bcast_plan over the same stream and
    envelope (v_env must match Vt's envelope: v_pad = ceil(Vt/W)*W).
    Forward-only — pair with the scatter kernel for the VJP
    (unc/model._take_rows_bcast).
    """
    v, h = table.shape
    if h != 128:
        raise ValueError("broadcast table must be 128 lanes (pad_cols)")
    T, W = tile_e, window
    v_pad = -(-v // W) * W
    dump = v_pad // W
    if v_pad != v:
        table = jnp.concatenate(
            [table, jnp.zeros((v_pad - v, h), table.dtype)])
    e_pad = recv_col.shape[0]

    if jax.default_backend() != "tpu" and not INTERPRET:
        r = recv_col[:, 0]
        safe = jnp.minimum(r, v_pad - 1)
        rows = table[safe]
        return jnp.where((r < v_pad)[:, None], rows,
                         jnp.zeros((), table.dtype))

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_bcast_kernel, T=T, W=W, dump=dump)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(len(sb_blk),),
        in_specs=[
            # dump passes read (and ignore) the last real window
            pl.BlockSpec(
                (W, 128),
                lambda p, blk, win, first: (
                    jnp.minimum(win[p], dump - 1), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * T, 1),
                         lambda p, blk, win, first: (blk[p] // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 128),
                               lambda p, blk, win, first: (blk[p], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, 128), table.dtype),
        interpret=INTERPRET,
    )(sb_blk, sb_win, sb_first, table, recv_col)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _v5_call_b(msg128, recv_col, blk, win, first, sb_blk, sb_win, sb_first,
               v_pad, T, W, mode):
    """_v5_call whose BACKWARD gather also runs windowed: the cotangent
    ``g[recv]`` row-broadcast goes through the Pallas kernel on the sb_*
    twin plan instead of an XLA row gather. Motivation (§8.3 large-V
    decomposition, round 4): at V >= ~200k the XLA form holds an
    [v_pad + W, 128] table in VMEM (S(1)) — freeing that residency is
    worth more than the gather itself. bf16 mode only (the cotangent is
    cast before the broadcast, same values as gather-then-cast)."""
    return _v5_impl(msg128, recv_col, blk, win, first, v_pad, T, W, mode)


def _v5_b_fwd(msg128, recv_col, blk, win, first, sb_blk, sb_win, sb_first,
              v_pad, T, W, mode):
    return (_v5_impl(msg128, recv_col, blk, win, first, v_pad, T, W, mode),
            (recv_col, sb_blk, sb_win, sb_first))


def _v5_b_bwd(v_pad, T, W, mode, res, g):
    recv_col, sb_blk, sb_win, sb_first = res
    gt = g.astype(jnp.bfloat16) if mode == "bf16" else g
    grad = windowed_row_broadcast(gt, recv_col, sb_blk, sb_win, sb_first,
                                  tile_e=T, window=W)
    return grad, None, None, None, None, None, None, None


_v5_call_b.defvjp(_v5_b_fwd, _v5_b_bwd)


def _v5_fwd(msg128, recv_col, blk, win, first, v_pad, T, W, mode):
    return (_v5_impl(msg128, recv_col, blk, win, first, v_pad, T, W, mode),
            recv_col)


def _v5_bwd(v_pad, T, W, mode, recv_col, g):
    # d/d msg128 = g[recv] (plain row gather; slicing is NOT fused in —
    # see the gather+slice lesson in the module docstring)
    g_ext = jnp.concatenate(
        [g, jnp.zeros((W, g.shape[1]), g.dtype)])     # dump window rows
    grad = g_ext[recv_col[:, 0]]
    if mode == "bf16":   # primal stream is bf16; cotangent must match
        grad = grad.astype(jnp.bfloat16)
    return grad, None, None, None, None


_v5_call.defvjp(_v5_fwd, _v5_bwd)
