"""UNC models: DualGraphConv (DMPNN), CompGCN, R-GIN, R-GCN + TrainModel.

Reference: /root/reference/UnsupervisedNodeClassification/Model/DMPNN/src/
model.py (DualGraphConv 117-280, DMPNN 283-328, TrainModel 632-737) and the
CompGCN/R-GIN/R-GCN variants (Model/{CompGCN,R-GIN,R-GCN}/src/model.py).

Flat-subgraph formulation: features live on [V_max]/[E_max] padded flat
arrays with masks; aggregation is a masked scatter-add (XLA) — the large-
graph path of SURVEY §2.3.

Reference quirks preserved:
  * DualGraphConv's dropout calls discard their result (model.py:245,260) —
    update MLP outputs are NOT dropped;
  * unused nfc/efc Linear layers are NOT reproduced (they contribute no
    computation and only noise to the param count);
  * update MLP is Linear-[BN]-LeakyReLU(1/5.5)-Linear with xavier-uniform
    weights and zero biases (model.py:146-168);
  * tanh between hidden layers, no activation after the last (DMPNN
    build_hidden_layer, model.py:299-308);
  * r-bar = per-relation mean of final edge outputs (model.py:319-325).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..constants import LEAKY_RELU_A
from ..utils.init import scaled, xavier_uniform
from ..models.layers import MaskedBatchNorm


class UNCSubgraph:
    """Thin namespace for the padded flat subgraph arrays (a dict works too;
    this documents the fields)."""


def _xavier(scale=1.0):
    return scaled(xavier_uniform(1.0), scale)


def _segment_sum_f32(msg, receivers, v, h, sorted_edges):
    """XLA scatter-add that ACCUMULATES in f32: a bf16 accumulator
    (utils/amp compute dtype) loses ~0.4% per 2^8 summands, and hub nodes
    aggregate thousands of edges. No-op for f32 inputs. (The windowed
    kernel accumulates in f32 internally already.)"""
    acc = jnp.float32 if msg.dtype == jnp.bfloat16 else msg.dtype
    agg = jnp.zeros((v, h), acc).at[receivers].add(
        msg.astype(acc), indices_are_sorted=sorted_edges)
    return agg.astype(msg.dtype)


def _take_rows(table, idx, sorted_idx: bool = False):
    """Row gather whose BACKWARD is an f32-accumulating scatter-add with
    XLA's `indices_are_sorted` fast path when the index stream is sorted.

    Autodiff's default gather transpose emits an unsorted scatter with a
    bf16 accumulator under amp — at the Yelp envelope those cotangent
    scatters ([524288, 50] -> [65536, 50]) were 7.4 ms EACH and 51% of
    the whole UNC train step (scripts/profile_unc_step.py, round 3).
    Receiver streams are sorted by construction (pad_subgraph / the
    shard builders), which the fast path turns into ~4.5 ms; f32
    accumulation also honors the amp exact-count rule (hub nodes sum
    thousands of cotangent rows).

    Module-level custom_vjp with idx carried as a residual — a
    closure-captured traced idx leaks out of shard_map traces.
    """
    return _take_rows_p(table, idx, sorted_idx, table.shape[0],
                        jnp.dtype(table.dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _take_rows_p(table, idx, sorted_idx, n_rows, out_dtype):
    return table[idx]


def _take_rows_fwd(table, idx, sorted_idx, n_rows, out_dtype):
    return table[idx], idx


def _take_rows_bwd(sorted_idx, n_rows, out_dtype, idx, g):
    out = jnp.zeros((n_rows, g.shape[-1]), jnp.float32).at[idx].add(
        g.astype(jnp.float32), indices_are_sorted=sorted_idx)
    return (out.astype(out_dtype),
            np.zeros(idx.shape, jax.dtypes.float0))


_take_rows_p.defvjp(_take_rows_fwd, _take_rows_bwd)


def _take_rows_perm(table, idx, order, idx_sorted):
    """_take_rows for UNSORTED index streams with a host-precomputed sort:
    the backward permutes the cotangent rows by `order` and scatters at
    `idx_sorted = idx[order]` with the sorted fast path. XLA fuses the
    permute INTO the scatter; the fused form measures 6.96 ms per
    sender-side cotangent at the Yelp envelope vs 7.4 unsorted — and vs
    9.85 for a barrier-SPLIT permute+scatter (a materialized [E, H]
    permute is itself random-row-access bound at 5.57 ms; splitting
    never pays — device A/B, round 3). Pad rows carry exactly-zero
    cotangents, so their position in the sort is harmless."""
    return _take_rows_perm_p(table, idx, order, idx_sorted,
                             table.shape[0], jnp.dtype(table.dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _take_rows_perm_p(table, idx, order, idx_sorted, n_rows, out_dtype):
    return table[idx]


def _take_rows_perm_fwd(table, idx, order, idx_sorted, n_rows, out_dtype):
    return table[idx], (order, idx_sorted)


def _take_rows_perm_bwd(n_rows, out_dtype, res, g):
    order, idx_sorted = res
    gs = g.astype(jnp.float32)[order]
    out = jnp.zeros((n_rows, g.shape[-1]), jnp.float32).at[idx_sorted].add(
        gs, indices_are_sorted=True)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (out.astype(out_dtype), zero(idx_sorted), zero(order),
            zero(idx_sorted))


_take_rows_perm_p.defvjp(_take_rows_perm_fwd, _take_rows_perm_bwd)


def _take_rows_win(table, idx, sk_recv, sk_blk, sk_win, sk_first):
    """_take_rows whose cotangent scatter runs through the windowed
    Pallas kernel (ops/segment_kernel.py) — the receiver-gather cotangent
    IS a segment-sum over the receiver-sorted stream, so the forward
    aggregation's pass plan applies verbatim.

    The table stays at its natural width and the cotangent enters the
    kernel in ITS OWN dtype (mode="bf16" under amp: one MXU pass, f32
    accumulate — numerically identical to XLA's f32-accumulating scatter
    of the same bf16 rows). The earlier f32-materializing variant lost
    10-19 ms/step to VMEM eviction of the gather tables (ARCHITECTURE
    §8.3 post-mortem); this one's only new buffer is a bf16 [E, 128]
    lane-pad, SMALLER than the f32 [E, 2H+1] convert it replaces.
    Single-device path only (the sharded executions keep _take_rows:
    their plans cover owned/sliced row ranges, not the gather table)."""
    return _take_rows_win_p(table, idx, sk_recv, sk_blk, sk_win, sk_first,
                            table.shape[0], jnp.dtype(table.dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _take_rows_win_p(table, idx, sk_recv, sk_blk, sk_win, sk_first,
                     n_rows, out_dtype):
    return table[idx]


def _take_rows_win_fwd(table, idx, sk_recv, sk_blk, sk_win, sk_first,
                       n_rows, out_dtype):
    return table[idx], (idx, sk_recv, sk_blk, sk_win, sk_first)


def _take_rows_win_bwd(n_rows, out_dtype, res, g):
    idx, sk_recv, sk_blk, sk_win, sk_first = res
    from ..ops.segment_kernel import segment_sum_windowed_arrays

    out = segment_sum_windowed_arrays(
        g, sk_recv, sk_blk, sk_win, sk_first,
        num_nodes=n_rows, out_width=g.shape[-1])
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (out.astype(out_dtype), zero(idx), zero(sk_recv), zero(sk_blk),
            zero(sk_win), zero(sk_first))


_take_rows_win_p.defvjp(_take_rows_win_fwd, _take_rows_win_bwd)


def _take_rows_win_perm(table, idx, order, sk2_recv, sk2_blk, sk2_win,
                        sk2_first):
    """_take_rows_win for UNSORTED index streams (senders): the backward
    permutes the cotangent rows into idx-sorted order, then runs the
    windowed kernel over a SECOND pass plan built from the sorted sender
    stream (attach_scatter_plan(sender_plan=True) ships it as sk2_*).

    This is the §8.3 post-mortem's 'senders-sorted twin plan' — measured
    a dead end at V=65k (the materialized [E, 128] permute plus the
    kernel's buffers evict the VMEM-resident gather tables) and predicted
    to flip once the [V, 2H+1] tables fall out of VMEM anyway (V >= ~200k,
    the north-star regime). Opt-in by plan presence; single-device only."""
    return _take_rows_win_perm_p(table, idx, order, sk2_recv, sk2_blk,
                                 sk2_win, sk2_first, table.shape[0],
                                 jnp.dtype(table.dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _take_rows_win_perm_p(table, idx, order, sk2_recv, sk2_blk, sk2_win,
                          sk2_first, n_rows, out_dtype):
    return table[idx]


def _take_rows_win_perm_fwd(table, idx, order, sk2_recv, sk2_blk, sk2_win,
                            sk2_first, n_rows, out_dtype):
    return table[idx], (idx, order, sk2_recv, sk2_blk, sk2_win, sk2_first)


def _take_rows_win_perm_bwd(n_rows, out_dtype, res, g):
    idx, order, sk2_recv, sk2_blk, sk2_win, sk2_first = res
    from ..ops.segment_kernel import segment_sum_windowed_arrays

    out = segment_sum_windowed_arrays(
        g[order], sk2_recv, sk2_blk, sk2_win, sk2_first,
        num_nodes=n_rows, out_width=g.shape[-1])
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (out.astype(out_dtype), zero(idx), zero(order), zero(sk2_recv),
            zero(sk2_blk), zero(sk2_win), zero(sk2_first))


_take_rows_win_perm_p.defvjp(_take_rows_win_perm_fwd,
                             _take_rows_win_perm_bwd)


def _take_rows_bcast(table, idx, sk_recv, sk_blk, sk_win, sk_first,
                     sb_blk, sb_win, sb_first):
    """_take_rows_win whose FORWARD also runs on the windowed plan: the
    Pallas row-broadcast kernel (ops/segment_kernel.py) streams the
    table through VMEM one window at a time instead of XLA's per-row
    HBM fetches. Motivation: at V >= ~200k the [V, 128] endpoint tables
    fall out of VMEM and XLA's gather drops to ~40 GB/s (22-24 ms per
    gather at V=262k/E=2M — ARCHITECTURE §8.3 large-V decomposition);
    the kernel's table traffic is sequential. Backward is the windowed
    scatter on the sk_* plan, exactly as _take_rows_win.

    Requirements: 128-lane table (pad_cols), receiver-sorted idx whose
    pad slots the sk_recv column maps to the dump window (pad rows come
    back ZERO instead of table[idx_pad] — callers mask pad edges).
    Single-device path only, opt-in by sb_* plan presence
    (attach_scatter_plan(bcast_plan=True))."""
    return _take_rows_bcast_p(table, idx, sk_recv, sk_blk, sk_win,
                              sk_first, sb_blk, sb_win, sb_first,
                              table.shape[0],
                              jnp.dtype(table.dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _take_rows_bcast_p(table, idx, sk_recv, sk_blk, sk_win, sk_first,
                       sb_blk, sb_win, sb_first, n_rows, out_dtype):
    from ..ops.segment_kernel import windowed_row_broadcast

    return windowed_row_broadcast(
        table, sk_recv, sb_blk, sb_win, sb_first)[: idx.shape[0]]


def _take_rows_bcast_fwd(table, idx, sk_recv, sk_blk, sk_win, sk_first,
                         sb_blk, sb_win, sb_first, n_rows, out_dtype):
    out = _take_rows_bcast_p(table, idx, sk_recv, sk_blk, sk_win,
                             sk_first, sb_blk, sb_win, sb_first, n_rows,
                             out_dtype)
    return out, (idx, sk_recv, sk_blk, sk_win, sk_first,
                 sb_blk, sb_win, sb_first)


def _take_rows_bcast_bwd(n_rows, out_dtype, res, g):
    (idx, sk_recv, sk_blk, sk_win, sk_first,
     sb_blk, sb_win, sb_first) = res
    from ..ops.segment_kernel import segment_sum_windowed_arrays

    out = segment_sum_windowed_arrays(
        g, sk_recv, sk_blk, sk_win, sk_first,
        num_nodes=n_rows, out_width=g.shape[-1])
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (out.astype(out_dtype), zero(idx), zero(sk_recv), zero(sk_blk),
            zero(sk_win), zero(sk_first), zero(sb_blk), zero(sb_win),
            zero(sb_first))


_take_rows_bcast_p.defvjp(_take_rows_bcast_fwd, _take_rows_bcast_bwd)


def _take_rows_bcast_sorted(table, idx, sb_recv, sb_blk, sb_win, sb_first,
                            sorted_idx: bool = True):
    """Windowed row-broadcast FORWARD with the sorted-XLA scatter
    BACKWARD — the owner-sharded (halo) composition of the round-4
    kernels (round-5, VERDICT r4 item 2).

    Halo mode gathers from the composite [owned; halo; dump] table,
    whose row envelope exceeds the aggregation's [Vp] — so the plan
    (sbt_*, parallel/halo_unc.build_halo_sub(bcast_plan=True)) carries
    its own receiver column sized to the TABLE envelope. The backward
    keeps the sorted f32-accumulating XLA scatter: routing the halo
    receiver cotangent through the windowed kernel was built and
    measured a dead end in round 4 (54.9 -> 68.5 ms at V=65k — the
    [E, 128] lane-pad copy trap; ARCHITECTURE §8.3 halo coda), while
    the forward gather is exactly the kernel's HBM-resident win
    (22.3 -> 4.4 ms at V=262k)."""
    return _take_rows_bcast_sorted_p(table, idx, sb_recv, sb_blk, sb_win,
                                     sb_first, sorted_idx, table.shape[0],
                                     jnp.dtype(table.dtype).name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _take_rows_bcast_sorted_p(table, idx, sb_recv, sb_blk, sb_win,
                              sb_first, sorted_idx, n_rows, out_dtype):
    from ..ops.segment_kernel import windowed_row_broadcast

    return windowed_row_broadcast(
        table, sb_recv, sb_blk, sb_win, sb_first)[: idx.shape[0]]


def _take_rows_bcast_sorted_fwd(table, idx, sb_recv, sb_blk, sb_win,
                                sb_first, sorted_idx, n_rows, out_dtype):
    out = _take_rows_bcast_sorted_p(table, idx, sb_recv, sb_blk, sb_win,
                                    sb_first, sorted_idx, n_rows, out_dtype)
    return out, (idx, sb_recv, sb_blk, sb_win, sb_first)


def _take_rows_bcast_sorted_bwd(sorted_idx, n_rows, out_dtype, res, g):
    idx, sb_recv, sb_blk, sb_win, sb_first = res
    out = jnp.zeros((n_rows, g.shape[-1]), jnp.float32).at[idx].add(
        g.astype(jnp.float32), indices_are_sorted=sorted_idx)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (out.astype(out_dtype), zero(idx), zero(sb_recv), zero(sb_blk),
            zero(sb_win), zero(sb_first))


_take_rows_bcast_sorted_p.defvjp(_take_rows_bcast_sorted_fwd,
                                 _take_rows_bcast_sorted_bwd)


def _onehot_rows(table, idx, clip: bool = False):
    """Tiny-table row lookup as one_hot(idx) @ table.

    Row selection on the MXU whose TRANSPOSE is also a matmul — the
    row-gather backward otherwise lowers to an XLA scatter of E rows
    into a handful of relation rows (measured 3.5 ms into [6, 50] at the
    Yelp envelope). Only for small tables (relations): the busywork is
    O(E * R * H). `clip` reproduces gather's out-of-bounds clamping on
    BOTH sides (XLA clamps negatives to row 0; one_hot of a negative
    would otherwise select nothing).

    Precision: exact under amp (bf16 table, one_hot rows are 0/1, f32
    accumulate). For an f32 table the dot is forced to HIGHEST precision
    so the selected rows stay bit-exact — TPU's default bf16 matmul
    precision would round the f32 master values, unlike the gather this
    replaces; the small-table FLOP cost of the emulation is noise."""
    n = table.shape[0]
    if clip:
        idx = jnp.clip(idx, 0, n - 1)
    prec = ("highest" if jnp.dtype(table.dtype) == jnp.float32 else None)
    return jnp.matmul(jax.nn.one_hot(idx, n, dtype=table.dtype), table,
                      precision=prec)


def _use_windowed(layer, sub, width) -> bool:
    """Windowed-kernel eligibility: backend selected, a pass plan rides
    the sub dict (plans depend only on the receiver stream, so every
    layer type shares the one the driver attached), and the message
    width fits the kernel's 128-lane tile."""
    return (layer.scatter_backend == "windowed" and "sk_blk" in sub
            and width <= 128)


def _segment_sum_agg(layer, sub, msg, v, h, out_width=None):
    """Node aggregation behind the layer's scatter_backend: the windowed
    Pallas kernel when eligible (f32-accumulating internally), else the
    f32-accumulating XLA scatter. `out_width` slices weight-column-padded
    messages back to the real hidden width (segment_kernel fusion note)."""
    if _use_windowed(layer, sub, msg.shape[-1]):
        from ..ops.segment_kernel import segment_sum_windowed_arrays

        return segment_sum_windowed_arrays(
            msg, sub["sk_recv"], sub["sk_blk"], sub["sk_win"],
            sub["sk_first"], num_nodes=v,
            out_width=out_width if out_width is not None else h,
            # bcast twin plan (when attached): the aggregation's backward
            # gather also runs windowed, freeing its VMEM-resident table
            # for the forward endpoint gathers (§8.3 large-V lever)
            sb_blk=sub.get("sb_blk"), sb_win=sub.get("sb_win"),
            sb_first=sub.get("sb_first"))
    agg = _segment_sum_f32(msg, sub["receivers"], v, msg.shape[-1],
                           layer.sorted_edges)
    return agg[:, : out_width] if out_width is not None else agg


def _halo_table(node_feat, sub, axis):
    """Owner-sharded gather table: [owned ; halo ; zero dump].

    `node_feat` is this shard's owned rows [Vp, H]. The halo rows are the
    boundary sender features owned by other shards, fetched with ONE
    all_to_all over the `axis` mesh axis per call (SURVEY §2.4 "graph
    partitioning / halo exchange"; exchange plan built host-side by
    parallel/halo_unc.py). Local sender indices address this table:
    0..Vp-1 owned, Vp + o*B + j the j-th boundary row from owner o, and
    Vp + n*B the zero dump row for masked edges.
    """
    send_idx = sub["send_idx"]        # [n, B] rows of MY owned slice
    send_mask = sub["send_mask"]      # [n, B]
    n, b = send_idx.shape
    h = node_feat.shape[-1]
    send = jnp.where(send_mask[..., None], node_feat[send_idx], 0.0)
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    return jnp.concatenate(
        [node_feat, recv.reshape(n * b, h),
         jnp.zeros((1, h), node_feat.dtype)])


class UpdateMLP2(nn.Module):
    """Linear-[BN]-LeakyReLU(1/5.5)-Linear (model.py:146-168)."""

    hidden_dim: int
    batch_norm: bool = True
    ep_axis: Optional[str] = None   # shard_map axis for global BN statistics

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        h = self.hidden_dim
        w0 = self.param("fc0_kernel", _xavier(), (x.shape[-1], h))
        b0 = self.param("fc0_bias", nn.initializers.zeros, (h,))
        w1 = self.param("fc1_kernel", _xavier(), (h, h))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (h,))
        y = x @ w0 + b0
        if self.batch_norm:
            y = MaskedBatchNorm(name="bn", axis_name=self.ep_axis)(
                y, mask=mask, train=train)
        y = jax.nn.leaky_relu(y, LEAKY_RELU_A)
        return y @ w1 + b1


class DualGraphConv(nn.Module):
    """UNC flavor of the dual message passing layer (model.py:117-280)."""

    hidden_dim: int
    init_neigenv: float = 4.0
    init_eeigenv: float = 4.0
    use_bias: bool = True
    batch_norm: bool = True
    activation: Optional[str] = None  # None | "tanh"
    dropout: float = 0.0  # kept for config parity; see module docstring
    sorted_edges: bool = False  # receivers non-decreasing (pad_subgraph sorts)
    # Edge-partitioned mode (SURVEY §2.4): edge arrays arrive sharded over
    # this shard_map axis; node features are replicated.  The only
    # collectives are one psum completing the node aggregation and one for
    # out-degrees (+ BN statistic psums when batch_norm).
    ep_axis: Optional[str] = None
    # "replicated": node state replicated, aggregation completed by psum.
    # "owner": node state owner-sharded (edges placed at their receiver's
    # owner by parallel/halo_unc.py) — aggregation is fully local, sender
    # gathers go through the per-layer halo table (_halo_table), and
    # out-degrees arrive precomputed in sub["out_deg"].
    node_sharding: str = "replicated"
    # "xla": scatter-add (+ sorted hint via sorted_edges). "windowed": the
    # pass-per-(chunk, window) Pallas kernel (ops/segment_kernel.py,
    # 2.0-2.4x over the best XLA lowering at Yelp scale) — requires the
    # sub dict to carry a pass plan (segment_kernel.attach_scatter_plan,
    # wired by the drivers via scatter_backend="windowed").
    scatter_backend: str = "xla"
    # Pad the [V, 2H+1] endpoint column table to 128 lanes so its gathers
    # and cotangent scatters run on aligned full-lane rows (round-4
    # experiment, VERDICT r3 item 5b; the §8.3 Mosaic measurements put
    # 64-lane streams at 131 vs 671 GB/s). Costs a 27% larger table at
    # H=50 — VMEM-residency risk, measure before shipping.
    pad_cols: bool = False

    @nn.compact
    def __call__(self, sub: Dict[str, jnp.ndarray], node_feat, edge_feat,
                 edge_norm=None, train: bool = False):
        h = self.hidden_dim
        din = node_feat.shape[-1]
        n_init = _xavier(1.0 / self.init_neigenv)
        e_init = _xavier(1.0 / self.init_eeigenv)
        w_in = self.param("in_weight", n_init, (din, h))
        w_out = self.param("out_weight", n_init, (din, h))
        w_nloop = self.param("nloop_weight", n_init, (din, h))
        w_src = self.param("src_weight", e_init, (din, h))
        w_dst = self.param("dst_weight", e_init, (din, h))
        w_eloop = self.param("eloop_weight", e_init, (din, h))
        if self.use_bias:
            b_n = self.param("nbias", nn.initializers.zeros, (h,))
            b_e = self.param("ebias", nn.initializers.zeros, (h,))

        senders = sub["senders"]
        receivers = sub["receivers"]
        e_mask = sub["edge_mask"]
        rev = sub["rev_flag"][:, None]
        v = sub["node_mask"].shape[0]
        owner_sharded = self.node_sharding == "owner"

        # Under owner sharding, senders address the [owned; halo; dump]
        # table; receivers are always owned rows (0..Vp-1, pads at 0 with
        # their messages zeroed), so receiver gathers stay on node_feat's
        # index space via the same table prefix.
        table = (_halo_table(node_feat, sub, self.ep_axis)
                 if owner_sharded else node_feat)

        # global out-degrees: host-precomputed under owner sharding
        # (edges whose SENDER is owned here may live on other shards),
        # hoisted into sub by the DMPNN backbone otherwise (it is
        # identical across layers — rebuilding it per layer cost a
        # 3.5 ms narrow scatter per layer at the Yelp envelope)
        if "out_deg" in sub:
            out_deg = sub["out_deg"]
        else:
            if owner_sharded:
                # an in-step scatter would count only locally-resident
                # edges — out-edges of owned nodes live on OTHER shards
                # under owner placement, so degrees would silently
                # undercount; build_halo_sub always precomputes out_deg
                raise ValueError(
                    "owner-sharded subs must carry host-precomputed "
                    "'out_deg' (parallel/halo_unc.build_halo_sub)")
            out_deg = jnp.zeros((v,), jnp.float32).at[senders].add(
                e_mask.astype(jnp.float32))
            if self.ep_axis:
                out_deg = jax.lax.psum(out_deg, self.ep_axis)

        # ONE [Vt, 2H+1] column table — src/dst endpoint products plus the
        # log-degree column — and ONE row gather per endpoint. The naive
        # form (four [E, H] gathers + a 1-lane degree gather) pays five
        # backward scatters per layer; this pays two, with the sorted
        # fast path on the receiver side (_take_rows). The degree column
        # rides along for free (it is only READ at receivers; the
        # optimization_barrier keeps XLA from re-fusing the lane slices
        # into the gather — a fused gather+slice is ~265x off roofline,
        # ARCHITECTURE §8.3).
        d_col = jnp.log2(1.0 + out_deg).astype(table.dtype)[:, None]
        if table.shape[0] != d_col.shape[0]:
            d_col = jnp.concatenate(
                [d_col, jnp.zeros((table.shape[0] - d_col.shape[0], 1),
                                  table.dtype)], axis=0)
        cols = jnp.concatenate([table @ w_src, table @ w_dst, d_col],
                               axis=1)
        if self.pad_cols and cols.shape[1] % 128:
            cols = jnp.pad(
                cols, ((0, 0), (0, 128 - cols.shape[1] % 128)))
        if "pair_order" in sub and self.ep_axis is None:
            # fused endpoint gather (round-4 experiment, VERDICT r3 item
            # 5a): ONE gather over the concatenated [2E] sender+receiver
            # stream — the backward pays ONE sorted cotangent scatter per
            # layer instead of a sender scatter + a receiver scatter.
            # Opted in by the pair_order/pair_sorted keys
            # (pad_subgraph(pair_keys=True) / BENCH_UNC_ENDPOINTS=fused).
            n_e = senders.shape[0]
            idx2 = jnp.concatenate([senders, receivers])
            rows = _take_rows_perm(cols, idx2, sub["pair_order"],
                                   sub["pair_sorted"])
            at_send = jax.lax.optimization_barrier(rows[:n_e])
            at_recv = jax.lax.optimization_barrier(rows[n_e:])
        else:
            if ("sk2_blk" in sub and "send_order" in sub
                    and cols.dtype == jnp.bfloat16
                    and cols.shape[1] <= 128):
                # windowed sender cotangent over the senders-sorted twin
                # plan. Single-device: attach_scatter_plan(sender_plan=
                # True). Sharded (round-5, VERDICT r4 item 2): the
                # builders attach PER-SHARD twins — ep-psum plans over
                # each slice's local sort (full-V output, completed by
                # shard_map's transpose psum), halo plans over the
                # composite-table index space (sk2 v_env = [owned; halo;
                # dump] rows).
                at_send = _take_rows_win_perm(
                    cols, senders, sub["send_order"], sub["sk2_recv"],
                    sub["sk2_blk"], sub["sk2_win"], sub["sk2_first"])
            elif "send_order" in sub and self.ep_axis is None:
                # host-precomputed sender sort (pad_subgraph): sorted fast
                # path on the sender-side cotangent scatter (the sharded
                # builders attach send_order only alongside sk2_* plans)
                at_send = _take_rows_perm(cols, senders, sub["send_order"],
                                          sub["senders_sorted"])
            else:
                at_send = _take_rows(cols, senders)
            at_send = jax.lax.optimization_barrier(at_send)
            # receiver backend: the windowed kernels in their bf16 modes
            # when the driver attached the matching plans; f32 and
            # plan-less paths keep the sorted scatter.
            bf16_full = (cols.dtype == jnp.bfloat16
                         and cols.shape[1] == 128)
            if owner_sharded and "sbt_blk" in sub and bf16_full:
                # halo: windowed row-broadcast FORWARD from the composite
                # [owned; halo; dump] table on its own-envelope plan
                # (build_halo_sub(bcast_plan=True)); backward stays the
                # sorted XLA scatter — the windowed receiver COTANGENT
                # was measured a dead end here (round 4: 54.9 -> 68.5 ms,
                # §8.3 halo coda), while the forward gather is the
                # kernel's HBM-resident large-V win.
                at_recv = _take_rows_bcast_sorted(
                    cols, receivers, sub["sbt_recv"], sub["sbt_blk"],
                    sub["sbt_win"], sub["sbt_first"],
                    sorted_idx=self.sorted_edges)
            elif (not owner_sharded and bf16_full
                    and _use_windowed(self, sub, cols.shape[1])
                    and "sb_blk" in sub):
                # windowed forward AND backward: the row-broadcast kernel
                # streams the table through VMEM (the §8.3 large-V HBM
                # gather lever). Single-device via attach_scatter_plan(
                # bcast_plan=True); ep-psum via per-shard sb twins (the
                # cols table is full-V replicated, so the single-device
                # plan semantics hold per slice).
                at_recv = _take_rows_bcast(
                    cols, receivers, sub["sk_recv"], sub["sk_blk"],
                    sub["sk_win"], sub["sk_first"], sub["sb_blk"],
                    sub["sb_win"], sub["sb_first"])
            elif (self.ep_axis is None and cols.dtype == jnp.bfloat16
                    and _use_windowed(self, sub, cols.shape[1])):
                # width gate uses the TABLE width: the cotangent stream
                # is [E, cols-width] and must fit the kernel's 128-lane
                # tile (h_dim >= 64 pads past it -> sorted-XLA fallback)
                at_recv = _take_rows_win(cols, receivers, sub["sk_recv"],
                                         sub["sk_blk"], sub["sk_win"],
                                         sub["sk_first"])
            else:
                at_recv = _take_rows(cols, receivers,
                                     sorted_idx=self.sorted_edges)
            at_recv = jax.lax.optimization_barrier(at_recv)
        edge_msg = jnp.where(
            rev,
            at_send[:, h: 2 * h] - at_recv[:, :h],
            at_recv[:, h: 2 * h] - at_send[:, :h],
        )
        windowed = _use_windowed(self, sub, h)
        if windowed:
            # produce the message at the kernel's native 128-lane width by
            # zero-padding the weight COLUMNS: the pad lanes ride the same
            # MXU pass and the where/norm/mask chain, so the kernel input
            # needs no separate repack materialization (segment_kernel
            # fusion note). Extra lanes of agg are sliced away below.
            w_out_k = jnp.pad(w_out, ((0, 0), (0, 128 - h)))
            w_in_k = jnp.pad(w_in, ((0, 0), (0, 128 - h)))
        else:
            w_out_k, w_in_k = w_out, w_in
        node_msg = jnp.where(rev, edge_feat @ w_out_k,
                             -(edge_feat @ w_in_k))
        if edge_norm is not None:
            # edge_norm stays a f32 input; follow the compute dtype
            node_msg = node_msg * edge_norm.astype(node_msg.dtype)
        node_msg = jnp.where(e_mask[:, None], node_msg, 0.0)
        agg = _segment_sum_agg(self, sub, node_msg, v, h, out_width=h)
        if self.ep_axis and not owner_sharded:
            # owner sharding places every edge at its receiver's owner, so
            # the aggregation is complete without any collective
            agg = jax.lax.psum(agg, self.ep_axis)

        n_out = node_feat @ w_nloop + agg
        if self.use_bias:
            n_out = n_out + b_n
        n_out = UpdateMLP2(h, self.batch_norm, ep_axis=self.ep_axis,
                           name="nmlp")(
            n_out, mask=sub["node_mask"], train=train)

        # log-degree at the receiver, already gathered in the column table
        # above (f32 log2, cast to the compute dtype before the gather —
        # identical values to casting after)
        d = at_recv[:, 2 * h: 2 * h + 1].astype(edge_feat.dtype)
        add = 2.0 * (1.0 + d) * (edge_feat @ (w_src - w_dst))
        e_out = edge_feat @ w_eloop + edge_msg + add
        if self.use_bias:
            e_out = e_out + b_e
        e_out = UpdateMLP2(h, self.batch_norm, ep_axis=self.ep_axis,
                           name="emlp")(
            e_out, mask=e_mask, train=train)

        if self.activation == "tanh":
            n_out = jnp.tanh(n_out)
            e_out = jnp.tanh(e_out)
        return n_out, e_out


class UNCDMPNN(nn.Module):
    """DMPNN UNC model: node/rel embeddings + DualGraphConv stack
    (model.py:283-328). Returns (h, z, r_bar)."""

    num_nodes: int
    num_rels: int        # already doubled by the caller (TrainModel)
    h_dim: int
    out_dim: int
    num_hidden_layers: int = 1
    dropout: float = 0.0
    node_attri: Optional[Any] = None  # frozen [N, A] attributes
    multihot_input: bool = False
    sorted_edges: bool = False
    ep_axis: Optional[str] = None
    node_sharding: str = "replicated"
    scatter_backend: str = "xla"
    pad_cols: bool = False

    @nn.compact
    def __call__(self, sub, train: bool = False):
        h, z = _input_embeddings(self, sub, rel_stream=True)

        # hoist the (layer-invariant) global out-degree so every
        # DualGraphConv reads it instead of rebuilding the scatter
        if "out_deg" not in sub and self.node_sharding != "owner":
            od = jnp.zeros((sub["node_mask"].shape[0],), jnp.float32).at[
                sub["senders"]].add(sub["edge_mask"].astype(jnp.float32))
            if self.ep_axis:
                od = jax.lax.psum(od, self.ep_axis)
            sub = dict(sub, out_deg=od)

        norm = sub.get("edge_norm")
        for i in range(self.num_hidden_layers):
            act = "tanh" if i < self.num_hidden_layers - 1 else None
            h, z = DualGraphConv(
                hidden_dim=self.out_dim, activation=act,
                dropout=self.dropout, sorted_edges=self.sorted_edges,
                ep_axis=self.ep_axis, node_sharding=self.node_sharding,
                scatter_backend=self.scatter_backend,
                pad_cols=self.pad_cols,
                name=f"layer_{i}",
            )(sub, h, z, edge_norm=norm, train=train)

        # per-relation mean of final edge outputs (model.py:319-325);
        # sharded edge rows -> psum partial sums/counts over 'ep'
        et = sub["edge_type"]
        em = sub["edge_mask"].astype(jnp.float32)[:, None]
        onehot = jax.nn.one_hot(et, self.num_rels, dtype=z.dtype) * em
        sums = onehot.T @ z                       # [R, H]
        cnts = onehot.sum(axis=0)[:, None]
        if self.ep_axis:
            sums = jax.lax.psum(sums, self.ep_axis)
            cnts = jax.lax.psum(cnts, self.ep_axis)
        r_bar = sums / (cnts + 1e-8)
        return h, z, r_bar

    def full_node_embeddings(self, params):
        """The learned embedding table (main.py:187 node_emb.weight)."""
        if self.node_attri is not None:
            import numpy as np
            return np.asarray(self.node_attri)
        return params["params"]["node_emb"]


class CompGraphConv(nn.Module):
    """UNC CompGCN layer (Model/CompGCN/src/model.py:117-264): corr/mult/sub
    composition, in/out weights by rev flag, 1/3 self-loop averaging, edge
    stream E @ W_rel."""

    hidden_dim: int
    comp_opt: str = "corr"
    self_loop: bool = True
    use_bias: bool = True
    batch_norm: bool = False
    activation: Optional[str] = None
    dropout: float = 0.0
    sorted_edges: bool = False
    ep_axis: Optional[str] = None
    node_sharding: str = "replicated"
    scatter_backend: str = "xla"

    @nn.compact
    def __call__(self, sub, node_feat, edge_feat, edge_norm=None,
                 train: bool = False):
        from ..models.compgcn import comp_func

        h = self.hidden_dim
        din = node_feat.shape[-1]
        w_in = self.param("in_weight", _xavier(), (din, h))
        w_out = self.param("out_weight", _xavier(), (din, h))
        w_rel = self.param("rel_weight", _xavier(), (din, h))
        if self.self_loop:
            w_loop = self.param("loop_weight", _xavier(), (din, h))
            loop_rel = self.param("loop_rel", _xavier(), (1, din))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (h,))

        owner_sharded = self.node_sharding == "owner"
        table = (_halo_table(node_feat, sub, self.ep_axis)
                 if owner_sharded else node_feat)
        v = sub["node_mask"].shape[0]
        comp = comp_func(_take_rows(table, sub["senders"]), edge_feat,
                         self.comp_opt)
        rev = sub["rev_flag"][:, None]
        # kernel-native 128-lane messages via weight-column zero-padding
        # (same fusion trick as DualGraphConv / segment_kernel docstring)
        windowed = _use_windowed(self, sub, h)
        w_in_k = jnp.pad(w_in, ((0, 0), (0, 128 - h))) if windowed else w_in
        w_out_k = (jnp.pad(w_out, ((0, 0), (0, 128 - h)))
                   if windowed else w_out)
        msg = jnp.where(rev, comp @ w_out_k, comp @ w_in_k)
        if edge_norm is not None:
            msg = msg * edge_norm.astype(msg.dtype)
        msg = jnp.where(sub["edge_mask"][:, None], msg, 0.0)
        agg = _segment_sum_agg(self, sub, msg, v, h, out_width=h)
        if self.ep_axis and not owner_sharded:
            agg = jax.lax.psum(agg, self.ep_axis)

        if self.self_loop:
            out = (agg + comp_func(node_feat, loop_rel, self.comp_opt)
                   @ w_loop) * 0.3333333
        else:
            out = agg * 0.5
        if self.use_bias:
            out = out + bias
        if self.batch_norm:
            out = MaskedBatchNorm(name="bn", axis_name=self.ep_axis)(
                out, mask=sub["node_mask"], train=train)
        if self.activation == "tanh":
            out = jnp.tanh(out)
        out = nn.Dropout(self.dropout, name="drop")(out,
                                                    deterministic=not train)
        return out, edge_feat @ w_rel


def _flat_relation_agg(sub, src_feat_e, weights, layer,
                       local_complete=False):
    """agg[v] = sum_e->v src_feat_e @ W[rel(e)] via a scan over relations
    (same MXU-friendly scheme as models/rgnn.py). Under edge partitioning
    the partial sums are completed by ONE psum after the scan —
    `local_complete` (owner sharding: edges live at their receiver's
    owner) skips it. The per-relation segment-sum goes through the
    layer's scatter_backend (the windowed kernel's pass plan depends
    only on the receiver stream, so all relations share it; falls back
    to XLA scatter when src width exceeds the 128-lane tile)."""
    v = sub["node_mask"].shape[0]
    num_rels = weights.shape[0]
    ep_axis = layer.ep_axis

    def body(carry, wr_and_r):
        wr, r = wr_and_r
        sel = jnp.logical_and(sub["edge_mask"], sub["edge_type"] == r)
        masked = jnp.where(sel[:, None], src_feat_e, 0.0)
        partial = _segment_sum_agg(layer, sub, masked, v,
                                   src_feat_e.shape[-1])
        return carry + partial @ wr, None

    init = jnp.zeros((v, weights.shape[2]), src_feat_e.dtype)
    agg, _ = jax.lax.scan(body, init, (weights, jnp.arange(num_rels)))
    if ep_axis and not local_complete:
        agg = jax.lax.psum(agg, ep_axis)
    return agg


class RelGraphConvFlat(nn.Module):
    """dgl RelGraphConv (basis, num_bases=num_rels) on the flat subgraph:
    msg = src @ W_rel [* norm]; out = act(agg + h @ W_loop + b); used by the
    UNC R-GCN (norm applied) and as the base of RelGraphIso (norm dropped,
    R-GIN/src/model.py:150-157)."""

    hidden_dim: int
    num_rels: int
    self_loop: bool = True
    use_bias: bool = True
    activation: Optional[str] = None
    use_norm: bool = True
    iso_layer: bool = False   # RelGraphIso: extra Linear + act + dropout
    dropout: float = 0.0
    sorted_edges: bool = False
    ep_axis: Optional[str] = None
    node_sharding: str = "replicated"
    scatter_backend: str = "xla"

    @nn.compact
    def __call__(self, sub, node_feat, edge_norm=None, train: bool = False):
        h = self.hidden_dim
        din = node_feat.shape[-1]
        weights = self.param("weight", _xavier(), (self.num_rels, din, h))
        owner_sharded = self.node_sharding == "owner"
        table = (_halo_table(node_feat, sub, self.ep_axis)
                 if owner_sharded else node_feat)
        src = _take_rows(table, sub["senders"])
        if self.use_norm and edge_norm is not None:
            src = src * edge_norm.astype(src.dtype)
        out = _flat_relation_agg(sub, src, weights, self,
                                 local_complete=owner_sharded)
        if self.self_loop:
            out = out + node_feat @ self.param("loop_weight", _xavier(),
                                               (din, h))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (h,))
        drop = nn.Dropout(self.dropout, name="drop")
        if self.iso_layer:
            out = Dense_(h, name="out_layer")(out)
        if self.activation == "tanh":
            out = jnp.tanh(out)
        return drop(out, deterministic=not train)


class Dense_(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", scaled(xavier_uniform(jnp.sqrt(2.0)), 1.0),
                       (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ w + b


class UNCCompGCN(nn.Module):
    """CompGCN UNC backbone (Model/CompGCN/src/model.py:267-305).
    Returns (h, r) — relation stream transformed per layer."""

    num_nodes: int
    num_rels: int
    h_dim: int
    out_dim: int
    num_hidden_layers: int = 1
    dropout: float = 0.0
    node_attri: Optional[Any] = None
    multihot_input: bool = False
    sorted_edges: bool = False
    ep_axis: Optional[str] = None
    node_sharding: str = "replicated"
    scatter_backend: str = "xla"

    @nn.compact
    def __call__(self, sub, train: bool = False):
        h, z = _input_embeddings(self, sub, rel_stream=True)
        norm = sub.get("edge_norm")
        for i in range(self.num_hidden_layers):
            act = "tanh" if i < self.num_hidden_layers - 1 else None
            h, z = CompGraphConv(
                hidden_dim=self.out_dim, comp_opt="corr", activation=act,
                dropout=self.dropout, sorted_edges=self.sorted_edges,
                ep_axis=self.ep_axis, node_sharding=self.node_sharding,
                name=f"layer_{i}",
            )(sub, h, z, edge_norm=norm, train=train)
        return h, z


class UNCRGNN(nn.Module):
    """R-GCN / R-GIN UNC backbones (Model/R-GCN,R-GIN/src/model.py).
    Returns h only."""

    kind: str  # "rgcn" | "rgin"
    num_nodes: int
    num_rels: int
    h_dim: int
    out_dim: int
    num_hidden_layers: int = 1
    dropout: float = 0.0
    node_attri: Optional[Any] = None
    multihot_input: bool = False
    sorted_edges: bool = False
    ep_axis: Optional[str] = None
    node_sharding: str = "replicated"
    scatter_backend: str = "xla"

    @nn.compact
    def __call__(self, sub, train: bool = False):
        h, _ = _input_embeddings(self, sub, rel_stream=False)
        norm = sub.get("edge_norm")
        for i in range(self.num_hidden_layers):
            act = "tanh" if i < self.num_hidden_layers - 1 else None
            h = RelGraphConvFlat(
                hidden_dim=self.out_dim, num_rels=self.num_rels,
                activation=act, dropout=self.dropout,
                use_norm=(self.kind == "rgcn"),
                iso_layer=(self.kind == "rgin"),
                sorted_edges=self.sorted_edges,
                ep_axis=self.ep_axis, node_sharding=self.node_sharding,
                name=f"layer_{i}",
            )(sub, h, edge_norm=norm, train=train)
        return (h,)


def _input_embeddings(mdl, sub, rel_stream: bool):
    """Shared input layer: EmbeddingLayer (learned uniform 1/sqrt(d)),
    EmbeddingLayerAttri (frozen attributes), or MultiHotEmbeddingLayer
    (frozen multihot encoding x learned projection, scale
    1/sqrt(d * enc_len) — Model/DMPNN/src/model.py:12-64)."""
    from ..utils.amp import compute_dtype

    if mdl.node_attri is not None:
        # frozen attribute table follows the trace-time compute dtype so
        # bf16 runs (utils/amp) start bf16 at the input
        h = jnp.asarray(mdl.node_attri, dtype=compute_dtype())[sub["nid"]]
    elif getattr(mdl, "multihot_input", False):
        from ..ops.encoding import get_enc_len, multihot_table

        enc_len = get_enc_len(mdl.num_nodes - 1, 2)
        table = jnp.asarray(multihot_table(mdl.num_nodes, 2),
                            dtype=compute_dtype())
        scale = 1.0 / jnp.sqrt(jnp.asarray(float(mdl.h_dim * enc_len)))
        proj = mdl.param(
            "node_emb_proj",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1, 1) * scale,
            (enc_len * 2, mdl.h_dim))
        h = table[sub["nid"]] @ proj
    else:
        emb = mdl.param(
            "node_emb",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1, 1) / jnp.sqrt(float(mdl.h_dim)),
            (mdl.num_nodes, mdl.h_dim))
        h = emb[sub["nid"]]
    z = None
    if rel_stream:
        rel_emb = mdl.param(
            "rel_emb",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1, 1) / jnp.sqrt(float(mdl.h_dim)),
            (mdl.num_rels, mdl.h_dim))
        # one_hot @ table: exact, and the backward is a matmul instead of
        # an [E]-rows-into-[2R] XLA scatter (3.5 ms at the Yelp envelope)
        z = _onehot_rows(rel_emb, sub["edge_type"])
    return h, z


class UNCTrainModel(nn.Module):
    """DistMult link prediction / supervised head around the GNN
    (model.py:632-737)."""

    num_nodes: int
    num_rels: int        # ORIGINAL count; model uses num_rels * 2
    h_dim: int
    nlabel: int = 0
    num_hidden_layers: int = 1
    dropout: float = 0.0
    reg_param: float = 0.0
    node_attri: Optional[Any] = None
    backbone: str = "DMPNN"
    multi: bool = False
    multihot_input: bool = False
    # pad_subgraph sorts edges by receiver, so aggregations can claim
    # indices_are_sorted=True. Round-1's "100x slower in-step" claim was a
    # relay host-clock artifact: re-measured with the device trace
    # (scripts/unc_step_bench.py, v5e, V=65k/E=524k, 2 layers) the full
    # train step is 124.9 ms sorted vs 129.9 ms unsorted (1.04x win), and
    # the isolated scatter at V=82k/E=498k is 4.49 ms sorted vs 7.47 ms
    # unsorted (1.66x win, scripts/kernel_bench.py). Default stays False
    # because correctness then depends on the CALLER's edge order (the
    # hint silently corrupts aggregation on unsorted input); the drivers,
    # whose pipeline always sorts, enable it. Edge-partitioned shards of a
    # globally sorted stream remain sorted, so the flag composes with
    # ep_axis.
    sorted_edges: bool = False
    # 128-lane padding of the DualGraphConv endpoint column table (round-4
    # experiment; DMPNN backbone only — the other backbones have no column
    # table)
    pad_cols: bool = False
    # Edge-partitioned execution (SURVEY §2.4): set to the shard_map axis
    # name when the model runs with edge arrays sharded across devices
    # (parallel/ep_unc.py). Node features stay replicated; every partial
    # edge-reduction (aggregation, degrees, BN stats, per-relation means,
    # edge-stream regularizer sums) is completed with a psum over this axis.
    ep_axis: Optional[str] = None
    # Node-state placement under ep_axis. "replicated" is the full-psum
    # path above; "owner" is the halo-exchange path (parallel/halo_unc.py):
    # node rows are partitioned by owner, every edge lives at its
    # receiver's owner (local aggregation, no per-layer psum), each layer
    # exchanges only boundary sender rows with one all_to_all, and the
    # DistMult/supervised losses all_gather the final [Vp, H] node outputs
    # once to score samples addressed by packed ids (owner * Vp + rank).
    node_sharding: str = "replicated"
    # "xla" | "windowed" (ops/segment_kernel.py; every backbone — the
    # receiver-stream pass plan is shared across layer types). The
    # drivers attach the plan to the sub dict
    # (segment_kernel.attach_scatter_plan / the per-shard builders).
    scatter_backend: str = "xla"

    def setup(self):
        if self.node_sharding == "owner" and self.nlabel > 0:
            # supervised_loss indexes the all_gathered packed table
            # (owner * Vp + rank); matched_index is only remapped by the
            # unsupervised halo builder — fail loudly instead of training
            # on silently-wrong rows
            raise NotImplementedError(
                "supervised head under node_sharding='owner' requires "
                "matched_index remapped to packed ids; use the "
                "replicated ep path or single-device for supervised runs")
        i_dim = (self.h_dim if self.node_attri is None
                 else self.node_attri.shape[1])
        kw = dict(num_nodes=self.num_nodes, num_rels=self.num_rels * 2,
                  h_dim=i_dim, out_dim=self.h_dim,
                  num_hidden_layers=self.num_hidden_layers,
                  dropout=self.dropout, node_attri=self.node_attri,
                  multihot_input=self.multihot_input,
                  sorted_edges=self.sorted_edges,
                  ep_axis=self.ep_axis,
                  node_sharding=self.node_sharding,
                  scatter_backend=self.scatter_backend)
        if self.backbone == "DMPNN":
            self.model = UNCDMPNN(pad_cols=self.pad_cols, **kw)
        elif self.backbone == "CompGCN":
            self.model = UNCCompGCN(**kw)
        elif self.backbone in ("RGCN", "RGIN"):
            self.model = UNCRGNN(kind=self.backbone.lower(), **kw)
        else:
            raise NotImplementedError(self.backbone)
        # the reference only creates w_relation in the unsupervised branch
        # (model.py:653-661) yet its supervised regularizer still references
        # it — an unreachable-in-practice AttributeError; we create it in
        # both modes so the shared regularizer is well-defined
        self.w_relation = self.param(
            "w_relation",
            xavier_uniform(jnp.sqrt(2.0)),  # gain('relu')
            (self.num_rels, self.h_dim))
        if self.nlabel > 0:
            self.node_fc = nn.Dense(
                self.nlabel, kernel_init=xavier_uniform(1.0),
                bias_init=nn.initializers.zeros, name="node_fc")
        self.edge_fc = nn.Dense(
            self.h_dim, kernel_init=xavier_uniform(1.0),
            bias_init=nn.initializers.zeros, name="edge_fc")

    def __call__(self, sub, train: bool = False):
        out = self.model(sub, train=train)
        pred = self.node_fc(out[0]) if self.nlabel > 0 else None
        return out, pred

    def _full_rows(self, x):
        """Owner-sharded mode: all_gather the per-shard node rows so packed
        ids (owner * Vp + rank, built by parallel/halo_unc.py) address the
        full [n*Vp, ...] table. No-op in replicated mode."""
        if self.node_sharding == "owner" and self.ep_axis:
            return jax.lax.all_gather(x, self.ep_axis, axis=0, tiled=True)
        return x

    def calc_score(self, node_emb, triplets):
        s = node_emb[triplets[:, 0]]
        r = _onehot_rows(self.w_relation, triplets[:, 1])
        o = node_emb[triplets[:, 2]]
        return jnp.sum(s * r * o, axis=1)

    def regularization(self, embedding, edge_type=None, edge_mask=None,
                       node_mask=None):
        """mean(w_rel^2) + sum_i mean(emb_i^2) + edge_fc alignment for the
        edge stream (model.py:691-715). The reference tensors are unpadded,
        so our means run over mask-valid rows only. The backbone output
        tuple is positional — 0: node rows, 1: edge rows, 2: per-relation
        means — and masks are associated positionally (the reference's
        size(0)-matching is the same association on unpadded shapes, but
        under padded/sharded envelopes leading dims can collide, e.g.
        Vp == 2*num_rels)."""
        reg = jnp.mean(self.w_relation ** 2)  # replicated params: no psum
        if not isinstance(embedding, (tuple, list)):
            embedding = (embedding,)

        def _psum(v):
            return jax.lax.psum(v, self.ep_axis) if self.ep_axis else v

        # psum-both-numerator-and-denominator is correct for sharded edge
        # streams AND replicated node/relation streams (factor cancels)
        masks = (node_mask, edge_mask, None)
        for emb, mask in zip(embedding, masks):
            reg = reg + _masked_mean_sq(emb, mask, psum=_psum)
        if edge_type is not None and len(embedding) > 1:
            emb = embedding[1]  # the per-edge stream (z)
            mask = jnp.logical_and(
                edge_type < self.num_rels,
                edge_mask if edge_mask is not None else True)
            diff = self.edge_fc(emb) - _onehot_rows(
                self.w_relation, edge_type, clip=True)
            sq = jnp.sum(diff ** 2, axis=1)
            cnt = jnp.maximum(_psum(jnp.sum(mask)), 1)
            reg = reg + _psum(jnp.sum(jnp.where(mask, sq, 0.0))) / (
                cnt * self.h_dim)
        return reg

    def unsupervised_loss(self, embedding, edge_type, edge_mask, samples,
                          labels, sample_mask, node_mask=None):
        score = self.calc_score(self._full_rows(embedding[0]), samples)
        bce = optax_sigmoid_bce(score, labels)
        cnt = jnp.maximum(jnp.sum(sample_mask), 1)
        predict_loss = jnp.sum(jnp.where(sample_mask, bce, 0.0)) / cnt
        reg = self.regularization(embedding, edge_type, edge_mask, node_mask)
        return predict_loss + self.reg_param * reg

    def supervised_loss(self, embedding, edge_type, edge_mask, pred,
                        matched_labels, matched_index, matched_mask, multi):
        p = self._full_rows(pred)[matched_index]
        if multi:
            logp = jax.nn.log_sigmoid(p)
            log1mp = jax.nn.log_sigmoid(-p)
            bce = -(matched_labels * logp + (1 - matched_labels) * log1mp)
            per = jnp.mean(bce, axis=1)
        else:
            logits = jax.nn.log_softmax(p, axis=-1)
            per = -jnp.take_along_axis(
                logits, matched_labels[:, None].astype(jnp.int32), axis=1)[:, 0]
        cnt = jnp.maximum(jnp.sum(matched_mask), 1)
        predict_loss = jnp.sum(jnp.where(matched_mask, per, 0.0)) / cnt
        reg = self.regularization(embedding, edge_type, edge_mask)
        return predict_loss + self.reg_param * reg  # node_mask via kwargs


def apply_unc_forward(model: "UNCTrainModel", params, batch_stats, sub,
                      dropout_rng, amp: bool = False, train: bool = True):
    """Forward apply shared by every UNC train-step maker (single-device,
    ep-psum, halo), with optional bf16 mixed precision.

    amp=True casts params to bf16 at the boundary and runs the backbone
    under utils/amp's trace-time compute dtype (frozen tables and norm/
    degree pins follow it); outputs come back cast to f32 so the DistMult
    score, regularizers, and supervised head run in f32 against the
    MASTER params. Aggregation accumulators and BatchNorm statistics stay
    f32 inside the model (_segment_sum_f32, MaskedBatchNorm).

    Returns ((out_tuple, pred), new_batch_stats)."""
    if amp:
        from ..utils.amp import cast_floats, compute_dtype_scope

        with compute_dtype_scope(jnp.bfloat16):
            variables = {"params": cast_floats(params, jnp.bfloat16)}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            (out, pred), mutated = model.apply(
                variables, sub, train=train, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
        out = cast_floats(out, jnp.float32)
        pred = cast_floats(pred, jnp.float32)
    else:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (out, pred), mutated = model.apply(
            variables, sub, train=train, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng})
    return (out, pred), mutated.get("batch_stats", {})


def init_unc_variables(model: "UNCTrainModel", key, sub):
    """Initialize ALL parameters, including the loss-path-only edge_fc /
    w_relation / node_fc (linen creates lazily only what a traced method
    touches).

    The init itself is jitted: un-jitted flax init dispatches every op
    eagerly, which on a remote-dispatch TPU costs ~1 ms per op (measured
    54 s for a 2-layer DMPNN envelope vs ~2 s jitted)."""

    if model.nlabel == 0:
        def full(mdl, sub):
            out, pred = mdl(sub, train=False)
            return mdl.unsupervised_loss(
                out, sub["edge_type"], sub["edge_mask"], sub["samples"],
                sub["labels"], sub["sample_mask"], sub["node_mask"])
    else:
        def full(mdl, sub):
            out, pred = mdl(sub, train=False)
            ml = (jnp.zeros((1, model.nlabel), jnp.float32) if model.multi
                  else jnp.zeros((1,), jnp.int32))
            return mdl.supervised_loss(
                out, sub["edge_type"], sub["edge_mask"], pred, ml,
                jnp.zeros((1,), jnp.int32), jnp.zeros((1,), bool),
                model.multi)

    return jax.jit(lambda k, s: model.init(k, s, method=full))(key, sub)


def _masked_mean_sq(x, mask, psum=lambda v: v):
    if mask is None:
        return psum(jnp.sum(x ** 2)) / jnp.maximum(
            psum(jnp.asarray(float(x.size))), 1.0)
    m = mask.astype(x.dtype)[:, None]
    return psum(jnp.sum((x ** 2) * m)) / jnp.maximum(
        psum(m.sum() * x.shape[-1]), 1.0)


def optax_sigmoid_bce(logits, labels):
    """binary_cross_entropy_with_logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
