"""Edge-partitioned execution of the REAL UNC model (round-2 VERDICT #2).

Runs `UNCTrainModel` — the full DualGraphConv / CompGCN / R-GCN / R-GIN
stack with update MLPs, batch norm, edge_norm, DistMult loss and all three
regularizers (reference Model/DMPNN/src/model.py:117-280, 632-737) — under
`shard_map` with the edge/dual-node state sharded across the 'ep' mesh axis
and node state replicated (V << E for the target workloads: Yelp 30.5M
edges over 82K nodes).

Collective schedule per layer (see unc/model.py `ep_axis`):
  * one psum completes the node aggregation ([V, H], rides ICI),
  * one psum for out-degrees (reused), two [H]-wide psums for each
    BatchNorm's global statistics,
and per loss: [R,H]/scalar psums for the per-relation edge means and the
edge-stream regularizer sums. Gradients need no manual collectives —
shard_map's transpose inserts the psums for the replicated parameters.

The simplified demonstration layer lives in parallel/edge_partition.py;
this module is the production path wired into train_unc(ep_devices=...).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..unc.model import UNCTrainModel

# per-edge arrays sharded over 'ep'; everything else replicated. The sk_*
# entries are the windowed-scatter-kernel pass plans (one per shard,
# concatenated along axis 0 by attach_ep_scatter_plans so the same P('ep')
# sharding hands each shard its own plan).
EDGE_KEYS = ("senders", "receivers", "edge_type", "rev_flag", "edge_mask",
             "edge_norm", "sk_blk", "sk_win", "sk_first", "sk_recv",
             # round-5: per-shard twins of the round-4 single-device
             # kernel plans (VERDICT r4 item 2) — sb_* = row-broadcast
             # (forward receiver gather + aggregation backward gather),
             # sk2_*/send_order = senders-sorted windowed cotangent
             "sb_blk", "sb_win", "sb_first",
             "sk2_blk", "sk2_win", "sk2_first", "sk2_recv", "send_order")


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm  # jax >= 0.8

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def sub_specs(sub: Dict[str, jnp.ndarray]) -> Dict[str, P]:
    return {k: (P("ep") if k in EDGE_KEYS else P()) for k in sub}


def shard_sub(mesh: Mesh, sub: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """device_put a padded flat subgraph with edge arrays sharded over 'ep'.

    The edge envelope (e_max) must divide the mesh size — round it up with
    `pad_e_max` when building the envelope."""
    n = mesh.devices.size
    e = len(sub["senders"])
    if e % n:
        raise ValueError(f"e_max={e} not divisible by mesh size {n}; "
                         f"use pad_e_max")
    out = {}
    for k, v in sub.items():
        spec = P("ep") if k in EDGE_KEYS else P()
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def pad_e_max(e_max: int, n_devices: int) -> int:
    return -(-e_max // n_devices) * n_devices


def attach_ep_scatter_plans(padded: Dict[str, np.ndarray], n_shards: int,
                            tile_e: Optional[int] = None,
                            window: Optional[int] = None,
                            bcast_plan: bool = False,
                            sender_plan: bool = False
                            ) -> Dict[str, np.ndarray]:
    """Windowed-kernel pass plans for every contiguous edge slice shard_sub
    will create (host side, per batch).

    Each shard's slice of the receiver-sorted stream is itself
    receiver-sorted with its real edges as a prefix (pad_subgraph keeps
    pads at the global tail), so a per-shard plan over the FULL node range
    is valid; the model's per-shard partial aggregation is then completed
    by the existing [V, H] psum (unc/model.py ep_axis). Plan shapes depend
    only on (e_max/n_shards, v_max), so every batch of a run compiles to
    one program.

    bcast_plan adds per-shard sb_* row-broadcast twin plans (forward
    receiver gather from the replicated cols table + the aggregation's
    backward gather through the Pallas kernel — the node table is full-V
    replicated under ep-psum, so the single-device plan semantics apply
    per slice verbatim). sender_plan adds the senders-sorted sk2_* twin
    plus the per-shard local sort `send_order` (the sendwin cotangent);
    the full slice including pad rows is treated as real, exactly as
    attach_scatter_plan does single-device — pads carry zero cotangents.
    (Round-5, VERDICT r4 item 2.)"""
    from ..ops.segment_kernel import (DEFAULT_TILE_E, DEFAULT_WINDOW,
                                      build_pass_plan, plan_bcast_arrays,
                                      plan_sk_arrays)

    tile_e = tile_e or DEFAULT_TILE_E
    window = window or DEFAULT_WINDOW
    e_max = len(padded["receivers"])
    if e_max % n_shards:
        raise ValueError(f"e_max={e_max} not divisible by {n_shards}")
    k = e_max // n_shards
    v_max = len(padded["node_mask"])
    recv = np.asarray(padded["receivers"])
    send = np.asarray(padded["senders"])
    mask = np.asarray(padded["edge_mask"])
    parts = []
    for s in range(n_shards):
        m = mask[s * k: (s + 1) * k]
        n_real = int(m.sum())
        p = plan_sk_arrays(recv[s * k: s * k + n_real],
                           v_max, k, tile_e, window)
        if bcast_plan:
            p.update(plan_bcast_arrays(recv[s * k: s * k + n_real],
                                       v_max, k, tile_e, window))
        if sender_plan:
            order = np.argsort(send[s * k: (s + 1) * k],
                               kind="stable").astype(np.int64)
            p["send_order"] = order
            p2 = build_pass_plan(send[s * k: (s + 1) * k][order], v_max,
                                 e_env=k, v_env=v_max, tile_e=tile_e,
                                 window=window)
            p["sk2_blk"] = p2["blk"]
            p["sk2_win"] = p2["win"]
            p["sk2_first"] = p2["first"]
            p["sk2_recv"] = p2["recv_col"]
        parts.append(p)
    out = dict(padded)
    for key in parts[0]:
        out[key] = np.concatenate([p[key] for p in parts], axis=0)
    return out


def make_ep_model(**model_kwargs) -> UNCTrainModel:
    """UNCTrainModel configured for the 'ep' axis."""
    return UNCTrainModel(ep_axis="ep", **model_kwargs)


def _out_spec(model: UNCTrainModel):
    """PartitionSpecs of the backbone's output tuple: the edge stream (z/r
    per edge) is 'ep'-sharded; node embeddings and per-relation means are
    replicated (completed by in-model psums)."""
    if model.backbone == "DMPNN":     # (h, z, r_bar)
        return (P(), P("ep"), P())
    if model.backbone == "CompGCN":   # (h, r)
        return (P(), P("ep"))
    return (P(),)                     # (h,)


def make_ep_apply(model: UNCTrainModel, mesh: Mesh) -> Callable:
    """Jitted edge-partitioned forward: (variables, sub) -> (out_tuple, pred).

    Forward-only (train=False); for training use make_ep_train_step."""

    @jax.jit
    def fwd(variables, sub):
        def inner(variables, sub):
            out, pred = model.apply(variables, sub, train=False)
            # pred is None in unsupervised mode; shard_map outputs must be
            # arrays, so substitute a scalar placeholder
            return out, (pred if pred is not None else jnp.zeros(()))

        return _shard_map(
            inner, mesh,
            in_specs=(P(), sub_specs(sub)),
            out_specs=(_out_spec(model), P()),
        )(variables, sub)

    return fwd


def make_ep_train_step(model: UNCTrainModel, tx, mesh: Mesh,
                       amp: bool = False) -> Callable:
    """Jitted edge-partitioned unsupervised train step with the FULL loss:
    DistMult BCE + reg_param * (w_rel/embedding/edge_fc-alignment regs)
    (reference model.py:691-723), Adam/any-optax update.

    Matches make_unc_train_step's signature:
      (params, opt_state, batch_stats, sub, dropout_rng)
        -> (params, opt_state, batch_stats, loss)
    Parameter gradients come out all-reduced by shard_map's transpose.
    amp=True runs the backbone in bf16 with f32 master params / loss
    (unc.model.apply_unc_forward).
    """
    import optax

    from ..unc.model import apply_unc_forward

    @jax.jit
    def step(params, opt_state, batch_stats, sub, dropout_rng):
        spec = sub_specs(sub)

        def loss_fn(p):
            def inner(p, batch_stats, sub, rng):
                (out, _pred), new_stats = apply_unc_forward(
                    model, p, batch_stats, sub, rng, amp=amp)
                loss = model.apply(
                    {"params": p}, out, sub["edge_type"], sub["edge_mask"],
                    sub["samples"], sub["labels"], sub["sample_mask"],
                    sub["node_mask"],
                    method=UNCTrainModel.unsupervised_loss)
                return loss, new_stats

            # loss and BN stats are psum-completed inside the model, hence
            # identical on every shard -> replicated out_specs
            return _shard_map(
                inner, mesh,
                in_specs=(P(), P(), spec, P()),
                out_specs=(P(), P()),
            )(p, batch_stats, sub, dropout_rng)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (new_stats if batch_stats else batch_stats), loss

    return step
