"""Pallas TPU segment-sum kernel for flat graphs.

XLA lowers `.at[receivers].add(messages)` to a serialized scatter-add —
memory-bound and sequential. This kernel reformulates the aggregation as a
sequence of MXU matmuls: the edge stream is tiled into VMEM-sized blocks,
each block builds a one-hot receiver matrix [TILE_E, V] on the VPU and
multiplies it into the resident [V, H] accumulator on the MXU. TPU grid
iterations run sequentially on a core, so the accumulator (the kernel
output, mapped to the full array every step) carries across steps without
atomics.

Cost: E/TILE_E matmuls of [V, TILE_E] x [TILE_E, H] — O(E*V*H) MXU FLOPs
traded for the scatter's O(E*H) serialized HBM round trips.

MEASURED (TPU v5e, 1 chip, f32, H=64):
    V=64,  E=4k  : pallas 0.95x of XLA scatter
    V=512, E=64k : pallas 0.28x of XLA scatter
XLA's native scatter-add is strong on this generation and the O(E*V*H)
FLOP trade does not pay — so this kernel is EXPERIMENTAL and NOT wired as a
default path (ops/scatter.py keeps the one-hot-einsum + scatter heuristics).
It is retained as the starting point for a sorted-CSR revision (contiguous
per-row accumulation, O(E*H) with no serialization), the roadmap item from
SURVEY §7.3.

Falls back to jnp scatter on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _kernel(recv_ref, msg_ref, out_ref):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    recv = recv_ref[:]                       # [TILE_E, 1] int32
    msg = msg_ref[:]                         # [TILE_E, H]
    v = out_ref.shape[0]
    onehot = (
        recv[:, 0][None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (v, 1), 0)
    ).astype(msg.dtype)                      # [V, TILE_E]
    out_ref[:] += jnp.dot(onehot, msg, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_nodes", "tile_e"))
def pallas_segment_sum(messages: jnp.ndarray, receivers: jnp.ndarray,
                       num_nodes: int, tile_e: int = 512) -> jnp.ndarray:
    """messages [E, H] + receivers [E] -> [num_nodes, H].

    E must be a multiple of tile_e (pad with an out-of-range receiver and
    zero messages). Masked edges should carry zero messages and any valid
    receiver, or receiver == num_nodes (rows beyond V never match).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, h = messages.shape
    assert e % tile_e == 0, f"E={e} not a multiple of tile_e={tile_e}"
    grid = (e // tile_e,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_e, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_e, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_nodes, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
    )(receivers.astype(jnp.int32)[:, None], messages)


def segment_sum_auto(messages: jnp.ndarray, receivers: jnp.ndarray,
                     edge_mask: Optional[jnp.ndarray], num_nodes: int,
                     tile_e: int = 512) -> jnp.ndarray:
    """Pallas path on TPU (with padding), scatter fallback elsewhere."""
    msg = messages
    if edge_mask is not None:
        msg = jnp.where(edge_mask[:, None], msg, 0.0)
    if jax.default_backend() != "tpu":
        return jnp.zeros((num_nodes,) + msg.shape[1:], msg.dtype
                         ).at[receivers].add(msg)
    e = msg.shape[0]
    pad = (-e) % tile_e
    if pad:
        msg = jnp.concatenate(
            [msg, jnp.zeros((pad, msg.shape[1]), msg.dtype)])
        receivers = jnp.concatenate(
            [receivers, jnp.zeros((pad,), receivers.dtype)])
    return pallas_segment_sum(msg, receivers, num_nodes, tile_e)
