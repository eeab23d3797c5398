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

MEASURED round 2 with the DEVICE-TRACE clock (scripts/kernel_bench.py,
TPU v5e, 1 chip, f32, H=64; "XLA Modules" lane, 10+ iters; the round-1
host-clock table recorded here before was retracted — the relay clock
lies in both directions):

    variant              V=64/E=4k   V=512/E=64k  V=2k/E=262k  V=82k/E=498k
    xla_scatter          0.032 ms    0.471 ms     2.077 ms      7.472 ms
    xla_scatter_sorted   0.039       0.599        2.586         4.493
    onehot_einsum        0.004       0.098        0.671        36.024
    pallas_segment_sum   0.038       4.314       73.882            —
    pallas_csr           —           2.451       10.752        25.902
    HBM roofline         0.0013      0.021        0.084         0.184

Conclusions (device-trace, supersede round 1):
  (1) NOTHING is near speed-of-light: the best variant per size is
      3-24x off the HBM roofline. XLA scatter is NOT >=80% of roofline
      (it is 2.5-4.5%), so the kernel thread stays OPEN.
  (2) The one-hot einsum is the right default for small/mid V (3-8x
      faster than scatter up to V=2k, 3-8x off roofline) — the SCM hot
      path already uses it (ops/scatter.py). It collapses at V=82k.
  (3) The sorted-scatter hint WINS at large V: 1.66x isolated at
      V=82k, and 1.04x on the full UNC train step (unc/model.py:450,
      scripts/unc_step_bench.py) — the round-1 "100x slower in-step"
      was a host-clock artifact. The UNC drivers enable it.
  (4) Both Pallas kernels genuinely lose everywhere measured (0.03x to
      0.29x of scatter) — the round-1 relative numbers were flattering.
      They stay EXPERIMENTAL and off the default paths.

Hard-won Mosaic lessons kept for future kernels:
  * HBM->VMEM DMA slice starts must be provably tile-aligned. A dynamic
    ``lo + c*tile_e`` start compiles but hits the slow unaligned copy
    path (~6x whole-kernel regression); iterating absolute chunk indices
    with ``pl.multiple_of(c*tile_e, tile_e)`` restores the fast path.
    Out-of-range rows self-mask through the one-hot compare because the
    stream is sorted.
  * The last-dim of any DMA'd slice must be a multiple of 128 lanes:
    pack H<128 messages + the receiver id (as float) into one 128-wide
    buffer rather than issuing a second narrow DMA.
  * f32 accuracy requires precision=HIGHEST on the one-hot matmul
    (default bf16 passes round the messages: 3e-2 max error).

Falls back to jnp scatter on non-TPU backends.

SUPERSEDED at large V by ops/segment_kernel.py (round 2): the windowed
pass-per-(chunk, window) kernel beats XLA scatter 2.35-2.64x at
V=82k/E=498k — the key fixes over the kernels here were eliminating an
in-kernel lane->sublane relayout (~16us/call) and switching from manual
double-buffered DMA (~60 GB/s effective) to BlockSpec-pipelined 128-lane
streams (671 GB/s). These two kernels remain as documented experiments.
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


def _csr_kernel(row_ptr_ref, packed_hbm, out_ref, acc, s_pack, sem,
                *, tile_v, tile_e, num_rows, h):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    lo = row_ptr_ref[t * tile_v]
    hi = row_ptr_ref[jnp.minimum((t + 1) * tile_v, num_rows)]
    acc[:] = jnp.zeros_like(acc)
    # Absolute edge-chunk range covering [lo, hi): every DMA start is a
    # static multiple of tile_e, so Mosaic takes the fast tile-aligned
    # copy path (a dynamic `lo + c*tile_e` start forces the slow
    # unaligned path — measured ~100x worse). Edges inside a chunk that
    # belong to neighbouring row-tiles self-mask: receivers are sorted,
    # so their local index falls outside [0, tile_v) in the one-hot.
    c_lo = lo // tile_e
    c_hi = (hi + tile_e - 1) // tile_e

    # one 128-lane-aligned DMA per chunk: columns [0, h) are the
    # messages, the last column carries the receiver id as float.
    # Double-buffered: chunk c+1 streams in while chunk c computes.
    def dma(c, slot):
        start = pl.multiple_of(c * tile_e, tile_e)
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(start, tile_e), :],
            s_pack.at[slot], sem.at[slot])

    @pl.when(hi > lo)
    def _prologue():
        dma(c_lo, jax.lax.rem(c_lo, 2)).start()

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < c_hi)
        def _prefetch():
            dma(c + 1, 1 - slot).start()

        dma(c, slot).wait()
        chunk = s_pack[slot]                              # [TILE_E, 128]
        recv = chunk[:, chunk.shape[1] - 1].astype(jnp.int32)
        local = recv[None, :] - t * tile_v                # [1, TILE_E]
        onehot = (
            local == jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0)
        ).astype(jnp.float32)                             # [TILE_V, TILE_E]
        acc[:] += jnp.dot(onehot, chunk[:, :h],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return carry

    jax.lax.fori_loop(c_lo, c_hi, body, 0)
    out_ref[:] = acc[:]


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "tile_v", "tile_e"))
def pallas_csr_segment_sum(messages_sorted: jnp.ndarray,
                           receivers_sorted: jnp.ndarray,
                           row_ptr: jnp.ndarray,
                           num_nodes: int,
                           tile_v: int = 256,
                           tile_e: int = 512) -> jnp.ndarray:
    """Sorted-CSR segment-sum: the roadmap revision.

    Edges must be pre-sorted by receiver (host-side, alongside CSR row_ptr
    [V+1]); the kernel tiles output rows, streams each row-tile's edge
    range from HBM in TILE_E chunks (double-buffered by the DMA engine),
    and accumulates with a LOCAL one-hot matmul of width TILE_V — O(E*H)
    memory traffic with MXU-shaped compute, no serialized scatter.

    num_nodes must be a multiple of tile_v (pad row_ptr by repeating the
    last value); messages must be padded by at least tile_e rows beyond the
    last edge (garbage reads are masked).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e_pad, h = messages_sorted.shape
    assert h < 128, "pack width 128: supports H <= 127 (pad or split wider)"
    assert num_nodes % tile_v == 0
    grid = (num_nodes // tile_v,)
    # pack messages + receiver-as-float into a 128-lane-aligned buffer
    pack = jnp.zeros((e_pad, 128), jnp.float32)
    pack = pack.at[:, :h].set(messages_sorted)
    pack = pack.at[:, 127].set(receivers_sorted.astype(jnp.float32))
    kernel = functools.partial(_csr_kernel, tile_v=tile_v, tile_e=tile_e,
                               num_rows=num_nodes, h=h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed (HBM)
        ],
        out_specs=pl.BlockSpec((tile_v, h), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_v, h), jnp.float32),
            pltpu.VMEM((2, tile_e, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
    )(row_ptr.astype(jnp.int32), pack)


def csr_sort_host(receivers, num_nodes, tile_e: int = 512):
    """Host-side CSR preparation for pallas_csr_segment_sum:
    (order, row_ptr padded to multiple-of-tile_v rows + 1)."""
    import numpy as np

    recv = np.asarray(receivers)
    order = np.argsort(recv, kind="stable")
    counts = np.bincount(recv, minlength=num_nodes)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return order, row_ptr


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
