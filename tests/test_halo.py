"""Owner-sharded halo-exchange edge partitioning (parallel/halo.py).

Forward equivalence: halo path == full-psum replicated path == the same
DMP math on one device, for both partitioners, on the 8-way virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dualmessagepassing_tpu.parallel import (
    init_edge_parallel_params,
    make_edge_parallel_dmp_apply,
    pad_to_multiple,
    shard_flat_edges,
)
from dualmessagepassing_tpu.parallel.halo import (
    ARG_ORDER,
    build_halo_partition,
    make_halo_dmp_apply,
    shard_halo_arrays,
    unshard_nodes,
)


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("ep",))


@pytest.mark.parametrize("method", ["degree", "range"])
def test_halo_forward_matches_full_psum(rng, method):
    V, E, H, L = 24, 96, 8, 2
    senders = rng.integers(0, V, E).astype(np.int32)
    receivers = rng.integers(0, V, E).astype(np.int32)
    rev = (rng.random(E) < 0.5)
    node_feat = rng.normal(size=(V, H)).astype(np.float32)
    edge_feat = rng.normal(size=(E, H)).astype(np.float32)
    params = init_edge_parallel_params(jax.random.PRNGKey(0), L, H)

    mesh = mesh8()
    # --- reference: replicated node state + full psum -------------------
    arrays = pad_to_multiple({
        "senders": senders, "receivers": receivers, "rev_flag": rev,
    }, 8)
    ef_pad = np.zeros((len(arrays["senders"]), H), np.float32)
    ef_pad[:E] = edge_feat
    fwd_psum = make_edge_parallel_dmp_apply(mesh, V, num_layers=L)
    with mesh:
        sh = shard_flat_edges(mesh, arrays)
        h_ref, e_ref = jax.jit(fwd_psum)(
            params, jnp.asarray(node_feat), jnp.asarray(ef_pad),
            sh["senders"], sh["receivers"], sh["rev_flag"],
            sh["edge_mask"])
    h_ref = np.asarray(h_ref)
    e_ref = np.asarray(e_ref)[:E]

    # --- owner-sharded halo path -----------------------------------------
    part = build_halo_partition(senders, receivers, rev, V, 8,
                                method=method)
    sharded = shard_halo_arrays(mesh, part, node_feat, edge_feat)
    fwd_halo = make_halo_dmp_apply(mesh, num_layers=L)
    with mesh:
        h_out, e_out = jax.jit(fwd_halo)(
            params, *[sharded[k] for k in ARG_ORDER])
    h_got = unshard_nodes(part, h_out)
    np.testing.assert_allclose(h_got, h_ref, atol=1e-5, rtol=1e-5)

    # edge outputs: map packed rows back through edge_perm
    e_arr = np.asarray(e_out)
    flat = []
    for s in range(8):
        k = int(part["edge_mask"][s].sum())
        flat.append(e_arr[s, :k])
    e_got = np.concatenate(flat)
    e_back = np.zeros_like(e_got)
    e_back[part["edge_perm"]] = e_got
    np.testing.assert_allclose(e_back, e_ref, atol=1e-5, rtol=1e-5)


def test_halo_partition_invariants(rng):
    V, E = 40, 200
    senders = rng.integers(0, V, E).astype(np.int32)
    receivers = rng.integers(0, V, E).astype(np.int32)
    part = build_halo_partition(senders, receivers,
                                np.zeros(E, bool), V, 8)
    # every node owned exactly once
    owned = part["owned_slice"]
    ids = owned[owned >= 0]
    assert sorted(ids.tolist()) == list(range(V))
    # every edge packed exactly once
    assert sorted(part["edge_perm"].tolist()) == list(range(E))
    # edges live on their receiver's owner
    ks = part["edge_mask"].sum(1)
    assert ks.sum() == E
    # boundary rows are consistent: send_idx[o, t] rows are owned by o
    assert part["send_idx"].max() < part["Vp"]
