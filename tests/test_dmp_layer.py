"""Golden-value tests for DMPLayer against an independent numpy oracle.

The oracle below re-derives the dual-message-passing math directly from the
paper semantics (edge loop over the COO list), with no code shared with the
JAX implementation — a bug in one will not hide in the other.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualmessagepassing_tpu.graph import GraphBatch, batch_graphs, single_graph, add_reversed_edges
from dualmessagepassing_tpu.models.dmpnn import DMPLayer, DMPNNStack


def np_dmp_layer(params, senders, receivers, rev_flag, v, e, num_nodes):
    """Numpy oracle for one DMPLayer (no MLP, identity handled outside)."""
    w_in = params["in_weight"]
    w_out = params["out_weight"]
    w_nloop = params["nloop_weight"]
    w_src = params["src_weight"]
    w_dst = params["dst_weight"]
    w_eloop = params["eloop_weight"]
    b_n = params["nbias"]
    b_e = params["ebias"]

    E = len(senders)
    H = w_in.shape[1]
    agg = np.zeros((num_nodes, H), np.float64)
    edge_msg = np.zeros((E, H), np.float64)
    out_deg = np.bincount(senders, minlength=num_nodes).astype(np.float64)

    for i in range(E):
        u, d = senders[i], receivers[i]
        if rev_flag[i]:
            edge_msg[i] = v[u] @ w_dst - v[d] @ w_src
            agg[d] += e[i] @ w_out
        else:
            edge_msg[i] = v[d] @ w_dst - v[u] @ w_src
            agg[d] += -(e[i] @ w_in)

    v_out = v @ w_nloop + agg + b_n

    e_out = np.zeros((E, H), np.float64)
    for i in range(E):
        dd = np.log2(1.0 + out_deg[receivers[i]])
        add = 2.0 * (1.0 + dd) * (e[i] @ (w_src - w_dst))
        e_out[i] = e[i] @ w_eloop + add + edge_msg[i] + b_e
    return v_out, e_out


def np_mlp(params, x):
    """fc0 -> relu -> fc1 (no batch norm), matching UpdateMLP layout."""
    h = x @ params["fc0"]["kernel"] + params["fc0"]["bias"]
    h = np.maximum(h, 0)
    return h @ params["fc1"]["kernel"] + params["fc1"]["bias"]


def build_graph(rng, n=6, m=10, rev=False):
    senders = rng.integers(0, n, size=m)
    receivers = rng.integers(0, n, size=m)
    rec = single_graph(n, senders, receivers,
                       node_labels=rng.integers(0, 3, size=n),
                       edge_labels=rng.integers(0, 3, size=m))
    if rev:
        rec = add_reversed_edges(rec, num_edge_labels=3)
    return rec


@pytest.mark.parametrize("rev", [False, True])
def test_dmp_layer_matches_oracle(rng, rev):
    rec = build_graph(rng, rev=rev)
    g = batch_graphs([rec])
    n, m = g.max_nodes, g.max_edges

    h = 8
    v_feat = rng.normal(size=(1, n, h)).astype(np.float32)
    e_feat = rng.normal(size=(1, m, h)).astype(np.float32)

    layer = DMPLayer(hidden_dim=h, init_neigenv=4.0, init_eeigenv=4.0,
                     num_mlp_layers=2, batch_norm=False, act="relu")
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(v_feat),
                        jnp.asarray(e_feat))
    v_out, e_out = layer.apply(params, g, jnp.asarray(v_feat),
                               jnp.asarray(e_feat))

    p = jax.tree.map(np.asarray, params["params"])
    flat = {k: p[k] for k in ("in_weight", "out_weight", "nloop_weight",
                              "src_weight", "dst_weight", "eloop_weight",
                              "nbias", "ebias")}
    em = np.asarray(g.edge_mask[0])
    want_v, want_e = np_dmp_layer(
        flat,
        np.asarray(g.senders[0])[em],
        np.asarray(g.receivers[0])[em],
        np.asarray(g.rev_flag[0])[em],
        v_feat[0].astype(np.float64),
        e_feat[0][em].astype(np.float64),
        n,
    )
    want_v = np_mlp(p["nmlp"], want_v)
    want_e = np_mlp(p["emlp"], want_e)

    np.testing.assert_allclose(np.asarray(v_out)[0], want_v, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e_out)[0][em], want_e, rtol=1e-4, atol=1e-4)


def test_eigenvalue_reparam_scales_init():
    """W_in/W_out/W_nloop scale with 1/neigenv; W_src/W_dst/W_eloop with 1/eeigenv."""
    rng = np.random.default_rng(0)
    rec = build_graph(rng)
    g = batch_graphs([rec])
    h = 8
    v = jnp.zeros((1, g.max_nodes, h))
    e = jnp.zeros((1, g.max_edges, h))

    p1 = DMPLayer(hidden_dim=h, init_neigenv=1.0, init_eeigenv=1.0).init(
        jax.random.PRNGKey(7), g, v, e)["params"]
    p2 = DMPLayer(hidden_dim=h, init_neigenv=5.0, init_eeigenv=2.0).init(
        jax.random.PRNGKey(7), g, v, e)["params"]
    np.testing.assert_allclose(np.asarray(p2["in_weight"]),
                               np.asarray(p1["in_weight"]) / 5.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["eloop_weight"]),
                               np.asarray(p1["eloop_weight"]) / 2.0, rtol=1e-6)


def test_padding_invariance(rng):
    """Outputs on real entries must not change when the envelope grows."""
    senders = rng.integers(0, 5, size=7)
    receivers = rng.integers(0, 5, size=7)
    small = single_graph(5, senders, receivers, v_max=5, e_max=7)
    big = single_graph(5, senders, receivers, v_max=9, e_max=13)
    h = 4
    stack = DMPNNStack(num_layers=2, hidden_dim=h)

    def run(rec, v_max, e_max):
        g = batch_graphs([rec])
        v = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32), (1, v_max, h))
        e = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32), (1, e_max, h))
        v = v * g.node_mask[..., None]
        e = e * g.edge_mask[..., None]
        params = stack.init(jax.random.PRNGKey(1), g, v, e)
        return stack.apply(
            params, g, v, e,
            v_gate=g.node_mask.astype(jnp.float32)[..., None],
            e_gate=g.edge_mask.astype(jnp.float32)[..., None],
        )

    v1, e1 = run(small, 5, 7)
    v2, e2 = run(big, 9, 13)
    np.testing.assert_allclose(np.asarray(v1)[0], np.asarray(v2)[0, :5],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e1)[0], np.asarray(e2)[0, :7],
                               rtol=1e-5, atol=1e-5)
    # padded slots stay exactly zero
    assert np.all(np.asarray(v2)[0, 5:] == 0)
    assert np.all(np.asarray(e2)[0, 7:] == 0)
