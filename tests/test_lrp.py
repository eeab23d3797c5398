"""Tests for LRP perm enumeration + perm projection vs a dense oracle."""

import math
from itertools import permutations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualmessagepassing_tpu import ModelConfig, build_model, single_graph
from dualmessagepassing_tpu.data.dataset import GraphAdjDataset
from dualmessagepassing_tpu.data.lrp import count_perms, record_to_lrp_perms
from dualmessagepassing_tpu.data.synthetic import generate_dataset


def test_count_and_enumerate_perms():
    # star: 0 -> 1,2,3,4 ; other nodes have no out-edges
    rec = single_graph(5, [0, 0, 0, 0], [1, 2, 3, 4])
    assert count_perms(rec, 4) == 4 * 3 * 2 + 4  # P(4,3) + 4 empty perms
    perms = record_to_lrp_perms(rec, 4)
    assert perms["n_perm"] == 28
    # ego is always slot 0
    pm = perms["perm_mask"]
    assert (perms["perm_node"][pm][:, 0] == perms["perm_owner"][pm]).all()
    # node 0 perms have 4 valid slots; leaves have 1
    owner0 = perms["perm_owner"][pm] == 0
    assert (perms["perm_node_mask"][pm][owner0].sum(1) == 4).all()
    assert (perms["perm_node_mask"][pm][~owner0].sum(1) == 1).all()
    # edges (0, x) placed at (0, pos(x))
    pe_m = perms["perm_edge_mask"][pm][owner0]
    assert (pe_m.sum((1, 2)) == 3).all()  # 3 neighbor edges per full perm
    assert pe_m[:, 0, 1:].any()


def dense_oracle(perms, h, e, W, s):
    """Reference formulation: N2P/E2P sparse matmuls + einsum('dab,bca->dc')."""
    pm = perms["perm_mask"]
    n_perm = int(pm.sum())
    d = h.shape[-1]
    out = np.zeros((n_perm, W.shape[1]))
    for k in range(n_perm):
        grid = np.zeros((s * s, d))
        for i in range(s):
            if perms["perm_node_mask"][k, i]:
                grid[i * (s + 1)] += h[perms["perm_node"][k, i]]
        for i in range(s):
            for j in range(s):
                if perms["perm_edge_mask"][k, i, j]:
                    grid[i * s + j] += e[perms["perm_edge"][k, i, j]]
        out[k] = np.einsum("ab,bca->c", grid, W)
    return out


def test_perm_project_matches_oracle(rng):
    from dualmessagepassing_tpu.graph import batch_graphs
    from dualmessagepassing_tpu.models.lrp import LRPGraphBatch, perm_project

    rec = single_graph(6, rng.integers(0, 6, 10),
                       rng.integers(0, 6, 10), v_max=6, e_max=10)
    perms = record_to_lrp_perms(rec, 4)
    gb = batch_graphs([rec])
    g = LRPGraphBatch(
        senders=gb.senders, receivers=gb.receivers, node_id=gb.node_id,
        node_label=gb.node_label, edge_label=gb.edge_label,
        node_mask=gb.node_mask, edge_mask=gb.edge_mask,
        rev_flag=gb.rev_flag, n_node=gb.n_node, n_edge=gb.n_edge,
        **{k: jnp.asarray(v[None]) for k, v in perms.items()
           if k != "n_perm"})
    d, hdim, s = 5, 7, 4
    h = rng.normal(size=(1, 6, d)).astype(np.float32)
    e = rng.normal(size=(1, 10, d)).astype(np.float32)
    W = rng.normal(size=(d, hdim, s * s)).astype(np.float32)

    got = np.asarray(perm_project(g, jnp.asarray(h), jnp.asarray(e),
                                  jnp.asarray(W), s))[0]
    want = dense_oracle(perms, h[0].astype(np.float64),
                        e[0].astype(np.float64), W.astype(np.float64), s)
    pm = perms["perm_mask"]
    np.testing.assert_allclose(got[pm], want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rep_net", ["LRP", "DMPLRP"])
def test_lrp_models(rng, rep_net):
    data = generate_dataset(8, seed=9, pv=3, pe=3, gv=6, ge=10,
                            num_vlabels=2, num_elabels=2,
                            p_v_max=4, p_e_max=4, g_v_max=6, g_e_max=10)
    ds = GraphAdjDataset(data)
    cfg = ModelConfig(
        max_ngv=6, max_ngvl=2, max_nge=10, max_ngel=2,
        max_npv=4, max_npvl=2, max_npe=4, max_npel=2,
        hid_dim=8, rep_num_pattern_layers=2, rep_num_graph_layers=2,
        pred_hid_dim=8, filter_net="ScalarFilter", rep_net=rep_net,
        pred_return_weights="nodeedge",
    )
    model = build_model(cfg)
    ids, pattern, graph, counts, _ = ds.batchify_lrp(range(4), "none")
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    out = model.apply(params, pattern, graph)
    assert out["pred_c"].shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out["pred_c"])))

    def loss(p):
        o = model.apply(p, pattern, graph)
        return (jnp.mean((o["pred_c"] - 1.0) ** 2)
                + jnp.mean(o["g_v_rep"] ** 2) + jnp.mean(o["g_e_rep"] ** 2))

    grads = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(grads))
