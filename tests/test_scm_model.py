import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualmessagepassing_tpu import ModelConfig, batch_graphs, build_model, single_graph
from dualmessagepassing_tpu.graph import add_reversed_edges


def make_pair_batch(rng, bsz=2, pv=4, pe=6, gv=8, ge=16, nvl=3, nel=3):
    pats, gras = [], []
    for _ in range(bsz):
        pats.append(single_graph(
            pv, rng.integers(0, pv, size=pe), rng.integers(0, pv, size=pe),
            node_labels=rng.integers(0, nvl, size=pv),
            edge_labels=rng.integers(0, nel, size=pe),
            v_max=pv, e_max=pe))
        gras.append(single_graph(
            gv, rng.integers(0, gv, size=ge), rng.integers(0, gv, size=ge),
            node_labels=rng.integers(0, nvl, size=gv),
            edge_labels=rng.integers(0, nel, size=ge),
            v_max=gv, e_max=ge))
    return batch_graphs(pats), batch_graphs(gras)


def small_config(**kw):
    base = dict(
        max_ngv=8, max_ngvl=3, max_nge=16, max_ngel=3,
        max_npv=4, max_npvl=3, max_npe=6, max_npel=3,
        hid_dim=16, rep_num_pattern_layers=2, rep_num_graph_layers=2,
        pred_hid_dim=16, filter_net="ScalarFilter",
        pred_return_weights="nodeedge",
    )
    base.update(kw)
    return ModelConfig(**base)


def test_dmpnn_forward_shapes(rng):
    pattern, graph = make_pair_batch(rng)
    cfg = small_config()
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    out = model.apply(params, pattern, graph)
    assert out["pred_c"].shape == (2, 1)
    assert out["pred_v"].shape == (2, 8)
    assert out["pred_e"].shape == (2, 16)
    assert out["g_v_rep"].shape == (2, 8, 16)
    assert out["g_e_rep"].shape == (2, 16, 16)
    assert np.all(np.isfinite(np.asarray(out["pred_c"])))


def test_dmpnn_jit_and_grad(rng):
    pattern, graph = make_pair_batch(rng)
    cfg = small_config()
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), pattern, graph)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, pattern, graph)
        # pred_fc2 is zero-init (reference pred.py:50), so pred_c == 0 at
        # init; include reps so every path carries gradient.
        return (jnp.mean((out["pred_c"] - 1.0) ** 2)
                + jnp.mean(out["g_v_rep"] ** 2)
                + jnp.mean(out["g_e_rep"] ** 2))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # rep-net weights receive gradient
    gn = np.asarray(
        g["params"]["g_rep_net"]["dmpnn_0"]["in_weight"]
    )
    assert np.abs(gn).sum() > 0


def test_dmpnn_with_extras(rng):
    """pred_with_enc + pred_with_deg + add ids + reversed edges."""
    pats, gras = [], []
    for _ in range(2):
        p = single_graph(4, rng.integers(0, 4, 6), rng.integers(0, 4, 6),
                         node_labels=rng.integers(0, 3, 4),
                         edge_labels=rng.integers(0, 3, 6),
                         v_max=4, e_max=6)
        g = single_graph(8, rng.integers(0, 8, 16), rng.integers(0, 8, 16),
                         node_labels=rng.integers(0, 3, 8),
                         edge_labels=rng.integers(0, 3, 16),
                         v_max=8, e_max=16)
        pats.append(add_reversed_edges(p, 3))
        gras.append(add_reversed_edges(g, 3))
    pattern, graph = batch_graphs(pats), batch_graphs(gras)
    cfg = small_config(
        max_nge=32, max_npe=12, max_ngel=6, max_npel=6,
        pred_with_enc=True, pred_with_deg=True,
        gnn_add_node_id=True, gnn_add_edge_id=True,
    )
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    out = model.apply(params, pattern, graph)
    assert np.all(np.isfinite(np.asarray(out["pred_c"])))
    # reversed edges are masked out of the edge prediction mask
    assert np.asarray(out["g_e_mask"]).sum() == 2 * 16


def test_share_rep_net_parameter_count(rng):
    pattern, graph = make_pair_batch(rng)
    n_shared = sum(
        x.size for x in jax.tree.leaves(
            build_model(small_config(share_rep_net=True)).init(
                jax.random.PRNGKey(0), pattern, graph))
    )
    n_sep = sum(
        x.size for x in jax.tree.leaves(
            build_model(small_config(share_rep_net=False)).init(
                jax.random.PRNGKey(0), pattern, graph))
    )
    assert n_sep > n_shared


def test_equivariant_embedding_is_circulant():
    import jax
    import jax.numpy as jnp
    from dualmessagepassing_tpu.models.embed import Embedding

    emb = Embedding(6, 6, weight_init="equivariant")
    params = emb.init(jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32))
    w = np.asarray(params["params"]["weight"])
    for i in range(6):
        np.testing.assert_allclose(w[i], np.roll(w[0], i), rtol=1e-6)


def test_remove_loops(rng):
    from dualmessagepassing_tpu.data.dataset import GraphAdjDataset
    from dualmessagepassing_tpu.data.synthetic import generate_pair

    x = generate_pair(rng, pv=3, pe=3, gv=6, ge=10)
    # force some self loops into the graph record
    rec = x["graph"]
    rec["receivers"][:2] = rec["senders"][:2]
    ds = GraphAdjDataset([x])
    ds.remove_loops()
    rec = ds.data[0]["graph"]
    em = rec["edge_mask"]
    assert (rec["senders"][em] != rec["receivers"][em]).all()
    assert int(rec["n_edge"]) == 8


def test_auto_envelope_batchify(rng):
    """Ladder-sliced batches must produce identical model outputs on real
    entries, at a smaller compiled shape."""
    from dualmessagepassing_tpu.data.dataset import GraphAdjDataset
    from dualmessagepassing_tpu.data.synthetic import generate_dataset

    # records padded to a generous envelope; true sizes much smaller
    data = generate_dataset(8, seed=4, pv=3, pe=3, gv=6, ge=10,
                            num_vlabels=2, num_elabels=2,
                            p_v_max=16, p_e_max=32, g_v_max=64, g_e_max=128)
    ds = GraphAdjDataset(data)
    _, p_full, g_full, c, (nw_f, ew_f) = ds.batchify(range(8), "node,edge")
    _, p_auto, g_auto, c2, (nw_a, ew_a) = ds.batchify(
        range(8), "node,edge", auto_envelope=True)
    assert g_auto.max_nodes == 8      # next pow2 >= 6
    assert g_auto.max_edges == 16     # next pow2 >= 10
    assert g_full.max_nodes == 64

    from dualmessagepassing_tpu import ModelConfig, build_model
    cfg = ModelConfig(max_ngv=64, max_ngvl=2, max_nge=128, max_ngel=2,
                      max_npv=16, max_npvl=2, max_npe=32, max_npel=2,
                      hid_dim=8, rep_num_pattern_layers=2,
                      rep_num_graph_layers=2, pred_hid_dim=8,
                      filter_net="ScalarFilter",
                      pred_return_weights="nodeedge")
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), p_full, g_full)
    out_full = model.apply(params, p_full, g_full)
    out_auto = model.apply(params, p_auto, g_auto)
    np.testing.assert_allclose(np.asarray(out_full["pred_c"]),
                               np.asarray(out_auto["pred_c"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_full["pred_v"])[:, :8],
                               np.asarray(out_auto["pred_v"]),
                               rtol=1e-4, atol=1e-5)


def test_position_encoding_model(rng):
    """enc_net=Position end to end (basemodel.py:983-988)."""
    pattern, graph = make_pair_batch(rng)
    cfg = small_config(enc_net="Position", emb_net="Normal")
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    out = model.apply(params, pattern, graph)
    assert np.all(np.isfinite(np.asarray(out["pred_c"])))


import pytest


@pytest.mark.parametrize("rep_net,extra", [
    ("DMPNN", {}),
    ("CompGCN", {}),
    ("RGCN", {"rep_rgcn_num_bases": 2}),
    ("RGIN", {"rep_rgin_num_bases": 2}),
])
def test_remat_equivalence(rng, rep_net, extra):
    """rep_remat=True must be a pure memory/recompute trade: identical
    forward outputs and (to float tolerance) identical gradients."""
    pattern, graph = make_pair_batch(rng)
    m0 = build_model(small_config(rep_net=rep_net, **extra))
    m1 = build_model(small_config(rep_net=rep_net, rep_remat=True, **extra))
    params = m0.init(jax.random.PRNGKey(0), pattern, graph)
    out0 = m0.apply(params, pattern, graph)
    out1 = m1.apply(params, pattern, graph)
    np.testing.assert_array_equal(np.asarray(out0["pred_c"]),
                                  np.asarray(out1["pred_c"]))

    def loss(m, p):
        o = m.apply(p, pattern, graph)
        l = jnp.mean(o["pred_c"] ** 2) + jnp.mean(o["g_v_rep"] ** 2)
        if o["g_e_rep"] is not None:   # RGCN/RGIN are node-only
            l = l + jnp.mean(o["g_e_rep"] ** 2)
        return l

    g0 = jax.grad(lambda p: loss(m0, p))(params)
    g1 = jax.grad(lambda p: loss(m1, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
