"""Tests for the UNC workload: samplers, model, loss, end-to-end training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualmessagepassing_tpu.unc.data import (
    WholeGraph,
    compute_edgenorm,
    convert_subgraph_nids,
    edge_dropout,
    negative_sampling,
    pad_subgraph,
    sample_subgraph_by_neighbors,
    sample_subgraph_by_randomwalks,
)
from dualmessagepassing_tpu.unc.model import UNCTrainModel, init_unc_variables


def make_triplets(rng, n=30, e=80, r=3):
    src = rng.integers(0, n, e)
    dst = (src + rng.integers(1, n, e)) % n
    rel = rng.integers(0, r, e)
    return np.stack([src, rel, dst], axis=1).astype(np.int64)


def test_whole_graph_doubling(rng):
    t = make_triplets(rng)
    g = WholeGraph(30, 3, t)
    assert g.num_edges == 160
    # reversed edges have shifted relation ids
    assert (g.edge_type[80:] == t[:, 1] + 3).all()
    assert (g.senders[80:] == t[:, 2]).all()


def test_samplers(rng):
    t = make_triplets(rng)
    g = WholeGraph(30, 3, t)
    seeds = np.unique(t[:5, [0, 2]].reshape(-1))
    for fn in (sample_subgraph_by_randomwalks, sample_subgraph_by_neighbors):
        sub = fn(g, seeds, depth=2, width=4, rng=rng)
        # every edge endpoint within the subgraph
        assert sub["senders"].max() < len(sub["nid"])
        assert sub["receivers"].max() < len(sub["nid"])
        # all seeds present
        assert set(seeds.tolist()) <= set(sub["nid"].tolist())
        # width cap respected: <= width in-edges per node
        cnt = np.bincount(sub["receivers"], minlength=len(sub["nid"]))
        assert cnt.max() <= 4
        # edge types consistent with the parent graph
        for s, d, ty in zip(sub["senders"][:10], sub["receivers"][:10],
                            sub["edge_type"][:10]):
            ps, pd = sub["nid"][s], sub["nid"][d]
            mask = (g.senders == ps) & (g.receivers == pd) & (g.edge_type == ty)
            assert mask.any()


def test_negative_sampling(rng):
    t = make_triplets(rng, e=50)
    neg = negative_sampling(t, 30, 5, rng)
    assert neg.shape == (250, 3)
    # each negative differs from its positive in head or tail
    pos = np.tile(t, (5, 1))
    diff = (neg[:, 0] != pos[:, 0]) | (neg[:, 2] != pos[:, 2])
    assert diff.all()
    assert (neg[:, 1] == pos[:, 1]).all()


def test_edge_dropout_and_norm(rng):
    t = make_triplets(rng)
    g = WholeGraph(30, 3, t)
    seeds = np.unique(t[:10, [0, 2]].reshape(-1))
    sub = sample_subgraph_by_neighbors(g, seeds, 2, 5, rng)
    n0 = len(sub["senders"])
    sub2 = edge_dropout(sub, 0.5, rng)
    assert len(sub2["senders"]) < n0
    norm = compute_edgenorm(sub2)
    assert norm.shape == (len(sub2["senders"]), 1)
    assert np.isfinite(norm).all()


def test_unc_model_and_loss(rng):
    t = make_triplets(rng, n=20, e=60, r=3)
    g = WholeGraph(20, 3, t)
    edges = t[:16]
    neg = negative_sampling(edges, 20, 2, rng)
    seeds = np.unique(np.concatenate(
        [edges[:, 0], edges[:, 2], neg[:, 0], neg[:, 2]]))
    sub = sample_subgraph_by_randomwalks(g, seeds, 2, 5, rng)
    samples = np.concatenate([edges, neg]).copy()
    samples[:, 0] = convert_subgraph_nids(samples[:, 0], sub["nid"])
    samples[:, 2] = convert_subgraph_nids(samples[:, 2], sub["nid"])
    labels = np.zeros(len(samples), np.float32)
    labels[:16] = 1.0
    norm = compute_edgenorm(sub)
    padded = pad_subgraph(sub, samples, labels, v_max=24,
                          e_max=24 * 5, s_max=64, edge_norm=norm)
    sub_dev = {k: jnp.asarray(v) for k, v in padded.items()}

    model = UNCTrainModel(num_nodes=20, num_rels=3, h_dim=8, nlabel=0,
                          num_hidden_layers=2, reg_param=0.01)
    variables = init_unc_variables(model, jax.random.PRNGKey(0), sub_dev)
    (out, pred), _ = model.apply(variables, sub_dev, train=True,
                                 mutable=["batch_stats"])
    h, z, r_bar = out
    assert h.shape == (24, 8)
    assert r_bar.shape == (6, 8)  # num_rels * 2
    assert pred is None

    loss = model.apply(variables, out, sub_dev["edge_type"],
                       sub_dev["edge_mask"], sub_dev["samples"],
                       sub_dev["labels"], sub_dev["sample_mask"],
                       sub_dev["node_mask"],
                       method=UNCTrainModel.unsupervised_loss)
    assert np.isfinite(float(loss))


def test_unc_training_end_to_end(rng):
    from dualmessagepassing_tpu.unc.driver import train_unc

    t = make_triplets(rng, n=25, e=120, r=2)
    embs, coverage = train_unc(
        t, 25, 2, h_dim=8, n_layers=1, lr=1e-2, reg_param=0.01,
        negative_rate=2, graph_batch_size=40, graph_split_size=0.9,
        sampler="randomwalk", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=25, e_max=125, seed=0, log=lambda s: None)
    assert embs.shape == (25, 8)
    assert coverage > 0.9
    assert np.isfinite(embs).all()


@pytest.mark.parametrize("backbone", ["CompGCN", "RGCN", "RGIN"])
def test_unc_other_backbones(rng, backbone):
    from dualmessagepassing_tpu.unc.driver import train_unc

    t = make_triplets(rng, n=20, e=80, r=2)
    embs, coverage = train_unc(
        t, 20, 2, h_dim=8, n_layers=2, lr=1e-2, reg_param=0.01,
        negative_rate=2, graph_batch_size=40, graph_split_size=0.9,
        sampler="neighbor", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=20, e_max=100, seed=0, backbone=backbone,
        log=lambda s: None)
    assert embs.shape == (20, 8)
    assert np.isfinite(embs).all()


def test_unc_supervised_training(rng):
    from dualmessagepassing_tpu.unc.driver import train_unc_supervised

    t = make_triplets(rng, n=20, e=80, r=2)
    # label 8 nodes; incident edge indices per labeled node
    train_indices, train_labels = {}, {}
    for n in range(8):
        inc = [i for i, row in enumerate(t)
               if row[0] == n or row[2] == n]
        if inc:
            train_indices[n] = inc
            train_labels[n] = n % 3
    variables, model = train_unc_supervised(
        t, 20, 2, train_indices, train_labels, nlabel=3, multi=False,
        h_dim=8, n_layers=1, lr=1e-2, reg_param=0.01,
        graph_batch_size=40, label_batch_size=4, graph_split_size=0.9,
        sampler="neighbor", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=20, e_max=100, seed=0, log=lambda s: None)
    assert "node_fc" in variables["params"]
    assert "w_relation" in variables["params"]


def test_unc_supervised_training_multilabel(rng):
    """multi=True supervised branch trains end-to-end: per-node BCE over
    multi-hot labels (model.py supervised_loss multi arm; the reference's
    semi-supervised Yelp protocol, Model/*/src/utils.py multi-label
    parse + node_classification.py:87-196)."""
    from dualmessagepassing_tpu.unc.driver import train_unc_supervised

    t = make_triplets(rng, n=20, e=80, r=2)
    train_indices, train_labels = {}, {}
    for n in range(8):
        inc = [i for i, row in enumerate(t)
               if row[0] == n or row[2] == n]
        if inc:
            train_indices[n] = inc
            # label-index arrays, the reference loader's multi format
            train_labels[n] = np.array([n % 3, (n + 1) % 3])
    variables, model = train_unc_supervised(
        t, 20, 2, train_indices, train_labels, nlabel=3, multi=True,
        h_dim=8, n_layers=1, lr=1e-2, reg_param=0.01,
        graph_batch_size=40, label_batch_size=4, graph_split_size=0.9,
        sampler="neighbor", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=20, e_max=100, seed=0, log=lambda s: None)
    assert model.multi
    assert "node_fc" in variables["params"]
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, variables["params"]))
    assert all(np.isfinite(x).all() for x in leaves)


def test_dualgraphconv_matches_oracle(rng):
    """UNC DualGraphConv vs a per-edge numpy oracle (incl. edge_norm)."""
    from dualmessagepassing_tpu.unc.model import DualGraphConv

    V, E, H = 6, 12, 8
    senders = rng.integers(0, V, E)
    receivers = rng.integers(0, V, E)
    rev = rng.random(E) < 0.5
    norm = rng.random((E, 1)).astype(np.float32)
    sub = {
        "senders": jnp.asarray(senders), "receivers": jnp.asarray(receivers),
        "rev_flag": jnp.asarray(rev), "edge_mask": jnp.ones(E, bool),
        "node_mask": jnp.ones(V, bool),
    }
    v_feat = rng.normal(size=(V, H)).astype(np.float32)
    e_feat = rng.normal(size=(E, H)).astype(np.float32)

    layer = DualGraphConv(hidden_dim=H, batch_norm=False, activation=None)
    variables = layer.init(jax.random.PRNGKey(0), sub, jnp.asarray(v_feat),
                           jnp.asarray(e_feat), edge_norm=jnp.asarray(norm))
    n_out, e_out = layer.apply(variables, sub, jnp.asarray(v_feat),
                               jnp.asarray(e_feat),
                               edge_norm=jnp.asarray(norm))
    p = jax.tree.map(np.asarray, variables["params"])

    def mlp(pm, x):
        y = x @ pm["fc0_kernel"] + pm["fc0_bias"]
        y = np.where(y > 0, y, y / 5.5)
        return y @ pm["fc1_kernel"] + pm["fc1_bias"]

    agg = np.zeros((V, H))
    edge_msg = np.zeros((E, H))
    out_deg = np.bincount(senders, minlength=V).astype(np.float64)
    for i in range(E):
        u, d = senders[i], receivers[i]
        if rev[i]:
            edge_msg[i] = v_feat[u] @ p["dst_weight"] - v_feat[d] @ p["src_weight"]
            msg = e_feat[i] @ p["out_weight"]
        else:
            edge_msg[i] = v_feat[d] @ p["dst_weight"] - v_feat[u] @ p["src_weight"]
            msg = -(e_feat[i] @ p["in_weight"])
        agg[d] += msg * norm[i, 0]
    want_n = mlp(p["nmlp"], v_feat @ p["nloop_weight"] + agg + p["nbias"])
    want_e = np.zeros((E, H))
    for i in range(E):
        dd = np.log2(1.0 + out_deg[receivers[i]])
        add = 2.0 * (1.0 + dd) * (e_feat[i] @ (p["src_weight"] - p["dst_weight"]))
        want_e[i] = e_feat[i] @ p["eloop_weight"] + edge_msg[i] + add + p["ebias"]
    want_e = mlp(p["emlp"], want_e)

    np.testing.assert_allclose(np.asarray(n_out), want_n, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e_out), want_e, rtol=1e-4, atol=1e-4)


def test_unc_attributed(rng):
    """Frozen node attributes as inputs (EmbeddingLayerAttri path)."""
    from dualmessagepassing_tpu.unc.driver import train_unc

    t = make_triplets(rng, n=20, e=80, r=2)
    attrs = rng.normal(size=(20, 12)).astype(np.float32)
    embs, cov = train_unc(
        t, 20, 2, h_dim=8, n_layers=1, lr=1e-2, reg_param=0.01,
        negative_rate=2, graph_batch_size=40, graph_split_size=0.9,
        sampler="neighbor", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=20, e_max=100, seed=0, node_attri=attrs,
        log=lambda s: None)
    assert embs.shape[0] == 20
    assert np.isfinite(embs).all()


def test_unc_multihot_input(rng):
    """MultiHotEmbeddingLayer input path (model.py:12-37)."""
    from dualmessagepassing_tpu.unc.driver import train_unc

    t = make_triplets(rng, n=20, e=60, r=2)
    # train_unc lacks the knob; exercise via model directly
    from dualmessagepassing_tpu.unc.data import (WholeGraph, compute_edgenorm,
        convert_subgraph_nids, negative_sampling, pad_subgraph,
        sample_subgraph_by_neighbors)
    from dualmessagepassing_tpu.unc.model import (UNCTrainModel,
        init_unc_variables)

    g = WholeGraph(20, 2, t)
    edges = t[:16]
    neg = negative_sampling(edges, 20, 2, rng)
    seeds = np.unique(np.concatenate(
        [edges[:, 0], edges[:, 2], neg[:, 0], neg[:, 2]]))
    sub = sample_subgraph_by_neighbors(g, seeds, 2, 5, rng)
    samples = np.concatenate([edges, neg]).copy()
    samples[:, 0] = convert_subgraph_nids(samples[:, 0], sub["nid"])
    samples[:, 2] = convert_subgraph_nids(samples[:, 2], sub["nid"])
    labels = np.zeros(len(samples), np.float32); labels[:16] = 1.0
    padded = pad_subgraph(sub, samples, labels, 20, 100, 64,
                          edge_norm=compute_edgenorm(sub))
    sub_dev = {k: jnp.asarray(v) for k, v in padded.items()}
    model = UNCTrainModel(num_nodes=20, num_rels=2, h_dim=8, nlabel=0,
                          num_hidden_layers=1, reg_param=0.01,
                          multihot_input=True)
    variables = init_unc_variables(model, jax.random.PRNGKey(0), sub_dev)
    assert "node_emb_proj" in variables["params"]["model"]
    assert "node_emb" not in variables["params"]["model"]
    (out, _), _ = model.apply(variables, sub_dev, train=True,
                              mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out[0])).all()


@pytest.mark.parametrize("backbone", ["DMPNN", "CompGCN", "RGCN"])
def test_sorted_edges_equivalence(rng, backbone):
    """pad_subgraph sorts edges by receiver; the model with
    sorted_edges=True on the sorted layout must match sorted_edges=False
    on the ORIGINAL unsorted layout (permutation consistency of senders/
    receivers/edge_type/rev_flag/edge_norm)."""
    t = make_triplets(rng, n=20, e=60, r=3)
    g = WholeGraph(20, 3, t)
    edges = t[:16]
    neg = negative_sampling(edges, 20, 2, rng)
    seeds = np.unique(np.concatenate(
        [edges[:, 0], edges[:, 2], neg[:, 0], neg[:, 2]]))
    sub = sample_subgraph_by_randomwalks(g, seeds, 2, 5, rng)
    samples = np.concatenate([edges, neg]).copy()
    samples[:, 0] = convert_subgraph_nids(samples[:, 0], sub["nid"])
    samples[:, 2] = convert_subgraph_nids(samples[:, 2], sub["nid"])
    labels = np.zeros(len(samples), np.float32)
    labels[:16] = 1.0
    norm = compute_edgenorm(sub)
    v_max, e_max, s_max = 24, 24 * 5, 64

    padded = pad_subgraph(sub, samples, labels, v_max, e_max, s_max,
                          edge_norm=norm)
    recv = padded["receivers"]
    assert (np.diff(recv) >= 0).all(), "receivers must be non-decreasing"

    # hand-pad the UNSORTED layout (pre-sort behavior)
    n_e = len(sub["senders"])
    unsorted = dict(padded)
    for k, src_key in [("senders", "senders"), ("receivers", "receivers"),
                       ("edge_type", "edge_type"), ("rev_flag", "rev_flag")]:
        arr = np.zeros(e_max, padded[k].dtype)
        arr[:n_e] = sub[src_key]
        unsorted[k] = arr
    en = np.zeros((e_max, 1), np.float32)
    en[:n_e] = norm
    unsorted["edge_norm"] = en

    def run(layout, flag):
        model = UNCTrainModel(num_nodes=20, num_rels=3, h_dim=8, nlabel=0,
                              num_hidden_layers=2, reg_param=0.01,
                              backbone=backbone, sorted_edges=flag)
        sub_dev = {k: jnp.asarray(v) for k, v in layout.items()}
        variables = init_unc_variables(model, jax.random.PRNGKey(0), sub_dev)
        (out, _), _ = model.apply(variables, sub_dev, train=False,
                                  mutable=["batch_stats"])
        loss = model.apply(variables, out, sub_dev["edge_type"],
                           sub_dev["edge_mask"], sub_dev["samples"],
                           sub_dev["labels"], sub_dev["sample_mask"],
                           sub_dev["node_mask"],
                           method=UNCTrainModel.unsupervised_loss)
        return np.asarray(out[0]), float(loss)

    h_sorted, loss_sorted = run(padded, True)
    h_unsorted, loss_unsorted = run(unsorted, False)
    np.testing.assert_allclose(h_sorted, h_unsorted, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(loss_sorted, loss_unsorted, rtol=1e-5)


def test_multilabel_nc_evaluate(tmp_path, rng):
    """Separable synthetic embeddings must score near-perfect F1 under
    both multi-label protocols (reference node_classification.py:87-196;
    its unsupervised fold loop crashes on a 3-way unpack — ours runs)."""
    from dualmessagepassing_tpu.unc.evaluate import nc_evaluate

    n = 60
    embs = rng.normal(size=(n, 8)).astype(np.float32)
    emb_dict = {str(i): embs[i] for i in range(n)}

    def labels_of(i):
        labs = []
        if embs[i, 0] > 0:
            labs.append(("0", "a"))
        else:
            labs.append(("0", "b"))
        if embs[i, 1] > 0:
            labs.append(("1", "c"))
        return labs

    # 4-column rows: index, _, nclass, comma-separated labels
    def write4(path, idxs):
        with open(path, "w") as f:
            for i in idxs:
                by_class = {}
                for c, l in labels_of(i):
                    by_class.setdefault(c, []).append(l)
                # one row per node; reference format has a single nclass
                # column — emit the first class's labels
                c = sorted(by_class)[0]
                f.write(f"{i}\tx\t{c}\t{','.join(by_class[c])}\n")

    tr = tmp_path / "label.dat"
    te = tmp_path / "label.dat.test"
    write4(tr, range(0, 40))
    write4(te, range(40, 60))

    macro, micro = nc_evaluate(str(tr), str(te), emb_dict,
                               supervised=True, multi=True)
    assert macro > 0.85 and micro > 0.85

    macro_u, micro_u = nc_evaluate(str(tr), str(te), emb_dict,
                                   supervised=False, multi=True)
    assert macro_u > 0.85 and micro_u > 0.85


def test_unc_evaluate_cli(tmp_path, rng):
    """unc_evaluate CLI end-to-end: nc + lp on synthetic separable data."""
    from dualmessagepassing_tpu.cli.unc_evaluate import main

    n = 50
    embs = rng.normal(size=(n, 6)).astype(np.float32)
    emb_path = tmp_path / "emb.dat"
    with open(emb_path, "w") as f:
        f.write("header args\n")
        for i in range(n):
            f.write(f"{i}\t" + " ".join(f"{x:.6f}" for x in embs[i]) + "\n")
    with open(tmp_path / "label.dat", "w") as f:
        for i in range(0, 35):
            f.write(f"{i}\t{int(embs[i, 0] > 0)}\n")
    with open(tmp_path / "label.dat.test", "w") as f:
        for i in range(35, 50):
            f.write(f"{i}\t{int(embs[i, 0] > 0)}\n")
    with open(tmp_path / "link.dat.test", "w") as f:
        for i in range(0, 40, 2):
            f.write(f"{i}\t{i+1}\t1\n")
            f.write(f"{i}\t{(i+7) % n}\t0\n")

    res = main(["--task", "both", "--emb_file", str(emb_path),
                "--label_file", str(tmp_path / "label.dat"),
                "--label_test_file", str(tmp_path / "label.dat.test"),
                "--link_test_file", str(tmp_path / "link.dat.test"),
                "--record_file", str(tmp_path / "record.dat")])
    assert "nc" in res and "lp" in res
    assert res["nc"]["Macro-F1"] > 0.8
    assert (tmp_path / "record.dat").exists()


def test_train_unc_checkpoint_resume(rng, tmp_path):
    """Per-epoch full-state checkpointing: a resumed run picks up the
    saved epoch/params and completes; final embeddings are finite."""
    from dualmessagepassing_tpu.unc.driver import train_unc

    src = rng.integers(0, 20, 100)
    dst = (src + rng.integers(1, 20, 100)) % 20
    rel = rng.integers(0, 2, 100)
    t = np.stack([src, rel, dst], axis=1).astype(np.int64)
    kw = dict(h_dim=8, n_layers=1, lr=1e-2, reg_param=0.01,
              negative_rate=2, graph_batch_size=40, graph_split_size=0.9,
              sampler="randomwalk", sample_depth=2, sample_width=5,
              v_max=20, e_max=100, seed=0,
              checkpoint_dir=str(tmp_path / "ckpt"))
    logs = []
    embs, cov = train_unc(t, 20, 2, n_epochs=2, log=logs.append, **kw)
    assert (tmp_path / "ckpt" / "latest").exists()
    logs2 = []
    embs2, cov2 = train_unc(t, 20, 2, n_epochs=4, log=logs2.append, **kw)
    assert any("resumed from" in l for l in logs2), logs2[:4]
    # resumed run starts after the first run's last completed epoch
    def epochs(ls):
        return [int(l.split()[1]) for l in ls if l.startswith("Epoch")]
    e1, e2 = epochs(logs), epochs(logs2)
    assert e1 and e2, (logs, logs2)
    assert e2[0] == e1[-1] + 1, (e1, e2)
    assert np.isfinite(embs2).all()
    assert cov2 > 0.9


def test_fused_endpoint_gather_matches_split(rng):
    """pair_order/pair_sorted keys switch DualGraphConv to ONE gather
    over the concatenated [2E] endpoint stream; forward AND grads must
    match the split (send_order + receiver) path exactly."""
    from dualmessagepassing_tpu.unc.data import compute_edgenorm

    t = make_triplets(rng, n=20, e=60, r=3)
    g = WholeGraph(20, 3, t)
    edges = t[:16]
    neg = negative_sampling(edges, 20, 2, rng)
    seeds = np.unique(np.concatenate(
        [edges[:, 0], edges[:, 2], neg[:, 0], neg[:, 2]]))
    sub = sample_subgraph_by_randomwalks(g, seeds, 2, 5, rng)
    samples = np.concatenate([edges, neg]).copy()
    samples[:, 0] = convert_subgraph_nids(samples[:, 0], sub["nid"])
    samples[:, 2] = convert_subgraph_nids(samples[:, 2], sub["nid"])
    labels = np.zeros(len(samples), np.float32)
    labels[:16] = 1.0
    split = pad_subgraph(sub, samples, labels, 24, 24 * 5, 64,
                         edge_norm=compute_edgenorm(sub))
    fused = pad_subgraph(sub, samples, labels, 24, 24 * 5, 64,
                         edge_norm=compute_edgenorm(sub), pair_keys=True)
    assert "pair_order" in fused and "pair_order" not in split

    model = UNCTrainModel(num_nodes=20, num_rels=3, h_dim=8, nlabel=0,
                          num_hidden_layers=2, reg_param=0.01,
                          backbone="DMPNN", sorted_edges=True)

    def loss_and_grads(layout):
        sub_dev = {k: jnp.asarray(v) for k, v in layout.items()}
        variables = init_unc_variables(model, jax.random.PRNGKey(0),
                                       sub_dev)

        def loss_fn(p):
            vs = {"params": p, **{k: v for k, v in variables.items()
                                  if k != "params"}}
            (out, _), _ = model.apply(vs, sub_dev, train=False,
                                      mutable=["batch_stats"])
            return model.apply(vs, out, sub_dev["edge_type"],
                               sub_dev["edge_mask"], sub_dev["samples"],
                               sub_dev["labels"], sub_dev["sample_mask"],
                               sub_dev["node_mask"],
                               method=UNCTrainModel.unsupervised_loss)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return float(loss), grads

    l_split, g_split = loss_and_grads(split)
    l_fused, g_fused = loss_and_grads(fused)
    np.testing.assert_allclose(l_fused, l_split, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_pad_cols_matches_unpadded(rng):
    """pad_cols=True (128-lane endpoint column table) is a pure layout
    change: forward and grads must match the unpadded model exactly."""
    from dualmessagepassing_tpu.unc.data import compute_edgenorm

    t = make_triplets(rng, n=20, e=60, r=3)
    g = WholeGraph(20, 3, t)
    edges = t[:16]
    neg = negative_sampling(edges, 20, 2, rng)
    seeds = np.unique(np.concatenate(
        [edges[:, 0], edges[:, 2], neg[:, 0], neg[:, 2]]))
    sub = sample_subgraph_by_randomwalks(g, seeds, 2, 5, rng)
    samples = np.concatenate([edges, neg]).copy()
    samples[:, 0] = convert_subgraph_nids(samples[:, 0], sub["nid"])
    samples[:, 2] = convert_subgraph_nids(samples[:, 2], sub["nid"])
    labels = np.zeros(len(samples), np.float32)
    labels[:16] = 1.0
    padded = pad_subgraph(sub, samples, labels, 24, 24 * 5, 64,
                          edge_norm=compute_edgenorm(sub))
    sub_dev = {k: jnp.asarray(v) for k, v in padded.items()}

    def loss_and_grads(pad_cols):
        model = UNCTrainModel(num_nodes=20, num_rels=3, h_dim=8, nlabel=0,
                              num_hidden_layers=2, reg_param=0.01,
                              backbone="DMPNN", sorted_edges=True,
                              pad_cols=pad_cols)
        variables = init_unc_variables(model, jax.random.PRNGKey(0),
                                       sub_dev)

        def loss_fn(p):
            vs = {"params": p, **{k: v for k, v in variables.items()
                                  if k != "params"}}
            (out, _), _ = model.apply(vs, sub_dev, train=False,
                                      mutable=["batch_stats"])
            return model.apply(vs, out, sub_dev["edge_type"],
                               sub_dev["edge_mask"], sub_dev["samples"],
                               sub_dev["labels"], sub_dev["sample_mask"],
                               sub_dev["node_mask"],
                               method=UNCTrainModel.unsupervised_loss)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return float(loss), grads

    l0, g0 = loss_and_grads(False)
    l1, g1 = loss_and_grads(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_train_unc_fused_and_padcols_end_to_end(rng):
    """train_unc(endpoint_gather='fused', pad_cols=True) runs end to end
    and exports finite embeddings (the product-surface wiring of the
    round-4 cotangent levers)."""
    from dualmessagepassing_tpu.unc.driver import train_unc

    t = make_triplets(rng, n=20, e=80, r=2)
    embs, coverage = train_unc(
        t, 20, 2, h_dim=8, n_layers=2, lr=1e-2, reg_param=0.01,
        negative_rate=2, graph_batch_size=40, graph_split_size=0.9,
        sampler="randomwalk", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=20, e_max=100, seed=0,
        endpoint_gather="fused", pad_cols=True, log=lambda s: None)
    assert embs.shape == (20, 8)
    assert np.isfinite(embs).all()
    assert coverage > 0.5


def test_train_unc_lever_guards(rng):
    """Invalid lever combinations fail loudly instead of silently
    no-opping (sender_windowed needs amp+windowed; fused excludes
    sharding and sender_windowed)."""
    import pytest
    from dualmessagepassing_tpu.unc.driver import train_unc

    t = make_triplets(rng, n=20, e=80, r=2)
    kw = dict(h_dim=8, n_layers=1, graph_batch_size=40, n_epochs=1,
              v_max=20, e_max=100, log=lambda s: None)
    with pytest.raises(ValueError, match="sender_windowed requires"):
        train_unc(t, 20, 2, sender_windowed=True, **kw)
    with pytest.raises(ValueError, match="single-device"):
        train_unc(t, 20, 2, endpoint_gather="fused", ep_devices=2, **kw)
    with pytest.raises(ValueError, match="pick one"):
        train_unc(t, 20, 2, endpoint_gather="fused", sender_windowed=True,
                  amp=True, scatter_backend="windowed", **kw)
