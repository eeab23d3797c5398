"""Tests for CompGCN / RGCN / RGIN rep nets + oracles for the key kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualmessagepassing_tpu import ModelConfig, batch_graphs, build_model, single_graph
from dualmessagepassing_tpu.models.compgcn import comp_func

from tests.test_scm_model import make_pair_batch, small_config


def test_corr_comp_is_circular_correlation(rng):
    h = rng.normal(size=(2, 5, 8)).astype(np.float32)
    r = rng.normal(size=(2, 5, 8)).astype(np.float32)
    got = np.asarray(comp_func(jnp.asarray(h), jnp.asarray(r), "corr"))
    # circular correlation: c[k] = sum_i h[i] * r[(i + k) % n]
    want = np.zeros_like(h)
    n = h.shape[-1]
    for k in range(n):
        want[..., k] = (h * np.roll(r, -k, axis=-1)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rep_net,extra", [
    ("CompGCN", {"rep_compgcn_comp_opt": "corr"}),
    ("CompGCN", {"rep_compgcn_comp_opt": "mult",
                 "rep_compgcn_edge_norm": "both"}),
    # num_bases is clamped to num_rels (=max_ngel=3 here), so bdd must use a
    # divisor of hid_dim that is <= 3 (rgcn.py:39-42)
    ("RGCN", {"rep_rgcn_regularizer": "bdd", "rep_rgcn_num_bases": 2}),
    ("RGCN", {"rep_rgcn_regularizer": "basis", "rep_rgcn_num_bases": 2}),
    ("RGIN", {"rep_rgin_regularizer": "bdd", "rep_rgin_num_bases": 2}),
])
def test_rep_net_forward_and_grad(rng, rep_net, extra):
    pattern, graph = make_pair_batch(rng)
    cfg = small_config(rep_net=rep_net, **extra)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    out = model.apply(params, pattern, graph)
    assert out["pred_c"].shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out["pred_c"])))
    if rep_net == "CompGCN":
        assert out["pred_e"] is not None
        assert out["g_e_rep"].shape == (2, 16, 16)
    else:
        assert out["pred_e"] is None

    def loss(p):
        o = model.apply(p, pattern, graph)
        l = jnp.mean((o["pred_c"] - 1.0) ** 2) + jnp.mean(o["g_v_rep"] ** 2)
        if o["g_e_rep"] is not None:
            l = l + jnp.mean(o["g_e_rep"] ** 2)
        return l

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def rgcn_oracle(node_feat, senders, receivers, rels, W, W_loop, bias, n):
    """Per-edge loop oracle for RGCN basis=none, edge_norm=in, self_loop."""
    in_deg = np.bincount(receivers, minlength=n).astype(np.float64)
    innorm = 1.0 / (in_deg + 1.0)
    agg = np.zeros((n, W.shape[2]))
    for s, r, rel in zip(senders, receivers, rels):
        agg[r] += node_feat[s] @ W[rel]
    out = agg * innorm[:, None] + (node_feat @ W_loop) * innorm[:, None] + bias
    return np.maximum(out, 0)


def test_rgcn_matches_oracle(rng):
    """Relation-scan aggregation == reference per-edge gather+bmm semantics."""
    from dualmessagepassing_tpu.models.rgnn import RGCNLayer

    n, m, d, R = 6, 12, 8, 3
    senders = rng.integers(0, n, m)
    receivers = rng.integers(0, n, m)
    rels = rng.integers(0, R, m)
    rec = single_graph(n, senders, receivers, edge_labels=rels)
    g = batch_graphs([rec])
    feat = rng.normal(size=(1, n, d)).astype(np.float32)

    layer = RGCNLayer(hidden_dim=d, num_rels=R, regularizer="none",
                      edge_norm="in", act="relu", batch_norm=False)
    params = layer.init(jax.random.PRNGKey(3), g, jnp.asarray(feat))
    got = np.asarray(layer.apply(params, g, jnp.asarray(feat)))[0]

    p = jax.tree.map(np.asarray, params["params"])
    want = rgcn_oracle(feat[0].astype(np.float64), senders, receivers, rels,
                       p["rel_weights"]["weight"], p["loop_weight"],
                       p["bias"], n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_basis_combination(rng):
    """basis with num_bases < num_rels mixes base weights via w_comp."""
    from dualmessagepassing_tpu.models.rgnn import RelWeights

    rw = RelWeights(num_rels=5, input_dim=8, hidden_dim=8,
                    regularizer="basis", num_bases=2)
    params = rw.init(jax.random.PRNGKey(0))
    w, bdd = rw.apply(params)
    assert not bdd and w.shape == (5, 8, 8)
    p = params["params"]
    want = np.einsum("rb,bdh->rdh", np.asarray(p["w_comp"]),
                     np.asarray(p["weight"]))
    np.testing.assert_allclose(np.asarray(w), want, rtol=1e-5)
