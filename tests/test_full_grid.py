"""Full capability grid: every rep net x every pred net trains one step.

SURVEY.md appendix line 1 claims 9 rep nets x 10 pred nets
(reference config.py:225-432). For each combo this proves: (a) the model
builds, initializes, and produces finite counts; (b) one gradient of the
combined count+matching loss is finite everywhere and NOT identically
zero in any rep/pred parameter subtree (catches dead weight heads and
NaN backwards); (c) one AdamW step leaves the loss finite. Gated behind
FULL_GRID=1 because 90 fwd+bwd+step traces cost several minutes; the
default suite keeps per-family coverage (test_rep_nets / test_edgeseq /
test_lrp / test_pred_attn).

Run with:  FULL_GRID=1 python -m pytest tests/test_full_grid.py -q
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dualmessagepassing_tpu import ModelConfig, build_model
from dualmessagepassing_tpu.data.dataset import GraphAdjDataset
from dualmessagepassing_tpu.data.synthetic import generate_dataset

from tests.test_scm_model import make_pair_batch, small_config
from tests.test_edgeseq import make_seq_batch, seq_config

pytestmark = pytest.mark.skipif(
    not os.environ.get("FULL_GRID"),
    reason="90-combo grid; set FULL_GRID=1 to run")

GRAPH_REPS = ["DMPNN", "CompGCN", "RGCN", "RGIN"]
SEQ_REPS = ["CNN", "RNN", "TXL"]
LRP_REPS = ["LRP", "DMPLRP"]

PRED_NETS = [
    ("SumPredictNet", {}),
    ("MeanPredictNet", {}),
    ("MaxPredictNet", {}),
    ("SumAttnPredictNet", {}),
    ("MeanAttnPredictNet", {}),
    ("MaxAttnPredictNet", {}),
    ("SumMemAttnPredictNet", {"pred_mem_len": 3, "pred_mem_init": "mean"}),
    ("MeanMemAttnPredictNet", {"pred_mem_len": 3, "pred_mem_init": "sum"}),
    ("MaxMemAttnPredictNet", {"pred_mem_len": 3, "pred_mem_init": "max"}),
    ("DIAMNet", {"pred_mem_len": 3, "pred_mem_init": "mean"}),
]


def _check(model, pattern, graph):
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    out = model.apply(params, pattern, graph)
    assert out["pred_c"].shape[-1] == 1
    assert np.all(np.isfinite(np.asarray(out["pred_c"])))

    # gradient of count + matching-head losses (train.py:625-661 shape)
    def loss_fn(p):
        o = model.apply(p, pattern, graph)
        loss = jnp.mean((o["pred_c"] - 1.0) ** 2)
        for k in ("pred_v", "pred_e"):
            if o.get(k) is not None:
                loss = loss + 0.1 * jnp.mean((o[k] - 0.5) ** 2)
        return loss

    # Two AdamW steps: the final pred layers are zero-init (reference
    # pred.py:50), so the step-1 gradient stops at them by construction;
    # after they move, the step-2 gradient must reach every rep/pred
    # subtree (catches dead heads and NaN backwards).
    tx = optax.adamw(1e-2, weight_decay=1e-5)
    opt_state = tx.init(params)
    p = params
    for _ in range(2):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        assert np.isfinite(float(loss))
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree.leaves(grads)), "non-finite gradient"
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
    tree = grads["params"] if "params" in grads else grads
    for name, sub in tree.items():
        if "rep" in name or "pred" in name:
            total = sum(float(jnp.sum(jnp.abs(g)))
                        for g in jax.tree.leaves(sub))
            assert total > 0, f"identically-zero gradient subtree: {name}"
    assert np.isfinite(float(loss_fn(p)))


@pytest.mark.parametrize("rep_net", GRAPH_REPS)
@pytest.mark.parametrize("pred_net,extra", PRED_NETS)
def test_grid_graph(rng, rep_net, pred_net, extra):
    pattern, graph = make_pair_batch(rng)
    # bdd bases must divide hid_dim after the num_rels clamp (rgnn.py:39-42)
    rep_extra = {"rep_rgcn_num_bases": 2, "rep_rgin_num_bases": 2}
    cfg = small_config(rep_net=rep_net, pred_net=pred_net,
                       rep_num_pattern_layers=1, rep_num_graph_layers=1,
                       **rep_extra, **extra)
    _check(build_model(cfg), pattern, graph)


@pytest.mark.parametrize("rep_net", SEQ_REPS)
@pytest.mark.parametrize("pred_net,extra", PRED_NETS)
def test_grid_edgeseq(rng, rep_net, pred_net, extra):
    pattern, graph = make_seq_batch(rng)
    cfg = seq_config(rep_net=rep_net, pred_net=pred_net,
                     rep_num_pattern_layers=1, rep_num_graph_layers=1,
                     **extra)
    _check(build_model(cfg), pattern, graph)


@pytest.fixture(scope="module")
def lrp_batch():
    data = generate_dataset(4, seed=9, pv=3, pe=3, gv=6, ge=10,
                            num_vlabels=2, num_elabels=2,
                            p_v_max=4, p_e_max=4, g_v_max=6, g_e_max=10)
    ds = GraphAdjDataset(data)
    _, pattern, graph, _, _ = ds.batchify_lrp(range(4), "none")
    return pattern, graph


@pytest.mark.parametrize("rep_net", LRP_REPS)
@pytest.mark.parametrize("pred_net,extra", PRED_NETS)
def test_grid_lrp(lrp_batch, rep_net, pred_net, extra):
    pattern, graph = lrp_batch
    cfg = ModelConfig(
        max_ngv=6, max_ngvl=2, max_nge=10, max_ngel=2,
        max_npv=4, max_npvl=2, max_npe=4, max_npel=2,
        hid_dim=8, rep_num_pattern_layers=1, rep_num_graph_layers=1,
        pred_hid_dim=8, filter_net="ScalarFilter", rep_net=rep_net,
        pred_net=pred_net, pred_return_weights="nodeedge", **extra)
    _check(build_model(cfg), pattern, graph)
