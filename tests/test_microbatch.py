"""In-step microbatching (make_train_step(accum_chunks=k)).

The scan over k equal chunks must compute the SAME update as the
full-batch step: grads are averaged chunk means (every scm_loss component
is a per-batch mean), losses are chunk-mean-averaged, and the optimizer
sees one update. With dropout off the trajectories must agree to
numerical tolerance on CPU f32.
"""

import numpy as np
import pytest

import jax

from dualmessagepassing_tpu import ModelConfig, build_model
from dualmessagepassing_tpu.train import (
    TrainState, make_optimizer, make_train_step)


def _setup(rng, hid=16):
    from dualmessagepassing_tpu.data.dataset import GraphAdjDataset
    from dualmessagepassing_tpu.data.synthetic import generate_dataset

    data = generate_dataset(16, seed=7, pv=3, pe=3, gv=8, ge=16,
                            num_vlabels=2, num_elabels=2,
                            p_v_max=4, p_e_max=4, g_v_max=8, g_e_max=16)
    cfg = ModelConfig(
        max_ngv=8, max_ngvl=2, max_nge=16, max_ngel=2,
        max_npv=4, max_npvl=2, max_npe=4, max_npel=2,
        hid_dim=hid, rep_num_pattern_layers=2, rep_num_graph_layers=2,
        pred_hid_dim=hid, filter_net="ScalarFilter",
        pred_return_weights="nodeedge")
    model = build_model(cfg)
    ds = GraphAdjDataset(data)
    return model, ds


@pytest.mark.parametrize("k", [2, 4])
def test_chunked_step_matches_full_batch(rng, k):
    model, ds = _setup(rng)
    _, pattern, graph, counts, weights = ds.batchify(range(8), "nodeedge")
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    tx = make_optimizer(lr=1e-2)

    scal = (0.1, 0.1, 0.05, 0.01, 1.0)  # neg_slp, mw, mr, rr, lr_mult
    key = jax.random.PRNGKey(3)

    full = make_train_step(model, tx, bp_loss="MSE",
                           return_weights="nodeedge")
    chunked = make_train_step(model, tx, bp_loss="MSE",
                              return_weights="nodeedge", accum_chunks=k)
    import jax.numpy as jnp

    s_f = TrainState.create(params, tx)
    # the steps donate their state; give each trajectory its own buffers
    s_c = TrainState.create(jax.tree.map(jnp.array, params), tx)
    for step in range(2):
        s_f, l_f = full(s_f, pattern, graph, counts,
                        weights[0], weights[1], *scal, key)
        s_c, l_c = chunked(s_c, pattern, graph, counts,
                           weights[0], weights[1], *scal, key)
        for name in ("total", "count_loss", "match_v_loss", "match_e_loss",
                     "match_v_reg", "match_e_reg"):
            assert name in l_f, name
            np.testing.assert_allclose(
                float(l_f[name]), float(l_c[name]), rtol=1e-5,
                atol=1e-6, err_msg=name)
    for a, b in zip(jax.tree.leaves(s_f.params), jax.tree.leaves(s_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_step_rejects_indivisible_batch(rng):
    model, ds = _setup(rng)
    _, pattern, graph, counts, weights = ds.batchify(range(6), "nodeedge")
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    tx = make_optimizer(lr=1e-2)
    step = make_train_step(model, tx, return_weights="nodeedge",
                           accum_chunks=4)
    with pytest.raises(ValueError):
        step(TrainState.create(params, tx), pattern, graph, counts,
             weights[0], weights[1], 0.1, 0.1, 0.0, 0.0, 1.0,
             jax.random.PRNGKey(0))


def test_chunked_amp_step_runs(rng):
    """amp + chunking compose (the bench default configuration)."""
    model, ds = _setup(rng)
    _, pattern, graph, counts, weights = ds.batchify(range(8), "nodeedge")
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    tx = make_optimizer(lr=1e-2)
    step = make_train_step(model, tx, return_weights="nodeedge",
                           amp=True, accum_chunks=2)
    state, losses = step(TrainState.create(params, tx), pattern, graph,
                         counts, weights[0], weights[1],
                         0.1, 0.1, 0.0, 0.0, 1.0, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total"]))
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_auto_chunks_default_matches_unchunked(rng):
    """Round-5 default (VERDICT r4 item 6): accum_chunks=None auto-selects
    ~128-pair chunks from the traced batch size. At bsz 256 the default
    step must scan 2 chunks and still match the explicit accum_chunks=1
    trajectory (same update)."""
    import jax.numpy as jnp

    model, ds = _setup(rng)
    idx = [i % len(ds.data) for i in range(256)]
    _, pattern, graph, counts, weights = ds.batchify(idx, "nodeedge")
    params = model.init(jax.random.PRNGKey(0), pattern, graph)
    tx = make_optimizer(lr=1e-2)
    scal = (0.1, 0.1, 0.05, 0.01, 1.0)
    key = jax.random.PRNGKey(3)

    auto = make_train_step(model, tx, bp_loss="MSE",
                           return_weights="nodeedge")        # None = auto
    full = make_train_step(model, tx, bp_loss="MSE",
                           return_weights="nodeedge", accum_chunks=1)
    s_a = TrainState.create(params, tx)
    s_f = TrainState.create(jax.tree.map(jnp.array, params), tx)
    for _ in range(2):
        s_a, l_a = auto(s_a, pattern, graph, counts,
                        weights[0], weights[1], *scal, key)
        s_f, l_f = full(s_f, pattern, graph, counts,
                        weights[0], weights[1], *scal, key)
        np.testing.assert_allclose(float(l_a["total"]), float(l_f["total"]),
                                   rtol=2e-4)
    for pa, pb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=2e-4)


def test_auto_chunks_bsz_at_most_128_unchunked():
    """bsz <= 128 must stay unchunked under auto (the headline config is
    unchanged); explicit ints pass through."""
    from dualmessagepassing_tpu.train.scm_driver import make_train_step as m  # noqa: F401
    # resolution logic is trace-time; pin it via the bench helper which
    # mirrors it exactly
    import bench

    assert bench._effective_chunks(128) == 1
    assert bench._effective_chunks(64) == 1
    assert bench._effective_chunks(2048) == 16
    assert bench._effective_chunks(512) == 4
    assert bench._effective_chunks(514) == 2   # largest divisor <= bsz//128
