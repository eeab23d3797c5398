"""Model expansion invariance: growing the label vocabulary must not change
predictions on in-range data.

The multihot encoding grows by prepending most-significant digit blocks that
are one-hot at digit 0 for old values; expand_params zero-fills the matching
new embedding rows (tail-copy), so old inputs see identical embeddings —
the reference's expand contract (basemodel.py:167-219)."""

import jax
import numpy as np
import pytest

from dualmessagepassing_tpu import ModelConfig, build_model
from dualmessagepassing_tpu.train.checkpoint import expand_params
from tests.test_scm_model import make_pair_batch


def cfg_with_vocab(nvl, nel):
    return ModelConfig(
        max_ngv=8, max_ngvl=nvl, max_nge=16, max_ngel=nel,
        max_npv=4, max_npvl=nvl, max_npe=6, max_npel=nel,
        hid_dim=16, rep_num_pattern_layers=2, rep_num_graph_layers=2,
        pred_hid_dim=16, filter_net="ScalarFilter",
        pred_return_weights="nodeedge",
    )


def test_expand_preserves_predictions(rng):
    pattern, graph = make_pair_batch(rng, nvl=2, nel=2)
    small = build_model(cfg_with_vocab(2, 2))
    params_small = small.init(jax.random.PRNGKey(0), pattern, graph)
    out_small = small.apply(params_small, pattern, graph)

    # grow the vocab so the encoding length actually changes (2 -> 5 labels
    # crosses the base-2 digit boundary: enc_len 1 -> 3)
    big = build_model(cfg_with_vocab(5, 5))
    params_big_fresh = big.init(jax.random.PRNGKey(1), pattern, graph)
    params_big = expand_params(params_small, params_big_fresh, pre_pad=True)
    out_big = big.apply(params_big, pattern, graph)

    np.testing.assert_allclose(
        np.asarray(out_small["pred_c"]), np.asarray(out_big["pred_c"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_small["g_v_rep"]), np.asarray(out_big["g_v_rep"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_small["pred_e"]), np.asarray(out_big["pred_e"]),
        rtol=1e-4, atol=1e-5)

    # and the big model actually accepts out-of-old-range labels
    p2, g2 = make_pair_batch(rng, nvl=5, nel=5)
    out2 = big.apply(params_big, p2, g2)
    assert np.isfinite(np.asarray(out2["pred_c"])).all()
