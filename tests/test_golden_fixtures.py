"""Literal hand-derived golden fixtures (round-3 VERDICT item 6).

Every other "golden" test in this suite compares the JAX layers against a
numpy re-implementation WRITTEN BY THE SAME AUTHOR from the same reading
of the reference — a shared-misreading risk. These four fixtures break
that symmetry: each is a tiny case (<= 4 nodes / 4 edges) whose expected
outputs are LITERAL NUMBERS derived by hand in the comments directly from
the reference math, asserted to 1e-6. No second implementation of the
layer exists here; the only computations used to produce the literals
are pencil-and-paper arithmetic plus a calculator for two softplus
constants (the formulas are spelled out at the assertion site).

Reference math being fixed:
  * DMPLayer            SubgraphCountingMatching/models/dmpnn.py:111-156
  * DualGraphConv       UnsupervisedNodeClassification/Model/DMPNN/src/model.py:229-268
  * CompGCN circular corr  SubgraphCountingMatching/models/compgcn.py:84-98,213-224
  * DistMult loss + regs   Model/DMPNN/src/model.py:668-677,691-723
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualmessagepassing_tpu import batch_graphs, single_graph


def _jnp(x):
    return jnp.asarray(np.asarray(x, np.float32))


# ---------------------------------------------------------------------------
# Shared tiny graph: 3 nodes, 2 edges.
#   e0: 0 -> 1, forward       e1: 2 -> 1, REVERSED (rev_flag set)
# out-degrees (from senders): node0=1, node1=0, node2=1
#
# Hand-picked parameters (identity-like so every product is mental math):
#   W_in = I, W_out = 2I, W_nloop = I, W_dst = I, W_eloop = I
#   W_src = SWAP = [[0,1],[1,0]]      b_n = [0.1, -0.2], b_e = 0
#   both update MLPs: fc0 = I (b 0), activation, fc1 = I (b 0)
#
# node features H = [[1,0],[0,1],[1,1]], edge features E = [[1,2],[3,1]]
#
# Products used below (by hand):
#   H @ W_src : n0 [0,1]  n1 [1,0]  n2 [1,1]
#   H @ W_dst : n0 [1,0]  n1 [0,1]  n2 [1,1]
#   E @ W_in  = E = [[1,2],[3,1]];   E @ W_out = 2E = [[2,4],[6,2]]
#   W_src - W_dst = [[-1,1],[1,-1]]:
#       E0 @ (W_src-W_dst) = [-1+2, 1-2] = [ 1,-1]
#       E1 @ (W_src-W_dst) = [-3+1, 3-1] = [-2, 2]
# ---------------------------------------------------------------------------

I2 = np.eye(2, dtype=np.float32)
SWAP = np.array([[0.0, 1.0], [1.0, 0.0]], np.float32)
NODE_FEAT = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)
EDGE_FEAT = np.array([[1.0, 2.0], [3.0, 1.0]], np.float32)


def test_dmp_layer_hand_fixture():
    """DMPLayer forward (dmpnn.py:111-156 math; our models/dmpnn.py).

    Derivation (act = relu, no BN, no dropout):
      edge messages (edge stream, dmpnn.py:111-127):
        e0 fwd: dst@W_dst - src@W_src = n1@W_dst - n0@W_src
              = [0,1] - [0,1] = [0,0]
        e1 rev: src@W_dst - dst@W_src = n2@W_dst - n1@W_src
              = [1,1] - [1,0] = [0,1]
      node messages (summed at the receiver, both edges -> node 1):
        e0 fwd: -(E0@W_in)  = [-1,-2]
        e1 rev: +(E1@W_out) = [ 6, 2]
        agg[node1] = [-1,-2] + [6,2] = [5,0];  agg[node0,2] = [0,0]
      node update (dmpnn.py:129-140): H@W_nloop + agg + b_n, then
      MLP fc0=I -> relu -> fc1=I:
        n0: [1,0]+[0,0]+[.1,-.2] = [1.1,-0.2] -> relu -> [1.1, 0]
        n1: [0,1]+[5,0]+[.1,-.2] = [5.1, 0.8] ->       [5.1, 0.8]
        n2: [1,1]+[0,0]+[.1,-.2] = [1.1, 0.8] ->       [1.1, 0.8]
      edge update (dmpnn.py:142-156): both receivers are node 1 with
      out-degree 0, so d = log2(1+0) = 0 and the degree factor is
      2*(1+d) = 2:
        e0: E0@W_eloop + 2*[ 1,-1] + edge_msg [0,0] = [1,2]+[2,-2] = [ 3,0]
        e1: E1@W_eloop + 2*[-2, 2] + edge_msg [0,1] = [3,1]+[-4,4]+[0,1]
                                                    = [-1,6]
        MLP: relu -> e0 [3,0], e1 [0,6]
    """
    from dualmessagepassing_tpu.models.dmpnn import DMPLayer

    rec = single_graph(3, [0, 2], [1, 1], v_max=3, e_max=2)
    graph = batch_graphs([rec])
    graph = graph.replace(rev_flag=jnp.asarray([[False, True]]))

    params = {
        "in_weight": _jnp(I2), "out_weight": _jnp(2 * I2),
        "nloop_weight": _jnp(I2), "src_weight": _jnp(SWAP),
        "dst_weight": _jnp(I2), "eloop_weight": _jnp(I2),
        "nbias": _jnp([0.1, -0.2]), "ebias": _jnp([0.0, 0.0]),
        "nmlp": {"fc0": {"kernel": _jnp(I2), "bias": _jnp([0.0, 0.0])},
                 "fc1": {"kernel": _jnp(I2), "bias": _jnp([0.0, 0.0])}},
        "emlp": {"fc0": {"kernel": _jnp(I2), "bias": _jnp([0.0, 0.0])},
                 "fc1": {"kernel": _jnp(I2), "bias": _jnp([0.0, 0.0])}},
    }
    layer = DMPLayer(hidden_dim=2, act="relu", dropout=0.0)
    v_out, e_out = layer.apply({"params": params}, graph,
                               _jnp(NODE_FEAT[None]), _jnp(EDGE_FEAT[None]))

    expected_v = np.array([[1.1, 0.0], [5.1, 0.8], [1.1, 0.8]], np.float32)
    expected_e = np.array([[3.0, 0.0], [0.0, 6.0]], np.float32)
    np.testing.assert_allclose(np.asarray(v_out[0]), expected_v, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e_out[0]), expected_e, atol=1e-6)


def test_dual_graph_conv_hand_fixture():
    """DualGraphConv forward (UNC model.py:229-268; our unc/model.py).

    Same tiny graph/params as above, flat (unbatched) layout, with the UNC
    specifics: edge_norm multiplies the node message (model.py:234-235)
    and the update MLPs are Linear-LeakyReLU(1/5.5)-Linear (model.py:
    146-168; BN disabled here so every literal stays rational).

    edge_norm = [[0.5],[1.0]]:
      node messages: e0 fwd -(E0@W_in)*0.5 = [-0.5,-1]
                     e1 rev +(E1@W_out)*1  = [ 6,  2]
      agg[node1] = [5.5, 1]
      node update: H@W_nloop + agg + b_n:
        n0 [1.1,-0.2]  n1 [0+5.5+0.1, 1+1-0.2]=[5.6,1.8]  n2 [1.1,0.8]
      MLP fc0=I -> LeakyReLU(1/5.5) -> fc1=I: only n0's -0.2 is negative:
        -0.2/5.5 = -0.03636363636363637 (exact rational -2/55)
      edge stream: identical edge_msg/add/eloop as the DMPLayer fixture
      (edge_norm does NOT touch the edge stream, model.py:236-268):
        e0 pre [3, 0] -> leaky -> [3, 0]
        e1 pre [-1,6] -> leaky -> [-1/5.5, 6] = [-0.18181818181818182, 6]
    """
    from dualmessagepassing_tpu.unc.model import DualGraphConv

    sub = {
        "senders": jnp.asarray([0, 2]), "receivers": jnp.asarray([1, 1]),
        "rev_flag": jnp.asarray([False, True]),
        "edge_mask": jnp.asarray([True, True]),
        "node_mask": jnp.asarray([True, True, True]),
    }
    params = {
        "in_weight": _jnp(I2), "out_weight": _jnp(2 * I2),
        "nloop_weight": _jnp(I2), "src_weight": _jnp(SWAP),
        "dst_weight": _jnp(I2), "eloop_weight": _jnp(I2),
        "nbias": _jnp([0.1, -0.2]), "ebias": _jnp([0.0, 0.0]),
        "nmlp": {"fc0_kernel": _jnp(I2), "fc0_bias": _jnp([0.0, 0.0]),
                 "fc1_kernel": _jnp(I2), "fc1_bias": _jnp([0.0, 0.0])},
        "emlp": {"fc0_kernel": _jnp(I2), "fc0_bias": _jnp([0.0, 0.0]),
                 "fc1_kernel": _jnp(I2), "fc1_bias": _jnp([0.0, 0.0])},
    }
    layer = DualGraphConv(hidden_dim=2, batch_norm=False, activation=None,
                          dropout=0.0)
    n_out, e_out = layer.apply(
        {"params": params}, sub, _jnp(NODE_FEAT), _jnp(EDGE_FEAT),
        edge_norm=_jnp([[0.5], [1.0]]))

    expected_n = np.array([[1.1, -0.03636363636363637],
                           [5.6, 1.8],
                           [1.1, 0.8]], np.float32)
    expected_e = np.array([[3.0, 0.0],
                           [-0.18181818181818182, 6.0]], np.float32)
    np.testing.assert_allclose(np.asarray(n_out), expected_n,
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(e_out), expected_e,
                               atol=1e-6, rtol=0)


def test_compgcn_circular_correlation_hand_fixture():
    """corr(a, r) = irfft(conj(rfft(a)) * rfft(r)) (compgcn.py:84-98,
    213-224) is the circular cross-correlation
        out[k] = sum_i a[i] * r[(i+k) mod n].
    a = [1,2,0,1], r = [3,1,2,0]:
        k=0: 1*3 + 2*1 + 0*2 + 1*0 = 5
        k=1: 1*1 + 2*2 + 0*0 + 1*3 = 8
        k=2: 1*2 + 2*0 + 0*3 + 1*1 = 3
        k=3: 1*0 + 2*3 + 0*1 + 1*2 = 8
    (cross-check: sum_k out[k] = sum(a)*sum(r) = 4*6 = 24 = 5+8+3+8)
    """
    from dualmessagepassing_tpu.models.compgcn import comp_func

    a = _jnp([[1.0, 2.0, 0.0, 1.0]])
    r = _jnp([[3.0, 1.0, 2.0, 0.0]])
    out = comp_func(a, r, "corr")
    np.testing.assert_allclose(np.asarray(out)[0],
                               [5.0, 8.0, 3.0, 8.0], atol=1e-5)


def test_distmult_loss_hand_fixture():
    """UNCTrainModel.unsupervised_loss (model.py:668-677,691-723).

    h_dim=2, num_rels=1 (backbone-doubled to 2), reg_param=0.01.
    Hand parameters: w_relation = [[2, 0.5]], edge_fc = identity (b 0).
    Backbone outputs (fed directly; the loss never calls the backbone):
      h = [[1,2],[3,1]]   z = [[1,1],[0,1]]   r_bar = [[.5,.5],[0,0]]
    Samples [[0,0,1],[1,0,0]], labels [1,0]:
      DistMult score (calc_score, model.py:668-677) sum(s*r*o):
        s0: [1,2]*[2,.5]*[3,1] -> 1*2*3 + 2*.5*1 = 7
        s1: [3,1]*[2,.5]*[1,2] -> 3*2*1 + 1*.5*2 = 7
      BCE with logits (sigmoid_binary_cross_entropy):
        y=1: softplus(-7) = ln(1+e^-7) = 0.0009114664537742447
        y=0: softplus(+7) = 7 + ln(1+e^-7) = 7.000911466453775
        predict_loss = mean = 3.5009114664537746
      Regularizer (model.py:691-715):
        mean(w_rel^2)  = (4 + 0.25)/2          = 2.125
        mean(h^2)      = (1+4+9+1)/4           = 3.75
        mean(z^2)      = (1+1+0+1)/4           = 0.75
        mean(r_bar^2)  = (.25+.25+0+0)/4       = 0.125
        edge alignment: only e0 has type < num_rels;
          edge_fc(z0) - w_rel[0] = [1,1]-[2,.5] = [-1, .5]; |.|^2 = 1.25
          term = 1.25 / (1 edge * h_dim 2)     = 0.625
        reg total                              = 7.375
      loss = 3.5009114664537746 + 0.01 * 7.375 = 3.5746614664537746
    """
    from dualmessagepassing_tpu.unc.model import UNCTrainModel

    model = UNCTrainModel(num_nodes=2, num_rels=1, h_dim=2, nlabel=0,
                          num_hidden_layers=1, dropout=0.0, reg_param=0.01,
                          backbone="DMPNN")
    params = {
        "w_relation": _jnp([[2.0, 0.5]]),
        "edge_fc": {"kernel": _jnp(I2), "bias": _jnp([0.0, 0.0])},
    }
    h = _jnp([[1.0, 2.0], [3.0, 1.0]])
    z = _jnp([[1.0, 1.0], [0.0, 1.0]])
    r_bar = _jnp([[0.5, 0.5], [0.0, 0.0]])
    loss = model.apply(
        {"params": params}, (h, z, r_bar),
        jnp.asarray([0, 1]), jnp.asarray([True, True]),
        jnp.asarray([[0, 0, 1], [1, 0, 0]]), _jnp([1.0, 0.0]),
        jnp.asarray([True, True]), jnp.asarray([True, True]),
        method=UNCTrainModel.unsupervised_loss)
    np.testing.assert_allclose(float(loss), 3.5746614664537746, atol=1e-6)
