"""Windowed segment-sum kernel (ops/segment_kernel.py).

CPU coverage: the pallas kernel itself runs through the interpreter on
small sizes (hubs, empty windows, pad edges, partial chunks) against a
numpy oracle; the scatter fallback and the custom VJP are checked against
XLA's own scatter/grad. TPU perf numbers live in scripts/kernel_bench.py
and the module docstring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualmessagepassing_tpu.ops import segment_kernel as sk


def make_case(rng, v, e, hub=False):
    recv = rng.integers(0, v, e).astype(np.int32)
    if hub:
        recv[: e // 2] = 3          # one huge row + sparse tail
    recv = np.sort(recv)
    msg = rng.normal(size=(e, 8)).astype(np.float32)
    ref = np.zeros((v, 8), np.float32)
    np.add.at(ref, recv, msg)
    return recv, msg, ref


@pytest.mark.parametrize("hub", [False, True])
@pytest.mark.parametrize("mode", ["highest", "hilo"])
def test_kernel_matches_oracle_interpret(rng, hub, mode):
    v, e = 300, 700
    recv, msg, ref = make_case(rng, v, e, hub)
    plan = sk.build_pass_plan(recv, v, e_env=e, v_env=v,
                              tile_e=64, window=128)
    sk.INTERPRET = True
    try:
        out = np.asarray(sk.windowed_segment_sum(
            jnp.asarray(msg), plan, v, mode=mode))
    finally:
        sk.INTERPRET = False
    tol = 2e-5 if mode == "highest" else 2e-3
    np.testing.assert_allclose(out, ref, atol=tol, rtol=tol)


@pytest.mark.parametrize("hub", [False, True])
def test_kernel_bf16_mode_interpret(rng, hub):
    """bf16 single-pass input mode (segment_sum_windowed_arrays dispatches
    to it for bf16 streams — the amp forward aggregation AND the
    receiver-gather cotangent, unc.model._take_rows_win): one MXU pass,
    f32 accumulate. Oracle = f32 accumulation of the SAME bf16-rounded
    values (XLA's scatter semantics for a bf16 stream)."""
    v, e = 300, 700
    recv, msg, _ = make_case(rng, v, e, hub)
    msg_bf16 = jnp.asarray(msg).astype(jnp.bfloat16)
    ref = np.zeros((v, 8), np.float32)
    np.add.at(ref, recv, np.asarray(msg_bf16, np.float32))
    plan = sk.build_pass_plan(recv, v, e_env=e, v_env=v,
                              tile_e=64, window=128)
    arrs = {k: jnp.asarray(plan[k]) for k in ("blk", "win", "first")}
    sk.INTERPRET = True
    try:
        out = np.asarray(sk.segment_sum_windowed_arrays(
            msg_bf16, jnp.asarray(plan["recv_col"]), arrs["blk"],
            arrs["win"], arrs["first"], num_nodes=v,
            tile_e=64, window=128), np.float32)
    finally:
        sk.INTERPRET = False
    # output is rounded back to the stream dtype (bf16) — compare there
    np.testing.assert_allclose(
        out, np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32),
        atol=2e-2, rtol=2e-2)


def test_fallback_matches_oracle(rng):
    v, e = 257, 900
    recv, msg, ref = make_case(rng, v, e)
    plan = sk.build_pass_plan(recv, v, e_env=1024, v_env=512,
                              tile_e=128, window=128)
    out = np.asarray(sk.windowed_segment_sum(jnp.asarray(msg), plan, v))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_vjp_matches_scatter_grad(rng):
    v, e = 300, 700
    recv, msg, _ = make_case(rng, v, e)
    plan = sk.build_pass_plan(recv, v, e_env=e, v_env=v,
                              tile_e=64, window=128)
    g_out = rng.normal(size=(v, 8)).astype(np.float32)

    def via_kernel(m):
        return jnp.sum(sk.windowed_segment_sum(m, plan, v)
                       * jnp.asarray(g_out))

    def via_scatter(m):
        return jnp.sum(jnp.zeros((v, 8), jnp.float32).at[
            jnp.asarray(recv)].add(m) * jnp.asarray(g_out))

    g1 = jax.grad(via_kernel)(jnp.asarray(msg))
    g2 = jax.grad(via_scatter)(jnp.asarray(msg))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_plan_invariants(rng):
    v, e = 500, 1200
    recv, _, _ = make_case(rng, v, e, hub=True)
    T, W = 128, 128
    plan = sk.build_pass_plan(recv, v, e_env=2048, v_env=640,
                              tile_e=T, window=W)
    blk, win, first = plan["blk"], plan["win"], plan["first"]
    v_pad, e_pad = plan["v_pad"], plan["e_pad"]
    n_windows = v_pad // W
    # static envelope sizes
    assert len(blk) == e_pad // T + v_pad // W + 2
    assert e_pad % (8 * T) == 0
    # every real window is touched exactly once as "first"
    firsts = win[first.astype(bool)]
    real = firsts[firsts < n_windows]
    assert set(real.tolist()) == set(range(n_windows))
    # stream passes are in order and blocks never move backwards
    stream = blk[win < n_windows]
    assert (np.diff(np.maximum.accumulate(stream)) >= 0).all()
    # pad slots point at the dump window
    assert (plan["recv_col"][e:, 0] == v_pad).all()


def test_plan_rejects_unsorted(rng):
    recv = np.array([5, 3, 9], np.int32)
    with pytest.raises(ValueError):
        sk.build_pass_plan(recv, 16, e_env=16, v_env=16)


@pytest.mark.parametrize("backbone", ["DMPNN", "CompGCN", "RGCN", "RGIN"])
def test_model_windowed_backend_matches_xla(rng, backbone):
    """UNCTrainModel(scatter_backend="windowed") forward + gradients equal
    the XLA-scatter model on the same subgraph (kernel via interpreter).
    All four backbones share the receiver-stream pass plan (CompGCN pads
    weight columns; RGCN/RGIN run the kernel per relation in the scan)."""
    from test_ep_unc import make_padded_sub
    from dualmessagepassing_tpu.unc.model import (UNCTrainModel,
                                                  init_unc_variables)

    sub = make_padded_sub(rng)
    planned = sk.attach_scatter_plan(sub)
    sub_dev = {k: jnp.asarray(v) for k, v in sub.items()}
    plan_dev = {k: jnp.asarray(v) for k, v in planned.items()}
    kw = dict(num_nodes=40, num_rels=3, h_dim=16, nlabel=0,
              num_hidden_layers=2, dropout=0.0, reg_param=0.01,
              backbone=backbone, sorted_edges=True)
    ref_model = UNCTrainModel(**kw)
    win_model = UNCTrainModel(scatter_backend="windowed", **kw)
    variables = init_unc_variables(ref_model, jax.random.PRNGKey(0), sub_dev)

    def loss(model, s, p):
        vs = {"params": p, **({k: v for k, v in variables.items()
                               if k == "batch_stats"})}
        (out, _), _m = model.apply(vs, s, train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.PRNGKey(1)})
        return model.apply(vs, out, s["edge_type"], s["edge_mask"],
                           s["samples"], s["labels"], s["sample_mask"],
                           s["node_mask"],
                           method=UNCTrainModel.unsupervised_loss)

    params = variables["params"]
    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss(ref_model, sub_dev, p))(params)
    sk.INTERPRET = True
    try:
        l_win, g_win = jax.value_and_grad(
            lambda p: loss(win_model, plan_dev, p))(params)
    finally:
        sk.INTERPRET = False
    np.testing.assert_allclose(float(l_ref), float(l_win), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_win)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_train_unc_windowed_end_to_end(rng):
    """train_unc(scatter_backend='windowed') runs the full pipeline with
    per-batch pass plans attached (CPU fallback path exercises the same
    plan plumbing the TPU kernel consumes)."""
    from dualmessagepassing_tpu.unc.driver import train_unc

    src = rng.integers(0, 25, 120)
    dst = (src + rng.integers(1, 25, 120)) % 25
    rel = rng.integers(0, 2, 120)
    t = np.stack([src, rel, dst], axis=1).astype(np.int64)
    embs, coverage = train_unc(
        t, 25, 2, h_dim=8, n_layers=1, lr=1e-2, reg_param=0.01,
        negative_rate=2, graph_batch_size=40, graph_split_size=0.9,
        sampler="randomwalk", sample_depth=2, sample_width=5,
        n_epochs=2, v_max=25, e_max=125, seed=0,
        scatter_backend="windowed", log=lambda s: None)
    assert embs.shape == (25, 8)
    assert coverage > 0.9
    assert np.isfinite(embs).all()


def test_empty_stream():
    plan = sk.build_pass_plan(np.zeros(0, np.int32), 100, e_env=64,
                              v_env=128, tile_e=64, window=128)
    out = np.asarray(sk.windowed_segment_sum(
        jnp.zeros((0, 4), jnp.float32), plan, 100))
    assert out.shape == (100, 4)
    assert (out == 0).all()


def test_take_rows_win_perm_matches_sorted_scatter(rng):
    """The windowed sender-cotangent VJP (_take_rows_win_perm over the
    senders-sorted twin plan, attach_scatter_plan(sender_plan=True))
    equals the sorted-scatter VJP (_take_rows_perm) — forward and
    table-cotangent — on a bf16 table (kernel via interpreter)."""
    from dualmessagepassing_tpu.unc.model import (_take_rows_perm,
                                                  _take_rows_win_perm)

    V, E, W = 40, 192, 128
    senders = np.sort(rng.integers(0, V, E - 9)).astype(np.int64)
    senders = np.concatenate([rng.permutation(senders),
                              np.zeros(9, np.int64)])  # pad-ish rows
    sub = {
        "node_mask": np.ones(V, bool),
        "edge_mask": np.arange(E) < E - 9,
        "senders": senders,
        "receivers": np.sort(rng.integers(0, V, E)).astype(np.int64),
    }
    planned = sk.attach_scatter_plan(sub, sender_plan=True)
    table = jnp.asarray(rng.normal(size=(V, W)), jnp.bfloat16)
    idx = jnp.asarray(senders)
    order = jnp.asarray(planned["send_order"])
    idx_sorted = jnp.asarray(planned["senders_sorted"])
    cot = jnp.asarray(rng.normal(size=(E, W)), jnp.bfloat16)

    def f_ref(t):
        return jnp.sum(_take_rows_perm(t, idx, order, idx_sorted)
                       * cot.astype(t.dtype))

    def f_win(t):
        return jnp.sum(_take_rows_win_perm(
            t, idx, order,
            jnp.asarray(planned["sk2_recv"]), jnp.asarray(planned["sk2_blk"]),
            jnp.asarray(planned["sk2_win"]), jnp.asarray(planned["sk2_first"]))
            * cot.astype(t.dtype))

    v_ref, g_ref = jax.value_and_grad(f_ref)(table)
    sk.INTERPRET = True
    try:
        v_win, g_win = jax.value_and_grad(f_win)(table)
    finally:
        sk.INTERPRET = False
    np.testing.assert_allclose(float(v_ref), float(v_win), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(g_win, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_bcast_plan_invariants(rng):
    """build_bcast_plan: every edge chunk of the envelope gets exactly one
    first pass (unvisited output blocks would be garbage), stream order is
    chunk-major, and the pass count stays inside the shared envelope."""
    v, e = 500, 1200
    recv, _, _ = make_case(rng, v, e, hub=True)
    T, W = 128, 128
    plan = sk.build_bcast_plan(recv, v, e_env=2048, v_env=640,
                               tile_e=T, window=W)
    blk, win, first = plan["blk"], plan["win"], plan["first"]
    v_pad, e_pad = plan["v_pad"], plan["e_pad"]
    dump = v_pad // W
    assert len(blk) == e_pad // T + v_pad // W + 2     # shared envelope
    # every chunk (incl. all-pad tail chunks) is first-touched exactly once
    firsts = blk[first.astype(bool)]
    assert sorted(firsts.tolist()) == list(range(e_pad // T))
    # chunk-major stream order
    assert (np.diff(np.maximum.accumulate(blk)) >= 0).all()
    # pad slots aim at the dump window
    assert (win <= dump).all()


def test_row_broadcast_matches_gather_interpret(rng):
    """windowed_row_broadcast == table[recv] on real slots, ZERO on pad
    slots (bf16 table, kernel via interpreter; partial chunks, hubs)."""
    v, e, e_env, v_env = 300, 700, 1024, 384
    recv, _, _ = make_case(rng, v, e, hub=True)
    table = jnp.asarray(rng.normal(size=(v_env, 128)), jnp.bfloat16)
    plan = sk.build_pass_plan(recv, v, e_env=e_env, v_env=v_env,
                              tile_e=64, window=128)
    bp = sk.build_bcast_plan(recv, v, e_env=e_env, v_env=v_env,
                             tile_e=64, window=128)
    sk.INTERPRET = True
    try:
        out = np.asarray(sk.windowed_row_broadcast(
            table, jnp.asarray(plan["recv_col"]), jnp.asarray(bp["blk"]),
            jnp.asarray(bp["win"]), jnp.asarray(bp["first"]),
            tile_e=64, window=128).astype(jnp.float32))
    finally:
        sk.INTERPRET = False
    ref = np.asarray(table, np.float32)[recv]
    np.testing.assert_array_equal(out[:e], ref)        # bitwise row copy
    assert (out[e:] == 0).all()                        # pad slots zero


def test_row_broadcast_fallback_matches_gather(rng):
    """The non-TPU fallback path (what CPU training exercises) has the
    same semantics as the kernel: table rows on real slots, zeros on
    pads."""
    v, e, e_env, v_env = 200, 450, 512, 256
    recv, _, _ = make_case(rng, v, e)
    table = jnp.asarray(rng.normal(size=(v_env, 128)), jnp.bfloat16)
    plan = sk.build_pass_plan(recv, v, e_env=e_env, v_env=v_env)
    bp = sk.build_bcast_plan(recv, v, e_env=e_env, v_env=v_env)
    out = np.asarray(sk.windowed_row_broadcast(
        table, jnp.asarray(plan["recv_col"]), jnp.asarray(bp["blk"]),
        jnp.asarray(bp["win"]), jnp.asarray(bp["first"])
        ).astype(jnp.float32))
    ref = np.asarray(table, np.float32)[recv]
    np.testing.assert_array_equal(out[:e], ref)
    assert (out[e:] == 0).all()


def test_model_recv_bcast_matches_windowed(rng):
    """UNCTrainModel under amp with the bcast plan attached (windowed
    forward receiver gather) produces the same loss and gradients as the
    windowed-backward-only path (_take_rows_win) — the two differ only
    in HOW table[receivers] is materialized (kernel via interpreter).
    Pad-edge rows differ by design (zeros vs table[pad_idx]); equality
    of loss/grads pins that the model masks pad edges everywhere."""
    from test_ep_unc import make_padded_sub
    from dualmessagepassing_tpu.unc.model import (UNCTrainModel,
                                                  init_unc_variables)
    from dualmessagepassing_tpu.utils.amp import (cast_floats,
                                                  compute_dtype_scope)

    sub = make_padded_sub(rng)
    planned = sk.attach_scatter_plan(sub)
    planned_b = sk.attach_scatter_plan(sub, bcast_plan=True)
    kw = dict(num_nodes=40, num_rels=3, h_dim=16, nlabel=0,
              num_hidden_layers=2, dropout=0.0, reg_param=0.01,
              backbone="DMPNN", sorted_edges=True,
              scatter_backend="windowed", pad_cols=True)
    model = UNCTrainModel(**kw)
    sub0 = {k: jnp.asarray(v) for k, v in planned.items()}
    sub1 = {k: jnp.asarray(v) for k, v in planned_b.items()}
    variables = init_unc_variables(model, jax.random.PRNGKey(0), sub0)

    def loss(s, p):
        with compute_dtype_scope(jnp.bfloat16):
            vs = {"params": cast_floats(p, jnp.bfloat16),
                  **({k: v for k, v in variables.items()
                      if k == "batch_stats"})}
            (out, _), _m = model.apply(vs, s, train=True,
                                       mutable=["batch_stats"],
                                       rngs={"dropout":
                                             jax.random.PRNGKey(1)})
            l = model.apply(vs, out, s["edge_type"], s["edge_mask"],
                            s["samples"], s["labels"], s["sample_mask"],
                            s["node_mask"],
                            method=UNCTrainModel.unsupervised_loss)
        return l.astype(jnp.float32)

    params = variables["params"]
    sk.INTERPRET = True
    try:
        l0, g0 = jax.value_and_grad(lambda p: loss(sub0, p))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(sub1, p))(params)
    finally:
        sk.INTERPRET = False
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-3, atol=1e-4)
