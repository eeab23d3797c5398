import jax
import jax.numpy as jnp
import numpy as np

from dualmessagepassing_tpu.ops.scatter import (
    gather_nodes,
    scatter_sum_edges,
    segment_softmax_edges,
)


def make_case(rng, b=3, v=7, e=11, h=5):
    msgs = rng.normal(size=(b, e, h)).astype(np.float32)
    recv = rng.integers(0, v, size=(b, e)).astype(np.int32)
    mask = rng.random((b, e)) < 0.7
    return msgs, recv, mask


def ref_scatter(msgs, recv, mask, v):
    b, e, h = msgs.shape
    out = np.zeros((b, v, h), np.float32)
    for bi in range(b):
        for ei in range(e):
            if mask[bi, ei]:
                out[bi, recv[bi, ei]] += msgs[bi, ei]
    return out


def test_scatter_backends_match_reference(rng):
    msgs, recv, mask = make_case(rng)
    want = ref_scatter(msgs, recv, mask, 7)
    for method in ("onehot", "segment"):
        got = scatter_sum_edges(jnp.asarray(msgs), jnp.asarray(recv),
                                jnp.asarray(mask), 7, method=method)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_scatter_grads_match(rng):
    msgs, recv, mask = make_case(rng, b=2, v=5, e=8, h=3)

    def loss(m, method):
        out = scatter_sum_edges(m, jnp.asarray(recv), jnp.asarray(mask), 5,
                                method=method)
        return jnp.sum(jnp.sin(out))

    g1 = jax.grad(lambda m: loss(m, "onehot"))(jnp.asarray(msgs))
    g2 = jax.grad(lambda m: loss(m, "segment"))(jnp.asarray(msgs))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_gather_nodes(rng):
    feat = rng.normal(size=(2, 4, 3)).astype(np.float32)
    idx = np.array([[0, 3, 1], [2, 2, 0]], np.int32)
    got = np.asarray(gather_nodes(jnp.asarray(feat), jnp.asarray(idx)))
    for b in range(2):
        for e in range(3):
            np.testing.assert_array_equal(got[b, e], feat[b, idx[b, e]])


def test_segment_softmax(rng):
    scores = rng.normal(size=(1, 6)).astype(np.float32)
    recv = np.array([[0, 0, 1, 1, 1, 2]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 1]], bool)
    out = np.asarray(
        segment_softmax_edges(jnp.asarray(scores), jnp.asarray(recv),
                              jnp.asarray(mask), 3)
    )
    # masked edge gets 0, each segment sums to 1
    assert out[0, 4] == 0.0
    np.testing.assert_allclose(out[0, :2].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 2:5].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 5], 1.0, rtol=1e-5)


def test_scatter_sum_flat_sorted_flag(rng):
    """indices_sorted=True must be numerically identical on a sorted stream."""
    from dualmessagepassing_tpu.ops.scatter import scatter_sum_flat

    recv = np.sort(rng.integers(0, 16, 64)).astype(np.int32)
    msg = rng.normal(size=(64, 8)).astype(np.float32)
    mask = rng.integers(0, 2, 64).astype(bool)
    a = scatter_sum_flat(jnp.asarray(msg), jnp.asarray(recv),
                         jnp.asarray(mask), 16)
    b = scatter_sum_flat(jnp.asarray(msg), jnp.asarray(recv),
                         jnp.asarray(mask), 16, indices_sorted=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_csr_sort_host():
    """CSR prep: order is a stable receiver sort, row_ptr bounds each row."""
    from dualmessagepassing_tpu.ops.pallas_scatter import csr_sort_host

    recv = np.array([3, 0, 2, 0, 3, 1, 1, 0], np.int32)
    order, row_ptr = csr_sort_host(recv, 5)
    srt = recv[order]
    assert (np.diff(srt) >= 0).all()
    assert row_ptr.tolist() == [0, 3, 5, 6, 8, 8]
    for v in range(5):
        seg = srt[row_ptr[v]:row_ptr[v + 1]]
        assert (seg == v).all()


def test_pallas_csr_segment_sum_tpu(rng):
    """Kernel vs XLA scatter oracle — only runs on real TPU hardware."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("pallas TPU kernel requires TPU backend")
    from dualmessagepassing_tpu.ops.pallas_scatter import (
        csr_sort_host, pallas_csr_segment_sum)

    V, E, H, tile_v, tile_e = 512, 4096, 64, 256, 512
    recv = rng.integers(0, V, E).astype(np.int32)
    msg = rng.normal(size=(E, H)).astype(np.float32)
    order, row_ptr = csr_sort_host(recv, V, tile_e)
    msg_s = np.concatenate([msg[order], np.zeros((tile_e, H), np.float32)])
    recv_s = np.concatenate([recv[order], np.zeros(tile_e, np.int32)])
    out = pallas_csr_segment_sum(jnp.asarray(msg_s), jnp.asarray(recv_s),
                                 jnp.asarray(row_ptr), V, tile_v, tile_e)
    want = jnp.zeros((V, H)).at[jnp.asarray(recv)].add(jnp.asarray(msg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
