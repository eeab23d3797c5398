import numpy as np
import pytest

from dualmessagepassing_tpu.data.subiso import (
    edge_subiso_weights,
    enumerate_subisomorphisms,
    node_subiso_weights,
)


def test_triangle_in_triangle():
    # directed triangle pattern in directed triangle graph: 3 rotations
    ps = np.array([0, 1, 2]); pr = np.array([1, 2, 0])
    pvl = np.zeros(3, np.int64); pel = np.zeros(3, np.int64)
    iso = enumerate_subisomorphisms(ps, pr, pvl, pel, ps, pr, pvl, pel)
    assert iso.shape == (3, 3)
    # every node/edge covered 3 times total (once per rotation)
    np.testing.assert_array_equal(node_subiso_weights(3, iso), [3, 3, 3])
    np.testing.assert_array_equal(
        edge_subiso_weights(ps, pr, pel, ps, pr, pel, iso), [3, 3, 3])


def test_single_edge_pattern():
    # pattern: one edge 0->1; graph: path 0->1->2
    ps, pr = np.array([0]), np.array([1])
    gs, gr = np.array([0, 1]), np.array([1, 2])
    iso = enumerate_subisomorphisms(
        ps, pr, np.zeros(2, np.int64), np.zeros(1, np.int64),
        gs, gr, np.zeros(3, np.int64), np.zeros(2, np.int64))
    assert iso.shape[0] == 2  # (0,1) and (1,2)
    np.testing.assert_array_equal(node_subiso_weights(3, iso), [1, 2, 1])


def test_label_mismatch_blocks():
    ps, pr = np.array([0]), np.array([1])
    iso = enumerate_subisomorphisms(
        ps, pr, np.array([0, 1]), np.array([0]),
        ps, pr, np.array([0, 1]), np.array([1]))  # wrong edge label
    assert iso.shape[0] == 0
    iso = enumerate_subisomorphisms(
        ps, pr, np.array([0, 1]), np.array([0]),
        ps, pr, np.array([1, 0]), np.array([0]))  # wrong node labels
    assert iso.shape[0] == 0


def test_injectivity():
    # pattern with two nodes mapped to same graph node is forbidden
    ps, pr = np.array([0, 1]), np.array([1, 0])  # 2-cycle
    gs, gr = np.array([0]), np.array([0])        # self loop
    iso = enumerate_subisomorphisms(
        ps, pr, np.zeros(2, np.int64), np.zeros(2, np.int64),
        gs, gr, np.zeros(1, np.int64), np.zeros(1, np.int64))
    assert iso.shape[0] == 0


def test_against_networkx(rng):
    nx = pytest.importorskip("networkx")
    from networkx.algorithms import isomorphism as nxiso

    for trial in range(5):
        pv, pe, gv, ge = 3, 4, 6, 14
        ps = rng.integers(0, pv, pe); pr = (ps + rng.integers(1, pv, pe)) % pv
        gs = rng.integers(0, gv, ge); gr = (gs + rng.integers(1, gv, ge)) % gv
        pvl = rng.integers(0, 2, pv); gvl = rng.integers(0, 2, gv)
        pel = rng.integers(0, 2, pe); gel = rng.integers(0, 2, ge)

        iso = enumerate_subisomorphisms(ps, pr, pvl, pel, gs, gr, gvl, gel)

        # networkx MultiDiGraph monomorphism count.  Our definition: for each
        # pattern edge (u,v,el) at least one graph edge (m(u),m(v)) with el.
        # Deduplicate parallel pattern edges with identical (u,v,el) first
        # (they impose the same constraint).
        P = nx.DiGraph()
        for i in range(pv):
            P.add_node(i, l=int(pvl[i]))
        for s, r, l in zip(ps, pr, pel):
            if P.has_edge(s, r):
                P[s][r]["ls"].add(int(l))
            else:
                P.add_edge(int(s), int(r), ls={int(l)})
        G = nx.DiGraph()
        for i in range(gv):
            G.add_node(i, l=int(gvl[i]))
        for s, r, l in zip(gs, gr, gel):
            if G.has_edge(s, r):
                G[s][r]["ls"].add(int(l))
            else:
                G.add_edge(int(s), int(r), ls={int(l)})

        gm = nxiso.DiGraphMatcher(
            G, P,
            node_match=lambda a, b: a["l"] == b["l"],
            edge_match=lambda a, b: b["ls"].issubset(a["ls"]),
        )
        want = sum(1 for _ in gm.subgraph_monomorphisms_iter())
        assert iso.shape[0] == want, f"trial {trial}: {iso.shape[0]} != {want}"
