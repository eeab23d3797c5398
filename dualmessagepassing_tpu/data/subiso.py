"""Subgraph-isomorphism ground truth: enumeration + weight kernels.

Replaces two things from the reference:
  * the numba weight kernels `compute_nodeseq_subisoweights` /
    `compute_edgeseq_subisoweights` (/root/reference/SubgraphCountingMatching/
    dataset.py:54-108) — vectorized numpy here;
  * the *external* subisomorphism solver whose outputs ship with the
    reference datasets (metadata CSV `subisomorphisms` column,
    utils/io.py:43-142) — a brute-force backtracking enumerator here, used
    to generate synthetic datasets with exact ground truth in-repo.

A subisomorphism is an injective node mapping m: V_p -> V_g such that node
labels match and for every pattern edge (u, v, el) a graph edge
(m(u), m(v), el) exists.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def enumerate_subisomorphisms(
    p_senders: np.ndarray, p_receivers: np.ndarray, p_vlabels: np.ndarray,
    p_elabels: np.ndarray,
    g_senders: np.ndarray, g_receivers: np.ndarray, g_vlabels: np.ndarray,
    g_elabels: np.ndarray,
    max_count: int = 1_000_000,
    use_native: bool = True,
) -> np.ndarray:
    """All injective label-preserving mappings, [n_iso, n_pattern_nodes].

    Prefers the C++ backtracking kernel (csrc/hostkernels.cpp, ~5-50x
    faster); falls back to the Python implementation below.
    """
    if use_native:
        from .. import native
        if native.available():
            out = native.enumerate_subiso_native(
                p_senders, p_receivers, p_elabels, p_vlabels,
                g_senders, g_receivers, g_elabels, g_vlabels,
                max_count=max_count)
            if out is not None:
                return out
    n_p = len(p_vlabels)
    n_g = len(g_vlabels)
    # adjacency with labels: edge-label sets per (u, v)
    g_edge_set = {}
    for s, r, l in zip(g_senders, g_receivers, g_elabels):
        g_edge_set.setdefault((int(s), int(r)), set()).add(int(l))

    # pattern adjacency among the first k mapped nodes
    p_out = [[] for _ in range(n_p)]  # node -> [(nbr, el, direction)]
    for s, r, l in zip(p_senders, p_receivers, p_elabels):
        p_out[int(s)].append((int(r), int(l), 0))
        p_out[int(r)].append((int(s), int(l), 1))

    # candidates by label
    candidates = [
        np.nonzero(g_vlabels == p_vlabels[i])[0].tolist() for i in range(n_p)
    ]

    results: List[List[int]] = []
    mapping = [-1] * n_p
    used = [False] * n_g

    def ok(i: int, g: int) -> bool:
        for nbr, el, drc in p_out[i]:
            m = mapping[nbr]
            if m < 0:
                continue
            key = (g, m) if drc == 0 else (m, g)
            labels = g_edge_set.get(key)
            if labels is None or el not in labels:
                return False
        return True

    def backtrack(i: int):
        if len(results) >= max_count:
            return
        if i == n_p:
            results.append(mapping.copy())
            return
        for g in candidates[i]:
            if not used[g] and ok(i, g):
                mapping[i] = g
                used[g] = True
                backtrack(i + 1)
                used[g] = False
                mapping[i] = -1

    backtrack(0)
    if not results:
        return np.zeros((0, n_p), dtype=np.int64)
    return np.asarray(results, dtype=np.int64)


def node_subiso_weights(num_nodes: int, subisomorphisms: np.ndarray) -> np.ndarray:
    """Per-node occurrence counts (dataset.py:54-61)."""
    if subisomorphisms.size == 0:
        return np.zeros((num_nodes,), dtype=np.int64)
    return np.bincount(subisomorphisms.reshape(-1), minlength=num_nodes).astype(
        np.int64
    )


def edge_subiso_weights(
    p_senders: np.ndarray, p_receivers: np.ndarray, p_elabels: np.ndarray,
    g_senders: np.ndarray, g_receivers: np.ndarray, g_elabels: np.ndarray,
    subisomorphisms: np.ndarray,
) -> np.ndarray:
    """Per-graph-edge counts: for each subisomorphism and pattern edge
    (u, v, el), every graph edge (m(u), m(v), el) gets +1
    (dataset.py:69-108; our edges are in arbitrary order — no srcdst sort
    and eid scatter needed since we match (src, dst, label) directly).
    """
    n_ge = len(g_senders)
    weights = np.zeros((n_ge,), dtype=np.int64)
    if subisomorphisms.size == 0 or len(p_senders) == 0:
        return weights
    from .. import native
    if native.available():
        n_g = int(max(g_senders.max(), g_receivers.max())) + 1
        out = native.edge_subiso_weights_native(
            p_senders, p_receivers, p_elabels,
            g_senders, g_receivers, g_elabels, n_g, subisomorphisms)
        if out is not None:
            return out
    # index graph edges by (src, dst, label)
    idx: Dict[Tuple[int, int, int], List[int]] = {}
    for e, (s, r, l) in enumerate(zip(g_senders, g_receivers, g_elabels)):
        idx.setdefault((int(s), int(r), int(l)), []).append(e)
    for m in subisomorphisms:
        for s, r, l in zip(p_senders, p_receivers, p_elabels):
            for e in idx.get((int(m[s]), int(m[r]), int(l)), ()):
                weights[e] += 1
    return weights
