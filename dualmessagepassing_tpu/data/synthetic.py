"""Synthetic (pattern, graph) pair generation with exact ground truth.

The reference datasets (Erdős–Rényi / Regular / Complex / MUTAG) are external
downloads produced by a generator + subiso solver; to make this framework
runnable end-to-end in-repo we generate Erdős–Rényi-style pairs and compute
counts/subisomorphisms with the brute-force oracle (data/subiso.py).
Envelope conventions follow the reference dataset caps
(SubgraphCountingMatching/README.md:38-43: pattern <=4V/10E, graph <=10V/48E
for the ER set).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..graph import single_graph
from .subiso import edge_subiso_weights, enumerate_subisomorphisms, node_subiso_weights


def random_multidigraph(rng, num_nodes, num_edges, num_vlabels, num_elabels,
                        connected_bias=True):
    """Random directed (multi)graph without self loops."""
    senders = rng.integers(0, num_nodes, size=num_edges)
    offs = rng.integers(1, max(num_nodes, 2), size=num_edges)
    receivers = (senders + offs) % num_nodes  # no self loops
    vlabels = rng.integers(0, num_vlabels, size=num_nodes)
    elabels = rng.integers(0, num_elabels, size=num_edges)
    return senders.astype(np.int64), receivers.astype(np.int64), \
        vlabels.astype(np.int64), elabels.astype(np.int64)


def generate_pair(
    rng,
    pv: int = 3, pe: int = 3, gv: int = 8, ge: int = 16,
    num_vlabels: int = 2, num_elabels: int = 2,
    p_v_max: Optional[int] = None, p_e_max: Optional[int] = None,
    g_v_max: Optional[int] = None, g_e_max: Optional[int] = None,
    pair_id: str = "0-0",
    plant: int = 0,
    p_num_vlabels: Optional[int] = None, p_num_elabels: Optional[int] = None,
) -> Dict:
    """One dataset record: pattern/graph records + counts + subisomorphisms +
    derived node/edge weights (the reference stores these in metadata CSVs,
    utils/io.py:43-142, and derives weights lazily, dataset.py:1491-1520).

    `plant` inserts that many copies of the pattern into the graph at
    random injective node mappings (relabeling the mapped nodes and
    overwriting `pe` random edge slots per copy). At large label
    vocabularies a purely random graph contains ~zero matches — planting
    is how the reference data generator controls the count distribution
    (the published sets' counts are nonzero by construction).

    `p_num_vlabels`/`p_num_elabels` restrict the PATTERN's label vocab to
    a subset of the graph's (default: same vocab). The reference MUTAG
    envelope is exactly this shape — patterns draw from 2 vertex / 2 edge
    labels while graphs carry 7 / 4 (README.md:107-108: max_npvl 2,
    max_npel 2, max_ngvl 7, max_ngel 4).
    """
    if plant:
        if pv > gv:
            raise ValueError(
                f"plant needs pv <= gv (pattern {pv} nodes into a {gv}-node"
                " graph)")
        if plant * pe > ge:
            raise ValueError(
                f"plant={plant} needs plant*pe <= ge ({plant}*{pe} edge"
                f" slots > {ge} graph edges)")
    ps, pr, pvl, pel = random_multidigraph(
        rng, pv, pe, p_num_vlabels or num_vlabels,
        p_num_elabels or num_elabels)
    gs, gr, gvl, gel = random_multidigraph(rng, gv, ge, num_vlabels, num_elabels)
    for j in range(plant):
        m = rng.choice(gv, size=pv, replace=False)
        gvl[m] = pvl
        slots = slice(j * pe, (j + 1) * pe)
        gs[slots] = m[ps]
        gr[slots] = m[pr]
        gel[slots] = pel

    subiso = enumerate_subisomorphisms(ps, pr, pvl, pel, gs, gr, gvl, gel)
    counts = subiso.shape[0]
    node_w = node_subiso_weights(gv, subiso)
    edge_w = edge_subiso_weights(ps, pr, pel, gs, gr, gel, subiso)

    return {
        "id": pair_id,
        "pattern": single_graph(pv, ps, pr, pvl, pel,
                                v_max=p_v_max or pv, e_max=p_e_max or pe),
        "graph": single_graph(gv, gs, gr, gvl, gel,
                              v_max=g_v_max or gv, e_max=g_e_max or ge),
        "counts": counts,
        "subisomorphisms": subiso,
        "node_weights": node_w,
        "edge_weights": edge_w,
    }


def generate_large_graph(num_nodes: int, num_edges: int, num_rels: int = 4,
                         seed: int = 0, power_law: bool = True):
    """Synthetic large-graph triplets for the scale-out configs
    (SURVEY §7.2 item 6: the 100M-edge generator).

    power_law gives a heavy-tailed degree distribution (the hard case for
    segment-sum skew, SURVEY §7.3); returns (triplets [E, 3], num_nodes).
    Memory: 24 bytes/edge — 100M edges ≈ 2.4 GB host RAM.
    """
    rng = np.random.default_rng(seed)
    if power_law:
        # preferential-attachment-ish: sample endpoints from a zipf-weighted
        # permutation of node ids
        w = 1.0 / np.arange(1, num_nodes + 1) ** 0.8
        w /= w.sum()
        perm = rng.permutation(num_nodes)
        src = perm[rng.choice(num_nodes, size=num_edges, p=w)]
        dst = perm[rng.choice(num_nodes, size=num_edges, p=w)]
    else:
        src = rng.integers(0, num_nodes, num_edges)
        dst = rng.integers(0, num_nodes, num_edges)
    # no self loops
    clash = src == dst
    dst[clash] = (dst[clash] + 1) % num_nodes
    rel = rng.integers(0, num_rels, num_edges)
    return (np.stack([src, rel, dst], axis=1).astype(np.int64), num_nodes)


def generate_community_graph(num_nodes: int, num_edges: int,
                             num_communities: int = 8, p_intra: float = 0.95,
                             num_rels: int = 4, seed: int = 0):
    """Community-structured large graph: endpoints share a community with
    probability p_intra (the locality a METIS-style partitioner exploits;
    the halo-exchange crossover study, parallel/halo.py). Returns
    (triplets [E, 3], num_nodes)."""
    rng = np.random.default_rng(seed)
    per = -(-num_nodes // num_communities)
    comm = rng.integers(0, num_communities, num_edges)
    src = comm * per + rng.integers(0, per, num_edges)
    intra = rng.random(num_edges) < p_intra
    dst_comm = np.where(intra, comm,
                        rng.integers(0, num_communities, num_edges))
    dst = dst_comm * per + rng.integers(0, per, num_edges)
    src = np.minimum(src, num_nodes - 1)
    dst = np.minimum(dst, num_nodes - 1)
    clash = src == dst
    dst[clash] = (dst[clash] + 1) % num_nodes
    rel = rng.integers(0, num_rels, num_edges)
    return (np.stack([src, rel, dst], axis=1).astype(np.int64), num_nodes)


def generate_dataset(
    n_pairs: int,
    seed: int = 0,
    **kw,
) -> List[Dict]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_pairs):
        out.append(generate_pair(rng, pair_id=f"P{i}-G{i}", **kw))
    return out
