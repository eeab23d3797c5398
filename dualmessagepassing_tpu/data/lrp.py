"""Host-side local-relational-pooling (LRP) egonet enumeration.

Reference: /root/reference/SubgraphCountingMatching/dataset.py:1639-1905
(LRPDataset). For every node, all permutations of up to (seq_len-1)
out-neighbors form "perms" (ego first); each perm induces
  * node placements on the diagonal of an S x S grid, and
  * edge placements at (pos(u), pos(v)) for ordered pairs with an edge
    (duplicate (u, v) edges collapse to the last edge id, matching the
    reference's eid_map dict overwrite, dataset.py:1792).
Reversed-edge-augmented edges are excluded (dataset.py:1784-1786).

Instead of the reference's giant block-diagonal torch.sparse matrices we emit
fixed-size index tensors per record, padded to a perm envelope P:
  perm_node  [P, S] int32  + mask   (node ids per slot; diagonal placement)
  perm_edge  [P, S, S] int32 + mask (edge ids per grid cell)
  perm_owner [P] int32              (ego node for mean pooling)
  perm_mask  [P] bool
The device layer turns these into gathers + dense einsums (models/lrp.py).
"""

from __future__ import annotations

from itertools import permutations
from typing import Dict, Optional

import numpy as np


def record_to_lrp_perms(rec: Dict[str, np.ndarray], seq_len: int = 4,
                        p_max: Optional[int] = None) -> Dict[str, np.ndarray]:
    em = rec["edge_mask"].astype(bool) & ~rec["rev_flag"].astype(bool)
    src = rec["senders"][em]
    dst = rec["receivers"][em]
    eid = np.nonzero(em)[0]
    n_nodes = int(rec["n_node"])
    v_max = rec["node_mask"].shape[0]

    adj = [[] for _ in range(v_max)]
    for s, d in zip(src, dst):
        adj[int(s)].append(int(d))
    eid_map = {}
    for s, d, e in zip(src, dst, eid):
        eid_map[(int(s), int(d))] = int(e)  # last one wins (reference parity)

    perm_node, perm_edge_rows = [], []
    perm_owner = []
    nei = seq_len - 1
    for i in range(n_nodes):
        neighbors = adj[i]
        for p in permutations(neighbors, min(nei, len(neighbors))):
            perm = (i,) + p
            perm_node.append(perm)
            perm_owner.append(i)
            cells = []
            pos = {node: k for k, node in enumerate(perm)}
            for u in perm:
                for v in perm:
                    e = eid_map.get((u, v))
                    if e is not None:
                        cells.append((pos[u], pos[v], e))
            perm_edge_rows.append(cells)

    n_perm = len(perm_node)
    if p_max is None:
        p_max = n_perm
    if n_perm > p_max:
        raise ValueError(f"{n_perm} perms exceed envelope {p_max}")

    pn = np.zeros((p_max, seq_len), np.int32)
    pn_mask = np.zeros((p_max, seq_len), bool)
    pe = np.zeros((p_max, seq_len, seq_len), np.int32)
    pe_mask = np.zeros((p_max, seq_len, seq_len), bool)
    owner = np.zeros((p_max,), np.int32)
    pmask = np.zeros((p_max,), bool)
    for k, perm in enumerate(perm_node):
        pn[k, : len(perm)] = perm
        pn_mask[k, : len(perm)] = True
        owner[k] = perm_owner[k]
        pmask[k] = True
        for (a, b, e) in perm_edge_rows[k]:
            pe[k, a, b] = e
            pe_mask[k, a, b] = True
    return {
        "perm_node": pn, "perm_node_mask": pn_mask,
        "perm_edge": pe, "perm_edge_mask": pe_mask,
        "perm_owner": owner, "perm_mask": pmask,
        "n_perm": np.int32(n_perm),
    }


def count_perms(rec: Dict[str, np.ndarray], seq_len: int = 4) -> int:
    """Perm count without enumeration (for envelope sizing)."""
    em = rec["edge_mask"].astype(bool) & ~rec["rev_flag"].astype(bool)
    deg = np.bincount(rec["senders"][em], minlength=int(rec["n_node"]))
    nei = seq_len - 1
    total = 0
    for d in deg[: int(rec["n_node"])]:
        k = min(nei, int(d))
        c = 1
        for t in range(k):
            c *= int(d) - t
        total += c
    return total
