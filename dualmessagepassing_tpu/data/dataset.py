"""SCM dataset container + collate (GraphAdjDataset equivalent).

Reference: /root/reference/SubgraphCountingMatching/dataset.py:1376-1636.
Records are host numpy dicts (graph.py single_graph records); batchify
produces device GraphBatch pairs + count/weight targets. Weight derivation
from stored subisomorphism lists happens lazily and is cached on the record
(dataset.py:1620-1634).

Dataset-level transforms mirror the in-driver mutations of the reference
train.py: remove_loops (252-270), add_reversed_edges (273-327),
calculate_degrees/eigenvalues (330-380).
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import graph as G
from ..ops.spectral import largest_eigenvalue_bounds_np
from .subiso import edge_subiso_weights, node_subiso_weights


class GraphAdjDataset:
    def __init__(self, data: Optional[List[Dict]] = None):
        self.data: List[Dict] = data or []

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]

    # ---- persistence (dataset.py:1396-1420, .pt pickles -> plain pickle) ----
    def save(self, filename: str):
        with open(filename, "wb") as f:
            pickle.dump(self.data, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load(self, filename: str) -> "GraphAdjDataset":
        with open(filename, "rb") as f:
            self.data = pickle.load(f)
        return self

    # ---- transforms ---------------------------------------------------------
    def remove_loops(self):
        """Drop self-loop edges from every pattern/graph (the reference's
        'withoutloop' dataset variant, train.py:252-270). Re-packs edges so
        real entries stay contiguous; subiso-derived weights are reset (they
        are recomputed lazily from the stored subisomorphisms)."""
        for x in self.data:
            for key in ("pattern", "graph"):
                rec = x[key]
                em = rec["edge_mask"].astype(bool)
                keep = em & (rec["senders"] != rec["receivers"])
                if keep.sum() == em.sum():
                    continue
                order = np.argsort(~keep, kind="stable")
                for k in ("senders", "receivers", "edge_label", "rev_flag"):
                    rec[k] = rec[k][order]
                n_keep = int(keep.sum())
                rec["edge_mask"] = np.arange(len(em)) < n_keep
                rec["n_edge"] = np.int32(n_keep)
            x["edge_weights"] = None
            # remove_loops mutates the record dicts IN PLACE, so the
            # identity-keyed edgeseq cache must be dropped explicitly
            x.pop("_edgeseq_pattern", None)
            x.pop("_edgeseq_graph", None)
        self.invalidate_collate_cache()
        return self

    def add_reversed_edges(self, num_p_elabels: int, num_g_elabels: int):
        """train.py:273-327: reversed edges on both pattern and graph; edge
        weights of the reversed half are never used (masked by rev_flag in
        the loss), stored as a copy like the reference's .repeat(2)."""
        for x in self.data:
            x["pattern"] = G.add_reversed_edges(x["pattern"], num_p_elabels)
            x["graph"] = G.add_reversed_edges(x["graph"], num_g_elabels)
            if "edge_weights" in x and x["edge_weights"] is not None:
                x["edge_weights"] = np.concatenate(
                    [x["edge_weights"], x["edge_weights"]]
                )
        self.invalidate_collate_cache()
        return self

    def compute_eigenvalue_bounds(self) -> Tuple[float, float]:
        """max over graphs of the spectral bounds, clamped >= 4.0
        (train.py:1174-1186)."""
        max_n, max_e = 4.0, 4.0
        for x in self.data:
            for key in ("pattern", "graph"):
                rec = x[key]
                em = rec["edge_mask"].astype(bool)
                ne, ee = largest_eigenvalue_bounds_np(
                    rec["senders"], rec["receivers"], int(rec["n_node"]), em
                )
                max_n, max_e = max(max_n, ne), max(max_e, ee)
        return max_n, max_e

    def sizes(self) -> List[Dict[str, int]]:
        """Per-record size metadata for the bucket/curriculum samplers
        (sampler group_by keys g_len / p_len)."""
        return [
            {
                "g_len": int(x["graph"]["n_edge"]),
                "p_len": int(x["pattern"]["n_edge"]),
            }
            for x in self.data
        ]

    # ---- collate ------------------------------------------------------------
    _GRAPH_FIELDS = ("senders", "receivers", "node_id", "node_label",
                     "edge_label", "node_mask", "edge_mask", "rev_flag",
                     "n_node", "n_edge")

    def invalidate_collate_cache(self):
        """Drop the dense collate cache (in-place transforms call this)."""
        self._dense = {}

    def _dense_records(self, which: str):
        """Dataset-level pre-stacked arrays [N, ...] per field, built once.

        Returns None (caller falls back to per-batch stacking) when the
        cache would exceed DMP_COLLATE_CACHE_BYTES (default 16e9) — the
        cache trades memory for collate speed (~56 ms -> ~2 ms per
        flagship batch: np.stack over 2048 Python elements was the cost,
        a fancy-index gather off [N, ...] is one C memcpy per field)."""
        import os as _os

        cache = getattr(self, "_dense", None)
        if cache is None:
            cache = self._dense = {}
        if which not in cache:
            recs = [x[which] for x in self.data]
            est = sum(getattr(v, "nbytes", 8)
                      for v in recs[0].values()) * len(recs)
            limit = float(_os.environ.get("DMP_COLLATE_CACHE_BYTES", 16e9))
            if est > limit:
                cache[which] = None
            else:
                cache[which] = {k: np.stack([r[k] for r in recs])
                                for k in self._GRAPH_FIELDS}
        return cache[which]

    def _dense_weights(self, kind: str):
        cache = getattr(self, "_dense", None)
        if cache is None:
            cache = self._dense = {}
        key = f"w_{kind}"
        if key not in cache:
            if kind == "node":
                n = self.data[0]["graph"]["node_mask"].shape[0]
                fn = self._node_weights
            else:
                n = self.data[0]["graph"]["edge_mask"].shape[0]
                fn = self._edge_weights
            cache[key] = np.stack(
                [_padded(fn(x), n) for x in self.data])
        return cache[key]

    def batchify(self, indices: Sequence[int], return_weights: str = "none",
                 auto_envelope: bool = False):
        """-> (ids, pattern GraphBatch, graph GraphBatch, counts [B,1] f32,
        (node_weights [B,V] f32 | None, edge_weights [B,E] f32 | None)).

        auto_envelope shrinks each batch's padded envelope to the smallest
        power-of-two ladder step covering the batch maxima — with the
        bucket samplers grouping similar sizes this cuts padding waste to
        a handful of compiled shapes (SURVEY §7.1 bucketing design).
        """
        batch = [self.data[i] for i in indices]
        ids = [x["id"] for x in batch]
        counts = np.asarray([x["counts"] for x in batch], np.float32)[:, None]
        node_w = edge_w = None
        dense_p = None if auto_envelope else self._dense_records("pattern")
        if dense_p is not None:
            take = np.asarray(indices, np.int64)
            pattern = G.batch_graphs_dense(dense_p, take)
            graph = G.batch_graphs_dense(self._dense_records("graph"), take)
            if "node" in return_weights:
                node_w = self._dense_weights("node")[take]
            if "edge" in return_weights:
                edge_w = self._dense_weights("edge")[take]
            import jax.numpy as jnp
            counts = jnp.asarray(counts)
            node_w = jnp.asarray(node_w) if node_w is not None else None
            edge_w = jnp.asarray(edge_w) if edge_w is not None else None
            return ids, pattern, graph, counts, (node_w, edge_w)

        p_recs = [x["pattern"] for x in batch]
        g_recs = [x["graph"] for x in batch]
        if auto_envelope:
            p_recs = [_sliced(r, *_ladder_envelope(p_recs)) for r in p_recs]
            g_recs = [_sliced(r, *_ladder_envelope(g_recs)) for r in g_recs]
        pattern = G.batch_graphs(p_recs)
        graph = G.batch_graphs(g_recs)

        if "node" in return_weights:
            node_w = np.stack([
                _padded(self._node_weights(x), rec["node_mask"].shape[0])
                for x, rec in zip(batch, g_recs)
            ])
        if "edge" in return_weights:
            edge_w = np.stack([
                _padded(self._edge_weights(x), rec["edge_mask"].shape[0])
                for x, rec in zip(batch, g_recs)
            ])
        import jax.numpy as jnp
        counts = jnp.asarray(counts)
        node_w = jnp.asarray(node_w) if node_w is not None else None
        edge_w = jnp.asarray(edge_w) if edge_w is not None else None
        return ids, pattern, graph, counts, (node_w, edge_w)

    def batchify_edgeseq(self, indices: Sequence[int],
                         return_weights: str = "none"):
        """EdgeSeq collate (EdgeSeqDataset.batchify, dataset.py:995-1050):
        tuples sorted lexicographically; edge weights follow the sort."""
        batch = [self.data[i] for i in indices]
        ids = [x["id"] for x in batch]

        def seq(x, which):
            # lexicographic sort cached per record (invalidated with the
            # record itself by the in-place transforms, which replace the
            # record dicts these keys live on)
            key = f"_edgeseq_{which}"
            cached = x.get(key)
            if cached is None or cached[0] is not x[which]:
                cached = (x[which], G.record_to_edgeseq(x[which]))
                x[key] = cached
            return cached[1]

        p_seqs = [seq(x, "pattern") for x in batch]
        g_seqs = [seq(x, "graph") for x in batch]
        pattern = G.batch_edgeseqs(p_seqs)
        graph = G.batch_edgeseqs(g_seqs)
        counts = np.asarray([x["counts"] for x in batch], np.float32)[:, None]

        edge_w = None
        if "edge" in return_weights:
            rows = []
            for x, seq in zip(batch, g_seqs):
                w = self._edge_weights(x)
                e_max = x["graph"]["edge_mask"].shape[0]
                padded = np.zeros((e_max,), np.float32)
                w_sorted = np.asarray(w, np.float32)[
                    seq["order"][seq["order"] < len(w)]
                ] if len(w) else np.zeros(0, np.float32)
                padded[: len(w_sorted)] = w_sorted
                rows.append(padded)
            edge_w = np.stack(rows)
        import jax.numpy as jnp
        counts = jnp.asarray(counts)
        edge_w = jnp.asarray(edge_w) if edge_w is not None else None
        return ids, pattern, graph, counts, (None, edge_w)

    def batchify_lrp(self, indices: Sequence[int],
                     return_weights: str = "none", seq_len: int = 4):
        """LRP collate (LRPDataset.batchify, dataset.py:1862-1905): graph
        batch + fixed-size perm index tensors (cached per record)."""
        from ..models.lrp import LRPGraphBatch
        from .lrp import count_perms, record_to_lrp_perms
        import jax.numpy as jnp

        batch = [self.data[i] for i in indices]
        ids, pattern, graph, counts, weights = self.batchify(
            indices, return_weights)

        def perm_arrays(which):
            key = f"_lrp_{which}"
            p_max = max(
                count_perms(x[which], seq_len) for x in batch) or 1
            rows = []
            for x in batch:
                cached = x.get(key)
                if cached is None or cached["perm_node"].shape[0] < p_max:
                    cached = record_to_lrp_perms(x[which], seq_len, p_max)
                    x[key] = cached
                rows.append(cached)
            return {
                k: jnp.asarray(np.stack([
                    r[k][:p_max] if r[k].ndim else r[k] for r in rows]))
                for k in ("perm_node", "perm_node_mask", "perm_edge",
                          "perm_edge_mask", "perm_owner", "perm_mask")
            }

        def lift(gb, perms):
            return LRPGraphBatch(
                senders=gb.senders, receivers=gb.receivers,
                node_id=gb.node_id, node_label=gb.node_label,
                edge_label=gb.edge_label, node_mask=gb.node_mask,
                edge_mask=gb.edge_mask, rev_flag=gb.rev_flag,
                n_node=gb.n_node, n_edge=gb.n_edge, **perms)

        pattern = lift(pattern, perm_arrays("pattern"))
        graph = lift(graph, perm_arrays("graph"))
        return ids, pattern, graph, counts, weights

    def _node_weights(self, x) -> np.ndarray:
        if x.get("node_weights") is None:
            x["node_weights"] = node_subiso_weights(
                int(x["graph"]["n_node"]), x["subisomorphisms"]
            )
        return x["node_weights"]

    def _edge_weights(self, x) -> np.ndarray:
        if x.get("edge_weights") is None:
            rec = x["graph"]
            prec = x["pattern"]
            em = rec["edge_mask"].astype(bool)
            pm = prec["edge_mask"].astype(bool) & ~prec["rev_flag"]
            w = edge_subiso_weights(
                prec["senders"][pm], prec["receivers"][pm], prec["edge_label"][pm],
                rec["senders"][em], rec["receivers"][em], rec["edge_label"][em],
                x["subisomorphisms"],
            )
            x["edge_weights"] = w
        return x["edge_weights"]


def _padded(w: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,), np.float32)
    w = w[:n]
    out[: len(w)] = w
    return out


def _next_pow2(x: int, floor: int = 4) -> int:
    n = floor
    while n < x:
        n *= 2
    return n


def _ladder_envelope(recs) -> tuple:
    v = max(int(r["n_node"]) for r in recs)
    e = max(int(r["n_edge"]) for r in recs)
    cap_v = recs[0]["node_mask"].shape[0]
    cap_e = recs[0]["edge_mask"].shape[0]
    return min(_next_pow2(v), cap_v), min(_next_pow2(e), cap_e)


def _sliced(rec, v_env: int, e_env: int):
    """View of a post-padded record at a smaller envelope (prefix slices)."""
    return {
        "senders": rec["senders"][:e_env],
        "receivers": rec["receivers"][:e_env],
        "node_id": rec["node_id"][:v_env],
        "node_label": rec["node_label"][:v_env],
        "edge_label": rec["edge_label"][:e_env],
        "node_mask": rec["node_mask"][:v_env],
        "edge_mask": rec["edge_mask"][:e_env],
        "rev_flag": rec["rev_flag"][:e_env],
        "n_node": rec["n_node"],
        "n_edge": rec["n_edge"],
    }


class CollateView:
    """A dataset view whose `batchify` routes to the collate a model family
    needs: 'graph' (GNNs), 'edgeseq' (CNN/RNN/TXL), 'lrp' (LRP/DMPLRP).
    Lets the epoch drivers stay collate-agnostic."""

    def __init__(self, dataset: GraphAdjDataset, kind: str = "graph",
                 lrp_seq_len: int = 4, auto_envelope: bool = False):
        self.dataset = dataset
        self.kind = kind
        self.lrp_seq_len = lrp_seq_len
        self.auto_envelope = auto_envelope

    def __len__(self):
        return len(self.dataset)

    def sizes(self):
        return self.dataset.sizes()

    def batchify(self, indices, return_weights="none"):
        if self.kind == "graph":
            return self.dataset.batchify(indices, return_weights,
                                         auto_envelope=self.auto_envelope)
        if self.kind == "edgeseq":
            return self.dataset.batchify_edgeseq(indices, return_weights)
        if self.kind == "lrp":
            return self.dataset.batchify_lrp(indices, return_weights,
                                             self.lrp_seq_len)
        raise ValueError(self.kind)


def collate_kind_for(rep_net: str) -> str:
    if rep_net in ("CNN", "RNN", "TXL"):
        return "edgeseq"
    if rep_net in ("LRP", "DMPLRP"):
        return "lrp"
    return "graph"
