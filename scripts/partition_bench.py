"""Halo-partitioner quality: boundary rows exported per method.

Host-side only (the boundary size determines the per-layer all_to_all
payload [n, B, H] — parallel/halo_unc.py). Two graph families:
  * community: ring of dense cliques with sparse bridges (the case
    locality-aware partitioning exists for);
  * powerlaw:  preferential-attachment wiring (hubs touch everything —
    no partitioner can help much; sanity lower bound).

Prints a JSON line per (family, method): total boundary rows (the sum of
send_mask over shards = rows actually exchanged per layer) and the max
per-shard boundary (sizes the static B envelope). Wall time per build is
reported so the host cost of 'bfs' bulk claiming is visible.

Usage: python scripts/partition_bench.py [n_nodes] [n_shards]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def community_graph(n, clique, rng):
    srcs, dsts = [], []
    n_cliq = n // clique
    for c in range(n_cliq):
        base = c * clique
        members = np.arange(base, base + clique)
        for i in members:
            nbrs = rng.choice(members[members != i],
                              size=min(6, clique - 1), replace=False)
            srcs.extend([i] * len(nbrs))
            dsts.extend(nbrs)
        srcs.append(base)
        dsts.append(((c + 1) % n_cliq) * clique)
    return np.asarray(srcs), np.asarray(dsts)


def powerlaw_graph(n, m, rng):
    from dualmessagepassing_tpu.data.synthetic import generate_large_graph

    triplets, _ = generate_large_graph(n, n * m, seed=1, power_law=True)
    return (np.asarray(triplets[:, 0], np.int64),
            np.asarray(triplets[:, 2], np.int64))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)

    from dualmessagepassing_tpu.parallel.halo_unc import (
        _assign_owners_capped, halo_envelope)

    for family, (senders, receivers) in (
        ("community", community_graph(n, 32, rng)),
        ("powerlaw", powerlaw_graph(n, 8, rng)),
    ):
        e = len(senders)
        mask = np.ones(e, bool)
        vp, _, _ = halo_envelope(n, e, n_shards)
        for method in ("range", "degree", "bfs"):
            t0 = time.perf_counter()
            owner = _assign_owners_capped(senders, receivers, mask, n,
                                          n_shards, vp, method)
            dt = time.perf_counter() - t0
            # boundary rows: unique senders each shard must import from
            # other owners (the all_to_all payload per layer)
            total_b = 0
            max_b = 0
            e_owner = owner[receivers]
            for s in range(n_shards):
                snd = senders[e_owner == s]
                foreign = snd[owner[snd] != s]
                per_owner = {}
                for o in np.unique(owner[foreign]):
                    per_owner[o] = len(np.unique(
                        foreign[owner[foreign] == o]))
                total_b += sum(per_owner.values())
                if per_owner:
                    max_b = max(max_b, max(per_owner.values()))
            print(json.dumps({
                "family": family, "method": method, "v": n, "e": e,
                "boundary_rows_total": int(total_b),
                "boundary_rows_max": int(max_b),
                "build_s": round(dt, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
