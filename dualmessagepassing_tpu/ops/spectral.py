"""Degree-based norms and largest-eigenvalue bounds.

Reference: /root/reference/SubgraphCountingMatching/utils/graph.py:11-71
(`compute_norm`, `compute_largest_eigenvalues`). These are host-or-device
computable; here both a numpy host variant (used by the data pipeline to
derive `init_neigenv`/`init_eeigenv` before weight init, train.py:1174-1186)
and a jnp device variant (for on-device norms) are provided.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def degrees_np(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
               mask: np.ndarray = None) -> Tuple[np.ndarray, np.ndarray]:
    """(out_deg, in_deg) of a host COO edge list."""
    if mask is not None:
        senders = senders[mask]
        receivers = receivers[mask]
    out_deg = np.bincount(senders, minlength=num_nodes).astype(np.float64)
    in_deg = np.bincount(receivers, minlength=num_nodes).astype(np.float64)
    return out_deg, in_deg


def largest_eigenvalue_bounds_np(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
    mask: np.ndarray = None,
) -> Tuple[float, float]:
    """Upper bounds on the largest eigenvalue of the primal/dual Laplacians.

    lambda_n = max over edges (u,v) of outdeg(u) + indeg(v)
    lambda_e = max over edges (u,v) of indeg(u) + outdeg(v)
    (utils/graph.py:40-71). Used to divide the DMPLayer weight matrices at
    init (dmpnn.py:79-86); the driver clamps to >= 4.0 (train.py:1174-1186).
    """
    if mask is not None:
        senders = senders[mask]
        receivers = receivers[mask]
    if len(senders) == 0:
        return 0.0, 0.0
    out_deg, in_deg = degrees_np(senders, receivers, num_nodes)
    max_nd = float((out_deg[senders] + in_deg[receivers]).max())
    max_ed = float((in_deg[senders] + out_deg[receivers]).max())
    return max_nd, max_ed


def compute_norm_np(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
    self_loop: bool, mask: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reciprocal-in-degree node norm + per-edge norm (gathered at dst).

    Matches compute_norm (utils/graph.py:11-37): with self_loop the norm is
    1/(indeg+1); otherwise 1/indeg with 0-degree mapped to 1.0.
    """
    _, in_deg = degrees_np(senders, receivers, num_nodes, mask)
    if self_loop:
        node_norm = 1.0 / (in_deg + 1.0)
    else:
        with np.errstate(divide="ignore"):
            node_norm = np.where(in_deg == 0, 1.0, 1.0 / np.maximum(in_deg, 1))
    node_norm = node_norm[:, None].astype(np.float32)
    edge_norm = node_norm[receivers]
    return node_norm, edge_norm


def edge_norm_device(in_degrees: jnp.ndarray, receivers: jnp.ndarray,
                     self_loop: bool) -> jnp.ndarray:
    """Device variant: [B, V] in-degrees + [B, E] receivers -> [B, E, 1]."""
    if self_loop:
        node_norm = 1.0 / (in_degrees + 1.0)
    else:
        node_norm = jnp.where(in_degrees == 0, 1.0, 1.0 / jnp.maximum(in_degrees, 1.0))
    return jnp.take_along_axis(node_norm, receivers, axis=1)[..., None]
