"""Label filters: gate graph elements whose label never appears in the pattern.

Reference: /root/reference/SubgraphCountingMatching/models/filter.py:6-16
(`ScalarFilter`).  Our variant takes explicit pattern masks so that padded
pattern slots (label 0 under padding) cannot spuriously enable label-0 graph
elements — the reference's pre-padded formulation admits that corner case;
with masks the gate is exact and identical on unpadded batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def scalar_filter(p_x: jnp.ndarray, g_x: jnp.ndarray,
                  p_mask: jnp.ndarray = None) -> jnp.ndarray:
    """gate[b, j] = any_i (g_x[b, j] == p_x[b, i] and p_mask[b, i]).

    p_x: [B, Lp] int; g_x: [B, Lg] int; p_mask: [B, Lp] bool -> [B, Lg] bool.
    """
    eq = g_x[:, :, None] == p_x[:, None, :]  # [B, Lg, Lp]
    if p_mask is not None:
        eq = jnp.logical_and(eq, p_mask[:, None, :])
    return jnp.max(eq, axis=2)
