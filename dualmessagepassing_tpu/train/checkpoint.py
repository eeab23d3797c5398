"""Checkpointing (orbax) + model expansion to larger vocabularies.

Reference behavior: the SCM driver saves `state_dict` per best epoch
(train.py:1334-1340) WITHOUT optimizer state; `model.expand` grows a trained
model to a larger vocab by zero-initializing new weights and copying the old
values into the *tail* slices (basemodel.py:167-219 + expand_dimensions,
utils/dl.py:157-191) — the multihot encoding grows at the front (new
most-significant digit blocks), so old rows live at the tail.

Our build improves on the reference: full TrainState (params + batch stats +
optimizer state + step) is checkpointed via orbax, enabling true resume; the
reference's params-only style remains available via save_params.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .scm_driver import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: TrainState):
    _checkpointer().save(os.path.abspath(path), {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }, force=True)


def restore_state(path: str, like: Optional[TrainState] = None) -> TrainState:
    target = None
    if like is not None:
        target = {
            "params": like.params,
            "batch_stats": like.batch_stats,
            "opt_state": like.opt_state,
            "step": like.step,
        }
    d = _checkpointer().restore(os.path.abspath(path), item=target)
    return TrainState(d["params"], d["batch_stats"], d["opt_state"],
                      jnp.asarray(d["step"]))


def save_params(path: str, variables: Dict[str, Any]):
    """Params-only checkpoint (reference epoch{E}.pt analog)."""
    _checkpointer().save(os.path.abspath(path), variables, force=True)


def restore_params(path: str, like: Optional[Dict[str, Any]] = None):
    return _checkpointer().restore(os.path.abspath(path), item=like)


# =============================================================================
# expansion
# =============================================================================

def expand_params(old_tree, new_tree, pre_pad: bool = True):
    """Copy old leaves into the (tail if pre_pad) slices of new leaves.

    New leaves keep their fresh values where no old value exists; where a
    matching leaf exists the new leaf is zeroed and the old values are
    copied in (expand_dimensions semantics, utils/dl.py:157-191).
    Leaves are matched by tree path; mismatched ranks raise.
    """
    old_flat = _flatten_with_paths(old_tree)
    new_flat = _flatten_with_paths(new_tree)
    out = {}
    for path, new_leaf in new_flat.items():
        old_leaf = old_flat.get(path)
        if old_leaf is None:
            out[path] = new_leaf
            continue
        old_leaf = jnp.asarray(old_leaf)
        new_leaf = jnp.asarray(new_leaf)
        if old_leaf.shape == new_leaf.shape:
            out[path] = old_leaf
            continue
        if old_leaf.ndim != new_leaf.ndim:
            raise ValueError(f"rank mismatch at {path}")
        base = jnp.zeros_like(new_leaf)
        idx = tuple(
            slice(n - o, None) if pre_pad else slice(0, o)
            for o, n in zip(old_leaf.shape, new_leaf.shape)
        )
        out[path] = base.at[idx].set(old_leaf)
    return _unflatten_with_paths(out, new_tree)


def _flatten_with_paths(tree):
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (k,), v)
        else:
            flat[prefix] = node

    rec((), tree)
    return flat


def _unflatten_with_paths(flat, like):
    def rec(prefix, node):
        if isinstance(node, dict):
            return {k: rec(prefix + (k,), v) for k, v in node.items()}
        return flat[prefix]

    return rec((), like)
