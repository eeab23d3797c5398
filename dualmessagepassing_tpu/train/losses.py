"""SCM training losses — exact reference semantics, padding-invariant form.

Reference: /root/reference/SubgraphCountingMatching/train.py:462-661.

  * bp_crit(pred, target, slope) = {MAE|MSE|SMSE}(leaky_relu(pred, slope),
    target); eval_crit uses relu instead (train.py:462-482).
  * match_v_loss = bp_crit(pred_v, node_weights) * len  — with padded
    entries zeroed on both sides this equals sum(elementwise)/bsz,
    independent of the padded length, which is the form used here (the
    reference's mean*len over its dynamic max-length batches reduces to the
    same number).
  * match_v_reg penalizes per-element weights exceeding the count:
    bp_crit(relu(pred_v - pred_c), 0, slope=0) * len (train.py:634,645).
  * rep_reg = sum over the four reps of bp_crit(rep, 0, slope=1) * size(1);
    for flat [N, H] reps that is sum/|N|; our padded [B, L, H] masked form
    divides by the true element count (train.py:649-657).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _elementwise(kind: str, pred: Array, target: Array) -> Array:
    if kind == "MAE":
        return jnp.abs(pred - target)
    if kind == "MSE":
        return (pred - target) ** 2
    if kind == "SMSE":  # smooth_l1, beta=1 (torch default)
        d = jnp.abs(pred - target)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    raise NotImplementedError(kind)


def bp_criterion(kind: str, pred: Array, target: Array, neg_slope) -> Array:
    """Mean loss on leaky-relu'd predictions (train.py:475-482)."""
    return jnp.mean(
        _elementwise(kind, jax.nn.leaky_relu(pred, neg_slope), target)
    )


def eval_criterion(kind: str, pred: Array, target: Array) -> Array:
    """Mean metric on relu'd predictions (train.py:462-467)."""
    return jnp.mean(_elementwise(kind, jax.nn.relu(pred), target))


def scm_loss(
    output: Dict[str, Array],
    counts: Array,                      # [B, 1]
    node_weights: Optional[Array],      # [B, V] or None
    edge_weights: Optional[Array],      # [B, E] or None
    *,
    bp_loss: str = "MSE",
    neg_slope: float = 0.0,
    match_loss_w: float = 0.0,
    match_reg_w: float = 0.0,
    rep_reg_w: float = 0.0,
    eval_metric: Optional[str] = None,
) -> Dict[str, Array]:
    """Full training objective (train.py:624-661). Scalar schedule values
    (neg_slope, *_w) are passed in as traced scalars so one compiled step
    serves every step of the schedule."""
    bsz = counts.shape[0]
    pred_c = output["pred_c"]
    count_loss = bp_criterion(bp_loss, pred_c, counts, neg_slope)

    zero = jnp.zeros((), jnp.float32)
    match_v_loss = match_v_reg = zero
    if node_weights is not None and output.get("pred_v") is not None:
        mask = output["g_v_mask"].astype(jnp.float32)
        w = node_weights * mask
        pv = output["pred_v"] * mask
        match_v_loss = (
            jnp.sum(_elementwise(bp_loss, jax.nn.leaky_relu(pv, neg_slope), w))
            / bsz
        )
        match_v_reg = (
            jnp.sum(_elementwise(bp_loss, jax.nn.relu(pv - pred_c) * mask,
                                 jnp.zeros_like(pv)))
            / bsz
        )

    match_e_loss = match_e_reg = zero
    if edge_weights is not None and output.get("pred_e") is not None:
        mask = output["g_e_mask"].astype(jnp.float32)
        w = edge_weights * mask
        pe = output["pred_e"] * mask
        match_e_loss = (
            jnp.sum(_elementwise(bp_loss, jax.nn.leaky_relu(pe, neg_slope), w))
            / bsz
        )
        match_e_reg = (
            jnp.sum(_elementwise(bp_loss, jax.nn.relu(pe - pred_c) * mask,
                                 jnp.zeros_like(pe)))
            / bsz
        )

    rep_reg = zero
    for rep_key, mask_key in (
        ("p_v_rep", "p_v_mask"), ("p_e_rep", "p_e_mask"),
        ("g_v_rep", "g_v_mask"), ("g_e_rep", "g_e_mask"),
    ):
        rep = output.get(rep_key)
        if rep is None:
            continue
        m = output[mask_key].astype(jnp.float32)[..., None]
        # slope=1 leaky_relu is identity (train.py:651)
        n = jnp.maximum(jnp.sum(m), 1.0)
        rep_reg = rep_reg + jnp.sum(
            _elementwise(bp_loss, rep * m, jnp.zeros_like(rep))
        ) / n

    total = (
        count_loss
        + rep_reg_w * rep_reg
        + match_loss_w * (match_v_loss + match_e_loss)
        + match_reg_w * (match_v_reg + match_e_reg)
    )
    out = {
        "total": total,
        "count_loss": count_loss,
        "match_v_loss": match_v_loss,
        "match_e_loss": match_e_loss,
        "match_v_reg": match_v_reg,
        "match_e_reg": match_e_reg,
        "rep_reg": rep_reg,
    }
    if eval_metric and eval_metric != "AUC":
        # per-step eval metric logged by the reference (train.py:689-691);
        # AUC is batch-global/sklearn-side and stays epoch-level
        out["eval_metric"] = eval_criterion(eval_metric, pred_c, counts)
    return out
