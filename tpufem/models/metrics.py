"""Masked loss and Pa-scale metrics — parity with reference gnn/model.py:115-216.

MaskedMSELoss: MSE over loss_mask-selected nodes, zero if all masked
(model.py:126-153). Metrics are computed in the original Pa scale via expm1
(inverse of the log1p target transform) and always reported for all_nodes AND
masked_nodes (model.py:156-216): MAE, RMSE, MaxErr, plus relative MAE vs the
true max stress (the README's ~3.3% headline).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def masked_mse(pred, target, mask):
    """Mean squared error over masked nodes; 0 if the mask is empty."""
    w = mask
    num = jnp.sum(w * (pred - target) ** 2)
    den = jnp.sum(w)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def _subset_metrics(pred_pa: np.ndarray, true_pa: np.ndarray) -> dict:
    err = np.abs(pred_pa - true_pa)
    if len(err) == 0:
        return {"mae_pa": 0.0, "rmse_pa": 0.0, "max_err_pa": 0.0, "rel_mae": 0.0}
    mae = float(err.mean())
    return {
        "mae_pa": mae,
        "rmse_pa": float(np.sqrt((err**2).mean())),
        "max_err_pa": float(err.max()),
        "rel_mae": float(mae / max(float(true_pa.max()), 1e-12)),
    }


def compute_metrics(pred_log, true_stress_pa, loss_mask, node_mask=None) -> dict:
    """Pa-scale metrics for all real nodes and for masked nodes.

    pred_log: (N,) log1p-space prediction; true_stress_pa: (N,) raw Pa.
    """
    pred_pa = np.expm1(np.asarray(pred_log, dtype=np.float64))
    true_pa = np.asarray(true_stress_pa, dtype=np.float64)
    real = (
        np.asarray(node_mask) > 0
        if node_mask is not None
        else np.ones(len(true_pa), dtype=bool)
    )
    masked = real & (np.asarray(loss_mask) > 0)
    return {
        "all_nodes": _subset_metrics(pred_pa[real], true_pa[real]),
        "masked_nodes": _subset_metrics(pred_pa[masked], true_pa[masked]),
    }
