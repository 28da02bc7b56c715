"""Depth evaluation metrics — the numeric-accuracy oracle.

Parity with the reference's metric definitions
(dzoedepth/utils/misc.py:159-249): a1/a2/a3 (delta < 1.25^n), abs_rel,
sq_rel, rmse, rmse_log, log_10, silog, with garg/eigen evaluation crops.
Implemented as one jit-able JAX function so large eval sweeps run on TPU.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_errors(gt: jnp.ndarray, pred: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """gt, pred: same-shape arrays of positive depths (pre-masked)."""
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean(thresh < 1.25)
    a2 = jnp.mean(thresh < 1.25 ** 2)
    a3 = jnp.mean(thresh < 1.25 ** 3)

    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean(((gt - pred) ** 2) / gt)

    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))

    err_log = jnp.log(pred) - jnp.log(gt)
    silog = jnp.sqrt(jnp.mean(err_log ** 2) - jnp.mean(err_log) ** 2) * 100
    log_10 = jnp.mean(jnp.abs(jnp.log10(gt) - jnp.log10(pred)))
    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, sq_rel=sq_rel,
                rmse=rmse, rmse_log=rmse_log, silog=silog, log_10=log_10)


def eval_crop_mask(shape, crop: Optional[str] = None) -> np.ndarray:
    """Evaluation masks: 'garg' or 'eigen' crops (reference misc.py:221-242)."""
    h, w = shape
    mask = np.ones((h, w), bool)
    if crop == "garg":
        mask[:] = False
        mask[int(0.40810811 * h):int(0.99189189 * h),
             int(0.03594771 * w):int(0.96405229 * w)] = True
    elif crop == "eigen":
        mask[:] = False
        mask[int(0.3324324 * h):int(0.91351351 * h),
             int(0.03594771 * w):int(0.96405229 * w)] = True
    return mask


def compute_metrics(gt: np.ndarray, pred: np.ndarray,
                    min_depth_eval: float = 1e-3,
                    max_depth_eval: float = 10.0,
                    crop: Optional[str] = None) -> Dict[str, float]:
    """Full evaluation path: clamp prediction, validity + crop masks,
    then compute_errors (reference compute_metrics misc.py:202-249)."""
    gt = np.asarray(gt, np.float32)
    pred = np.asarray(pred, np.float32)
    pred = np.clip(pred, min_depth_eval, max_depth_eval)
    pred[np.isnan(pred)] = min_depth_eval
    pred[np.isinf(pred)] = max_depth_eval

    valid = (gt > min_depth_eval) & (gt < max_depth_eval)
    valid &= eval_crop_mask(gt.shape[-2:], crop)
    if not valid.any():
        return {}
    out = compute_errors(jnp.asarray(gt[valid]), jnp.asarray(pred[valid]))
    return {k: float(v) for k, v in out.items()}
