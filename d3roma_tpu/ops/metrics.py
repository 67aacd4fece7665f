"""Disparity / depth quality metrics with fixed-shape masked reductions.

Semantics follow the reference's `compute_errors`
(reference: utils_d3roma/utils.py:554-661): per-sample disparity EPE and
D1/D2/D3/D5 threshold rates scaled by width/480, plus depth delta-accuracy at
1.05/1.10/1.25, RMSE, AbsRel and MAE. The reference's boolean fancy indexing
(data-dependent shapes) becomes masked means so the whole thing jits and
shards cleanly across a data mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

DISP_KEYS = ("epe", "d1", "d2", "d3", "d5")
DEPTH_KEYS = ("a1", "a2", "a3", "rmse", "rel", "mae")


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return jnp.sum(x * mask, axis=axis) / denom


def _masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis) -> jnp.ndarray:
    return jnp.min(jnp.where(mask > 0, x, jnp.inf), axis=axis)


def compute_errors(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    space: str = "disp",
    masks: Optional[jnp.ndarray] = None,
    fxb: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """gt/pred: [B, H, W] in `space` ("disp" or "depth"); masks: [B, H, W]
    booleans; fxb: [B] focal*baseline for disp<->depth conversion.

    Returns (metrics_disp [B,5], metrics_depth [B,6]) matching the reference
    column order: [epe, d1, d2, d3, d5] and [a1, a2, a3, rmse, rel, mae].
    """
    assert gt.ndim == 3 and pred.ndim == 3, "expected B,H,W"
    B, H, W = gt.shape
    if masks is None:
        masks = ~(jnp.isnan(gt) | jnp.isinf(gt) | (gt == 0))
    m = masks.reshape(B, -1).astype(jnp.float32)
    gt = gt.reshape(B, -1)
    pred = jnp.where(masks, pred, 0.0).reshape(B, -1)

    if space == "depth":
        # clip non-positive predicted depth (reference: utils.py:583-586)
        pred_depth = jnp.clip(pred, 1e-3, None)
        gt_depth = jnp.where(m > 0, gt, 1.0)
        # disparity metrics need a focal-baseline; pseudo fxb=1 (1/depth
        # disparities) keeps depth-space metrics meaningful when a
        # dataset carries no fxb, matching the disp branch's None path
        fxb_d = jnp.ones((B,)) if fxb is None else fxb
        gt_disp = fxb_d[:, None] / gt_depth
        pred_disp = fxb_d[:, None] / pred_depth
    elif space == "disp":
        # when any masked prediction is non-positive, clip the whole sample's
        # predictions up to the masked gt minimum (reference: utils.py:596-601)
        min_disp = _masked_min(gt, m, axis=1)[:, None]
        has_bad = (_masked_min(pred, m, axis=1) <= 0)[:, None]
        pred_disp = jnp.where(has_bad, jnp.maximum(pred, min_disp), pred)
        gt_disp = jnp.where(m > 0, gt, 1.0)
        if fxb is not None:
            gt_depth = fxb[:, None] / gt_disp
            pred_depth = fxb[:, None] / jnp.maximum(pred_disp, 1e-8)
        else:
            gt_depth = 1.0 / gt_disp
            pred_depth = 1.0 / jnp.maximum(pred_disp, 1e-8)
    else:
        raise NotImplementedError(space)

    # disparity metrics
    epe_err = jnp.abs(gt_disp - pred_disp)
    epe = _masked_mean(epe_err, m, axis=1)
    # D-threshold scale: DELIBERATE divergence from the reference. The
    # reference computes scale = masked_pixel_count/480 (utils.py:626-630,
    # its own FIXME admits the bug); the intended semantics is the
    # image-width ratio W/480, used here. D1/D2/D3/D5 numbers are therefore
    # NOT directly comparable with reference-produced logs (see
    # docs/PARITY.md).
    scale = W / 480.0
    rates = [
        _masked_mean((epe_err > k * scale).astype(jnp.float32), m, axis=1)
        for k in (1.0, 2.0, 3.0, 5.0)
    ]
    metrics_disp = jnp.stack([epe] + rates, axis=1)

    # depth metrics
    safe_pred = jnp.where(m > 0, pred_depth, 1.0)
    safe_gt = jnp.where(m > 0, gt_depth, 1.0)
    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = _masked_mean((thresh < 1.05).astype(jnp.float32), m, axis=1)
    a2 = _masked_mean((thresh < 1.10).astype(jnp.float32), m, axis=1)
    a3 = _masked_mean((thresh < 1.25).astype(jnp.float32), m, axis=1)
    rmse = jnp.sqrt(_masked_mean((safe_gt - safe_pred) ** 2, m, axis=1))
    rel = _masked_mean(jnp.abs(safe_gt - safe_pred) / safe_gt, m, axis=1)
    mae = _masked_mean(jnp.abs(safe_gt - safe_pred), m, axis=1)
    metrics_depth = jnp.stack([a1, a2, a3, rmse, rel, mae], axis=1)

    return metrics_disp, metrics_depth


def metrics_to_dict(metrics_disp, metrics_depth):
    """Reference: utils_d3roma/utils.py:657-661."""
    import numpy as np

    md = np.asarray(metrics_disp).reshape(-1, 5).mean(0)
    me = np.asarray(metrics_depth).reshape(-1, 6).mean(0)
    return {
        "disp": dict(zip(DISP_KEYS, md.tolist())),
        "depth": dict(zip(DEPTH_KEYS, me.tolist())),
    }
