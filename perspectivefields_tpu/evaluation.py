"""Evaluation metrics for perspective fields and camera parameters.

The mounted reference branch has no eval code (it lives on the un-mounted
train_eval branch, README.md:40); these are the paper's metrics (arXiv
2212.03239): per-pixel up-vector angular error, per-pixel latitude error,
and absolute camera-parameter errors — implemented as batched jnp so whole
eval sets run on device.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def up_angular_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel angle (degrees) between predicted and GT unit up-vectors.

    pred/gt: (..., 2). Invalid GT pixels (zero vectors) return 0 — mask with
    ``jnp.linalg.norm(gt, axis=-1) > 0`` for means.
    """
    dot = jnp.sum(pred * gt, axis=-1)
    norm = jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1)
    valid = norm > 1e-8
    cos = jnp.clip(dot / jnp.where(valid, norm, 1.0), -1.0, 1.0)
    return jnp.where(valid, jnp.degrees(jnp.arccos(cos)), 0.0)


def latitude_error(pred_deg: jnp.ndarray, gt_deg: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel absolute latitude error in degrees."""
    return jnp.abs(pred_deg - gt_deg)


def field_metrics(
    pred_up: jnp.ndarray,
    gt_up: jnp.ndarray,
    pred_lat_deg: jnp.ndarray,
    gt_lat_deg: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Mean/median up angular error + latitude error over a batch.

    Shapes: up (B, H, W, 2), lat (B, H, W)."""
    ang = up_angular_error(pred_up, gt_up)
    mask = jnp.linalg.norm(gt_up, axis=-1) > 1e-8
    ang_mean = jnp.sum(ang * mask) / jnp.maximum(jnp.sum(mask), 1)
    lat = latitude_error(pred_lat_deg, gt_lat_deg)
    return {
        "up_mean_deg": ang_mean,
        "up_median_deg": jnp.nanmedian(jnp.where(mask, ang, jnp.nan)),
        "lat_mean_deg": jnp.mean(lat),
        "lat_median_deg": jnp.median(lat),
    }


def param_errors(pred: Dict, gt: Dict) -> Dict[str, jnp.ndarray]:
    """Absolute errors for whatever parameters both dicts contain
    (roll/pitch/vfov in degrees, rel_* unitless)."""
    out = {}
    for key in ("roll", "pitch", "vfov", "general_vfov", "rel_cx", "rel_cy", "rel_focal"):
        pk, gk = f"pred_{key}", key
        if pk in pred and gk in gt:
            out[f"{key}_abs_err"] = jnp.abs(
                jnp.asarray(pred[pk]) - jnp.asarray(gt[gk])
            )
    return out
