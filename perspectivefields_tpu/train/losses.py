"""Loss functions (pure jnp, channels-last).

Objectives match the reference's training losses:
* multi-scale gradient loss — msgil_norm_loss over 4 dyadic scales of
  masked horizontal/vertical difference-of-differences
  (reference: modeling/persformer_heads/loss_fns.py:5-44).
* gravity regression: 0.1 * msgil + masked L2 over channels, invalid pixels
  (zero-norm targets) excluded (reference: gravity_head.py:199-223).
* latitude regression: 0.1 * msgil + MSE (reference: latitude_head.py:221-242).
* classification heads: cross-entropy with ignore_index
  (gravity_head.py:224-232).
* ParamNet: per-parameter MSE / L1 (reference: param_network.py:102-128,
  233-241).
* meanstd_tanh_norm_loss — masked MAE + tanh-compressed MAE
  (reference: loss_fns.py:46-74; train_eval-branch depth objective).

Masking is branch-free (weighted means) so everything jits and shards.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _one_scale_gradient_loss(diff: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """diff, mask: (B, H, W, C); gradient loss at one scale.

    Reference: loss_fns.py:5-25 (stride-2 difference of prediction error,
    masked mean over valid pairs)."""
    mask = mask.astype(diff.dtype)
    v_mask = mask[:, :-2, :, :] * mask[:, 2:, :, :]
    v_grad = jnp.abs(diff[:, :-2, :, :] - diff[:, 2:, :, :]) * v_mask
    h_mask = mask[:, :, :-2, :] * mask[:, :, 2:, :]
    h_grad = jnp.abs(diff[:, :, :-2, :] - diff[:, :, 2:, :]) * h_mask
    valid = jnp.sum(v_mask) + jnp.sum(h_mask)
    return (jnp.sum(v_grad) + jnp.sum(h_grad)) / (valid + _EPS)


def msgil_norm_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, scales_num: int = 4
) -> jnp.ndarray:
    """Multi-scale gradient loss. pred/gt/mask: (B, H, W, C).

    Reference: loss_fns.py:27-44 (power-of-two strided subsampling)."""
    diff = pred - gt
    total = 0.0
    for i in range(scales_num):
        step = 2**i
        total += _one_scale_gradient_loss(
            diff[:, ::step, ::step, :], mask[:, ::step, ::step, :]
        )
    return total


def meanstd_tanh_norm_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """MAE + tanh-compressed MAE over masked pixels, averaged per image.

    Batch items with <=100 valid pixels are dropped; 0 when none survive.
    Branch-free (weighted sums) so it jits and shards — the reference's
    boolean indexing and per-item Python loop
    (loss_fns.py:46-74, meanstd_tanh_norm_loss) become masked reductions.
    pred/gt/mask: (B, H, W, C) channels-last.
    """
    m = mask.astype(pred.dtype)
    per_sum = jnp.sum(m, axis=(1, 2, 3))
    keep = (per_sum > 100).astype(pred.dtype)
    cnt = jnp.maximum(per_sum, 1.0)
    mae = jnp.sum(jnp.abs(gt - pred) * m, axis=(1, 2, 3)) / cnt
    tanh_mae = (
        jnp.sum(
            jnp.abs(jnp.tanh(0.01 * gt) - jnp.tanh(0.01 * pred)) * m,
            axis=(1, 2, 3),
        )
        / cnt
    )
    nb = jnp.sum(keep)
    total = jnp.sum((mae + tanh_mae) * keep) / jnp.maximum(nb, 1.0)
    return jnp.where(nb > 0, total, 0.0)


def gravity_regression_loss(
    pred: jnp.ndarray, target: jnp.ndarray, loss_weight: float = 1.0
):
    """pred/target: (B, H, W, 2) unit fields; zero-norm targets are invalid.

    Reference: gravity_head.py:204-218."""
    mask = (jnp.linalg.norm(target, axis=-1, keepdims=True) > 1e-5)
    mask2 = jnp.broadcast_to(mask, pred.shape)
    msg = 0.1 * msgil_norm_loss(pred, target, mask2) * loss_weight
    sq = jnp.sum((pred - target) ** 2, axis=-1, keepdims=True)
    l2 = jnp.sum(sq * mask) / (jnp.sum(mask) + _EPS) * loss_weight
    return {"gravity-msg-normal-loss": msg, "gravity-l2-loss": l2}


def latitude_regression_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_weight: float = 1.0,
    raw: Optional[jnp.ndarray] = None,
):
    """pred/target: (B, H, W, 1) sin-latitude. Reference: latitude_head.py:225-237.

    raw: the head's pre-clamp output (models emit it as 'latitude_raw' in
    training mode). The clamp's gradient is zero outside [-1, 1], so with
    ~99% of pixels saturated at random init the l2/msgil terms alone cannot
    train the head; the quadratic overflow penalty supplies the restoring
    gradient, and — unlike a straight-through clamp — it also bounds drift:
    the pull back grows with the overflow (round-4 divergence postmortem in
    PERF_NOTES.md)."""
    mask = jnp.ones_like(pred, dtype=bool)
    msg = 0.1 * msgil_norm_loss(pred, target, mask) * loss_weight
    l2 = jnp.mean((pred - target) ** 2) * loss_weight
    out = {"latitude-msg-normal-loss": msg, "latitude-l2-loss": l2}
    if raw is not None:
        overflow = jnp.maximum(jnp.abs(raw) - 1.0, 0.0)
        out["latitude-sat-loss"] = jnp.mean(overflow**2) * loss_weight
    return out


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int, loss_weight: float = 1.0
) -> jnp.ndarray:
    """logits (B, H, W, C), int labels (B, H, W); mean over non-ignored.

    Reference: gravity_head.py:224-232 / latitude_head.py:243-247
    (F.cross_entropy with ignore_index)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / (jnp.sum(valid) + _EPS) * loss_weight


def param_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_weight: float = 1.0,
    kind: str = "mse",
) -> jnp.ndarray:
    """(B, P) parameter regression loss; kind 'mse' or 'l1'.

    Reference: param_network.py:233-241 (per-param MSE) and :122-124 (L1)."""
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - target)) * loss_weight
    return jnp.mean((pred - target) ** 2) * loss_weight


def total_loss(outputs: dict, batch: dict, cfg) -> tuple[jnp.ndarray, dict]:
    """Combine all enabled objectives for a ModelConfig.

    batch keys (all optional, channels-last): gt_gravity (B,H,W,2) or int bins
    (B,H,W); gt_latitude (B,H,W,1) or bins; gt_params (B, P) normalized by
    PARAM_FACTORS order of cfg.param.predict_params.
    """
    losses = {}
    if cfg.gravity is not None and "gt_gravity" in batch:
        if cfg.gravity.loss_type == "regression":
            losses.update(
                gravity_regression_loss(
                    outputs["pred_gravity"], batch["gt_gravity"], cfg.gravity.loss_weight
                )
            )
        else:
            losses["loss_gravity"] = cross_entropy_loss(
                outputs["pred_gravity"],
                batch["gt_gravity"],
                cfg.gravity.ignore_value,
                cfg.gravity.loss_weight,
            )
    if cfg.latitude is not None and "gt_latitude" in batch:
        if cfg.latitude.loss_type == "regression":
            losses.update(
                latitude_regression_loss(
                    outputs["pred_latitude"],
                    batch["gt_latitude"],
                    cfg.latitude.loss_weight,
                    raw=outputs.get("latitude_raw"),
                )
            )
        else:
            losses["loss_latitude"] = cross_entropy_loss(
                outputs["pred_latitude"],
                batch["gt_latitude"],
                cfg.latitude.ignore_value,
                cfg.latitude.loss_weight,
            )
    if cfg.param_on and "gt_params" in batch:
        pred = jnp.stack(
            [outputs["pred_" + k] for k in cfg.param.predict_params], axis=-1
        )
        # normalize predictions back to network scale for the loss
        from ..config import PARAM_FACTORS

        factors = jnp.asarray([PARAM_FACTORS[k] for k in cfg.param.predict_params])
        losses["param-loss"] = param_loss(
            pred / factors, batch["gt_params"], cfg.param.loss_weight
        )
    total = sum(losses.values())
    return total, losses
