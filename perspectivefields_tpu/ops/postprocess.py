"""Prediction postprocessing: network-resolution fields -> original-size fields.

Reference behavior (kept faithful, but batched/vmapped and on-device):

* ``pf_postprocess`` — bilinear resize of (C, 320, 320) logits/fields back to
  the original (H, W) (reference: perspective2d/utils/utils.py:483-507,
  detectron2-style).
* gravity postprocess — scale the vector field by (W/320, H/320) *before*
  resize, then renormalize (reference: gravity_head.py:237-261).
* latitude postprocess — resize then asin -> degrees (regression) or
  bin-decode then resize (classification) (reference: latitude_head.py:195-219).

Layout here is channels-last (H, W, C); batch handling is vmap/jit at the
caller. Output sizes are static per jit specialization.
"""

from __future__ import annotations

import jax.numpy as jnp

from .codec import decode_bin, decode_bin_latitude
from .image import resize_bilinear

_EPS = 1e-12


def pf_postprocess(result: jnp.ndarray, img_size, output_height: int, output_width: int):
    """Resize (H, W, C) predictions to (output_height, output_width, C) with
    torch-bilinear (align_corners=False) semantics.

    Reference: perspective2d/utils/utils.py:483-507 (crop-to-img_size then
    F.interpolate; the crop is an identity for this framework's fixed 320x320
    network resolution).
    """
    result = result[: img_size[0], : img_size[1], :]
    return resize_bilinear(result, output_height, output_width, "torch_bilinear")


def postprocess_gravity(
    pred: jnp.ndarray,
    image_size,
    out_h: int,
    out_w: int,
    loss_type: str = "regression",
    num_classes: int = 73,
):
    """Gravity field at original resolution.

    Args:
        pred: (320, 320, 2) regression field or (320, 320, num_classes) logits.
    Returns:
        (out_h, out_w, 2) unit up-vector field.

    Reference: gravity_head.py:237-261 — note the aspect-ratio rescale of the
    vector components happens before the spatial resize, then renormalize.
    """
    if loss_type == "classification":
        vec = decode_bin(jnp.argmax(pred, axis=-1), num_classes)
    else:
        vec = pred
    scale = jnp.array(
        [out_w / image_size[1], out_h / image_size[0]], dtype=pred.dtype
    )
    vec = vec * scale
    vec = pf_postprocess(vec, image_size, out_h, out_w)
    norm = jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), _EPS)
    return vec / norm


def postprocess_latitude(
    pred: jnp.ndarray,
    image_size,
    out_h: int,
    out_w: int,
    loss_type: str = "regression",
    num_classes: int = 180,
):
    """Latitude map in degrees at original resolution.

    Args:
        pred: (320, 320, 1) sin-latitude regression or (320, 320, C) logits.
    Returns:
        (out_h, out_w) degrees.

    Reference: latitude_head.py:195-219.
    """
    if loss_type == "regression":
        lat = pf_postprocess(pred, image_size, out_h, out_w)[..., 0]
        lat = jnp.degrees(jnp.arcsin(jnp.clip(lat, -1.0, 1.0)))
    else:
        binmap = jnp.argmax(pred, axis=-1)
        lat = decode_bin_latitude(binmap, num_classes)[..., None]
        lat = pf_postprocess(lat, image_size, out_h, out_w)[..., 0]
    return lat
