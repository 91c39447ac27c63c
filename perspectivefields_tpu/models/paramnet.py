"""ParamNet: dense field -> global camera parameters.

Two variants, selected by config (reference: param_network.py:11-19):

* ``ParamNet`` — ConvNeXt(num_classes=5) over the full-resolution
  concat(gravity 2ch, latitude 1ch) field; outputs scaled by 90 for
  roll/pitch/vfov, plus the reference's ``rel_focal = 1/(2 tan(x2))`` quirk
  (param_network.py:46-69 — note tan of the *raw* network output).
* ``ParamNetConvNextRegress`` — field nearest-downsampled to
  input_size (64), ConvNeXt(len(predict_params)) head, per-param scale
  factors; missing params backfilled (rel_cx/rel_cy = 0, general_vfov = vfov,
  rel_focal solved from gvfov) (param_network.py:171-231).

The reference's scipy.fsolve backfill is replaced by the closed-form
``general_vfov_to_focal`` so the whole ParamNet stays on device.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import PARAM_FACTORS, ParamNetConfig
from ..ops.geometry import general_vfov_to_focal
from ..ops.image import resize_nearest
from .convnext import ConvNeXt


class ParamNetHead(nn.Module):
    """Camera-parameter regressor over predicted fields (NHWC)."""

    cfg: ParamNetConfig
    recover_pp: bool = False
    dtype: jnp.dtype = jnp.float32
    # Fused ConvNeXt-block Pallas kernel (inference-only, no VJP); see
    # kernels/convnext_block.py. Param tree identical either way.
    fused_blocks: bool = False

    @nn.compact
    def __call__(
        self, pred_gravity: jnp.ndarray, pred_latitude: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """pred_gravity (B, H, W, 2), pred_latitude (B, H, W, 1) at network
        resolution. Returns dict of (B,) parameter arrays (degrees /
        relative units), always containing pred_general_vfov, pred_rel_cx,
        pred_rel_cy (backfill semantics of perspectivefields.py:260-271).
        """
        field = jnp.concatenate([pred_gravity, pred_latitude], axis=-1)
        cfg = self.cfg

        if cfg.name == "ParamNet":
            x = ConvNeXt(
                num_classes=5,
                dtype=self.dtype,
                fused_blocks=self.fused_blocks,
                name="backbone",
            )(field)
            if self.recover_pp:
                param = {
                    "pred_roll": x[:, 0] * 90.0,
                    "pred_pitch": x[:, 1] * 90.0,
                    "pred_rel_focal": x[:, 2],
                    "pred_rel_cx": x[:, 3],
                    "pred_rel_cy": x[:, 4],
                    # reference contract alias: stacked principal point
                    # (param_network.py:55-60 emits pred_rel_pp = x[:, 3:])
                    "pred_rel_pp": x[:, 3:5],
                }
                # no vfov emitted in this branch in the reference either;
                # derive gvfov from focal for the unified output contract
                param["pred_general_vfov"] = jnp.degrees(
                    2.0 * jnp.arctan(1.0 / (2.0 * param["pred_rel_focal"]))
                )
                param["pred_vfov"] = param["pred_general_vfov"]
            else:
                param = {
                    "pred_roll": x[:, 0] * 90.0,
                    "pred_pitch": x[:, 1] * 90.0,
                    "pred_vfov": x[:, 2] * 90.0,
                    # reference quirk: tan of the raw (unscaled) output
                    # (param_network.py:66)
                    "pred_rel_focal": 1.0 / 2.0 / jnp.tan(x[:, 2]),
                }
        elif cfg.name == "ParamNetConvNextRegress":
            small = resize_nearest(field, cfg.input_size, cfg.input_size)
            x = ConvNeXt(
                num_classes=cfg.num_outputs,
                dtype=self.dtype,
                fused_blocks=self.fused_blocks,
                name="backbone",
            )(small)
            param = {}
            for idx, key in enumerate(cfg.predict_params):
                param["pred_" + key] = x[:, idx] * PARAM_FACTORS[key]
        else:
            raise ValueError(f"unknown paramnet: {cfg.name}")

        # unified backfill (reference: param_network.py:206-220 +
        # perspectivefields.py:262-267)
        any_out = next(iter(param.values()))
        zeros = jnp.zeros_like(any_out)
        if "pred_rel_cx" not in param:
            param["pred_rel_cx"] = zeros
            param["pred_rel_cy"] = zeros
        if "pred_general_vfov" not in param:
            param["pred_general_vfov"] = param["pred_vfov"]
        if "pred_rel_focal" not in param:
            param["pred_rel_focal"] = general_vfov_to_focal(
                param["pred_rel_cx"],
                param["pred_rel_cy"],
                1.0,
                param["pred_general_vfov"],
                degree=True,
            )
        return param
