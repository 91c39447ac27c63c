"""Top-level PersNet: backbone + low-level encoder + decode heads + ParamNet.

One flax module whose __call__ is the entire jit-able device program for a
normalized (B, 320, 320, 3) batch -> raw network-resolution predictions
(+ global camera parameters). Mirrors the orchestration of the reference's
PerspectiveFields.forward (reference: perspectivefields.py:223-272) minus the
host-side per-image postprocess loop, which lives in ops/postprocess.py and is
vmapped by the API layer.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .heads import LowLevelEncoder, SegFormerDecoder
from .mit import MixViT
from .paramnet import ParamNetHead

_EPS = 1e-12


class PersNet(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Fused ConvNeXt-block kernel in the ParamNet trunk (inference-only fast
    # path; the param tree is identical, so the same weights serve both).
    fuse_convnext: bool = False
    # Fused MixFFN kernel in the backbone (inference-only; same param tree).
    fuse_ffn: bool = False
    # Whole-block fused kernel in the backbone (attention + LN2 + MixFFN +
    # skips in one VMEM program; inference-only; same param tree).
    fuse_block: bool = False
    # Rematerialize backbone blocks in the backward pass (jax.checkpoint):
    # trades ~1/3 extra forward FLOPs for not keeping every block's
    # intermediates alive until the backward sweep. Required to train the
    # full mit_b3 at 320^2 on a single 16 GB chip (without it the backward
    # keeps ~18 stage-3 FFN hiddens alive and the step OOMs at any useful
    # batch). Identical param tree and numerics; inference ignores it.
    remat: bool = False

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """images: normalized NHWC batch at network resolution (320x320).

        Returns dict with (channels-last):
          pred_gravity: (B, 320, 320, 2|73) — unit vectors or bin logits
          pred_latitude: (B, 320, 320, 1|180) — sin(lat) or bin logits
          pred_roll/pitch/(general_)vfov/rel_cx/rel_cy/rel_focal: (B,) if the
          version has a ParamNet.
        """
        cfg = self.cfg
        hl = MixViT(
            cfg.backbone, self.dtype, self.use_pallas, self.fuse_ffn,
            self.fuse_block, self.remat, name="backbone"
        )(images, deterministic)
        ll = LowLevelEncoder(dtype=self.dtype, name="ll_enc")(images)

        out: Dict[str, jnp.ndarray] = {}
        if cfg.gravity is not None:
            g = SegFormerDecoder(
                cfg.gravity.out_channels,
                cfg.gravity.embed_dim,
                cfg.gravity.fusion_dim,
                self.dtype,
                name="gravity_head",
            )(hl, ll)
            if cfg.gravity.loss_type == "regression":
                # F.normalize over channels (gravity_head.py:180-181,192-193)
                norm = jnp.maximum(
                    jnp.linalg.norm(g, axis=-1, keepdims=True), _EPS
                ).astype(g.dtype)
                g = g / norm
            out["pred_gravity"] = g
        if cfg.latitude is not None:
            lat = SegFormerDecoder(
                cfg.latitude.out_channels,
                cfg.latitude.embed_dim,
                cfg.latitude.fusion_dim,
                self.dtype,
                name="latitude_head",
            )(hl, ll)
            if cfg.latitude.loss_type == "regression":
                # hard clamp, exactly the reference's torch.clamp
                # (latitude_head.py:191-192): gradient 0 outside [-1, 1].
                # Trainability from a saturated init comes from the overflow
                # penalty in train/losses.py (latitude_regression_loss),
                # which sees the pre-clamp value and pulls it back into
                # range. A straight-through clamp (constant gradient 1) was
                # measured letting an adam oscillation grow undamped until
                # the head diverged and died (PERF_NOTES round 4) — the
                # gravity head survives the same oscillation because its
                # normalize's gradient shrinks as ||g|| grows.
                raw = lat
                lat = jnp.clip(raw, -1.0, 1.0)
                if not deterministic:
                    out["latitude_raw"] = raw
            out["pred_latitude"] = lat

        if cfg.param_on:
            param = ParamNetHead(
                cfg.param,
                cfg.recover_pp,
                self.dtype,
                fused_blocks=self.fuse_convnext,
                name="param_net",
            )(out["pred_gravity"].astype(self.dtype), out["pred_latitude"].astype(self.dtype))
            out.update(param)
        return out
