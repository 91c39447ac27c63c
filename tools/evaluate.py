"""Evaluate a model's field + parameter accuracy on synthetic camera crops.

Generates a deterministic synthetic eval set (random cameras -> pano crops +
analytic GT fields, all on device), runs the model, and reports the paper's
metrics: mean/median up-vector angular error, latitude error, and camera
parameter errors.

Usage:
    python tools/evaluate.py --version Paramnet-360Cities-edina-centered \
        --samples 256 --batch 32
    python tools/evaluate.py --params run/params.npz --tiny --size 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--version", default="Paramnet-360Cities-edina-centered")
    ap.add_argument("--params", default=None)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--tiny", action="store_true", help="tiny custom model (smoke)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from perspectivefields_tpu import PerspectiveFields
    from perspectivefields_tpu.data import data_iterator
    from perspectivefields_tpu.evaluation import field_metrics

    if args.tiny:
        from perspectivefields_tpu.config import (
            BackboneConfig,
            GravityHeadConfig,
            LatitudeHeadConfig,
            ModelConfig,
            ParamNetConfig,
        )

        # must match tools/train.py --tiny so trained params load
        cfg = ModelConfig(
            version="custom",
            backbone=BackboneConfig(
                dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)
            ),
            gravity=GravityHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
            latitude=LatitudeHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
            param=ParamNetConfig(
                name="ParamNetConvNextRegress",
                predict_params=("roll", "pitch", "vfov"),
                input_size=64 if args.size >= 128 else 32,
            ),
            recover_rpf=True,
            resize=(args.size, args.size),
        )
        model = PerspectiveFields(
            version="custom", config=cfg, params=args.params, compute_dtype="float32"
        )
    else:
        model = PerspectiveFields(
            version=args.version, params=args.params, compute_dtype="bfloat16"
        )

    h, w = model.cfg.resize
    it = data_iterator(jax.random.PRNGKey(args.seed), batch_size=args.batch, im_hw=(h, w))
    mean = jnp.asarray(model.cfg.pixel_mean)

    agg = []
    n = 0
    while n < args.samples:
        batch = next(it)
        raw = model._forward_prenormalized_fn(model.params, batch["image"] - mean)
        pred_up = raw["pred_gravity"].astype(jnp.float32)
        pred_lat = jnp.degrees(
            jnp.arcsin(jnp.clip(raw["pred_latitude"][..., 0].astype(jnp.float32), -1, 1))
        )
        gt_lat = jnp.degrees(jnp.arcsin(batch["gt_latitude"][..., 0]))
        m = field_metrics(pred_up, batch["gt_gravity"], pred_lat, gt_lat)
        agg.append({k: float(v) for k, v in m.items()})
        n += args.batch

    keys = agg[0].keys()
    print(f"eval over {n} synthetic crops ({h}x{w}):")
    for k in keys:
        vals = [a[k] for a in agg]
        print(f"  {k:16s} {np.mean(vals):8.3f}")


if __name__ == "__main__":
    main()
