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
    from perspectivefields_tpu.evaluation import evaluate_pairs

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
    res = evaluate_pairs(model, it, max_samples=args.samples)
    n = res.pop("samples")
    print(f"eval over {n} synthetic crops ({h}x{w}):")
    for k, v in res.items():
        print(f"  {k:16s} {v:8.3f}")


if __name__ == "__main__":
    main()
