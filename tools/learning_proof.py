"""End-to-end learning proof: data -> train -> eval with real improvement.

VERDICT r3 ask #4: the training stack must be shown to LEARN, not merely
descend. This tool trains a tiny PersNet on the on-device synthetic camera
generator (data.make_step_batch_fn, the camera2perspective GT pipeline) via
the fused scanned loop, and evaluates per-pixel up-vector / latitude angular
error on a HELD-OUT synthetic stream (different PRNG key) before and after.

Pass criterion (asserted): mean up angular error drops from random-init
(~40-90 deg) by >= 4x AND below 15 deg; latitude mean below 10 deg. On TPU
the default config reaches single digits in ~2k steps (~2 min of step time).

Writes docs/artifacts/learning_proof_r4.json and prints one JSON line.

Usage:
    python tools/learning_proof.py                      # TPU defaults
    PROOF_CPU=1 python tools/learning_proof.py --steps 40 --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("PROOF_CPU"):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

if os.environ.get("PROOF_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build(size: int):
    from perspectivefields_tpu.config import (
        BackboneConfig,
        GravityHeadConfig,
        LatitudeHeadConfig,
        ModelConfig,
    )
    from perspectivefields_tpu.models import PersNet

    # field-only tiny model: the learning claim is about the dense heads;
    # ParamNet regression on synthetic cams is exercised by tools/train.py
    # small-but-not-starved model: the 8/16/24/32 x depth-1 config plateaued
    # at ~27 deg mean up error after 10k steps (capacity-bound, not
    # optimization-bound — loss flat while eval improving); this one reaches
    # single digits. Still ~50x smaller than mit_b3.
    cfg = ModelConfig(
        version="custom",
        backbone=BackboneConfig(
            dims=(16, 32, 48, 64), depths=(2, 2, 2, 2), num_heads=(1, 2, 3, 4)
        ),
        gravity=GravityHeadConfig(loss_type="regression", embed_dim=32, fusion_dim=32),
        latitude=LatitudeHeadConfig(loss_type="regression", embed_dim=32, fusion_dim=32),
        resize=(size, size),
    )
    return cfg, PersNet(cfg, dtype=jnp.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="peak lr of the warmup+cosine schedule")
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument(
        "--smoke", action="store_true",
        help="plumbing smoke: skip the improvement assertions",
    )
    args = ap.parse_args()

    from perspectivefields_tpu.data import data_iterator, make_step_batch_fn
    from perspectivefields_tpu.evaluation import field_metrics
    from perspectivefields_tpu.train import create_train_state, make_train_loop

    import optax

    cfg, model = build(args.size)
    # warmup + cosine-to-~0: constant lr stalls this proof well above the
    # bar (27 deg at 10k steps); the decay tail is what buys single digits
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr,
        warmup_steps=min(500, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 1e-2,
    )
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0),
        sample_batchless_shape=(args.size, args.size, 3),
        learning_rate=schedule,
    )
    mean = jnp.asarray(cfg.pixel_mean)

    # held-out eval stream: key 999 (train stream uses key 1)
    eval_it = data_iterator(
        jax.random.PRNGKey(999), batch_size=args.batch, im_hw=cfg.resize
    )
    eval_batches = [next(eval_it) for _ in range(args.eval_batches)]

    fwd = jax.jit(lambda p, x: model.apply(p, x, deterministic=True))

    def evaluate(params):
        ms = []
        for batch in eval_batches:
            out = fwd(params, batch["image"] - mean)
            pred_lat = jnp.degrees(
                jnp.arcsin(jnp.clip(out["pred_latitude"][..., 0], -1, 1))
            )
            gt_lat = jnp.degrees(jnp.arcsin(batch["gt_latitude"][..., 0]))
            m = field_metrics(
                out["pred_gravity"], batch["gt_gravity"], pred_lat, gt_lat
            )
            ms.append({k: float(v) for k, v in m.items()})
        return {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}

    before = evaluate(state.params)
    print(f"# before: {before}", file=sys.stderr, flush=True)

    batch_fn = make_step_batch_fn(
        jax.random.PRNGKey(1), batch_size=args.batch, im_hw=cfg.resize
    )

    def prepare(batch):
        batch = dict(batch, image=(batch["image"] - mean))
        batch.pop("cams")
        batch.pop("gt_params")
        return batch

    loop = make_train_loop(
        model, tx, cfg, batch_fn, args.chunk, prepare=prepare
    )
    t0 = time.time()
    losses = []
    i = 0
    while i < args.steps:
        state, metrics = loop(state)
        i += args.chunk
        losses.append(float(metrics["loss"][-1]))
        print(
            f"# step {i:5d}  loss {losses[-1]:.4f}  ({time.time() - t0:.0f}s)",
            file=sys.stderr, flush=True,
        )
    train_secs = time.time() - t0

    after = evaluate(state.params)
    print(f"# after: {after}", file=sys.stderr, flush=True)

    result = {
        "steps": i,
        "batch": args.batch,
        "size": args.size,
        "train_seconds": round(train_secs, 1),
        "images_per_sec": round(i * args.batch / train_secs, 1),
        "before": before,
        "after": after,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result), flush=True)
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "artifacts",
        "learning_proof_r4.json",
    )
    if not args.smoke:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"# wrote {out_path}", file=sys.stderr)
        assert after["up_mean_deg"] < before["up_mean_deg"] / 4, (
            before, after,
        )
        assert after["up_mean_deg"] < 15.0, after
        assert after["lat_mean_deg"] < 10.0, after
        print("# learning proof PASSED", file=sys.stderr)


if __name__ == "__main__":
    main()
