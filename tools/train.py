"""Train a PerspectiveFields model end to end (synthetic data by default).

Demonstrates the full training stack: synthetic camera/crop batch generation
on device, sharded pjit train step over a (data, model) mesh, periodic eval,
orbax checkpointing. For real data, swap data_iterator for a loader yielding
the same batch dict.

Usage:
    python tools/train.py --steps 200 --batch 16 --size 320
    python tools/train.py --steps 20 --batch 8 --size 64 --tiny   # smoke
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--tiny", action="store_true", help="tiny backbone (smoke)")
    ap.add_argument("--out", default=None, help="save params npz")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument(
        "--ckpt-dir", default=None, help="orbax dir for save/resume of the full TrainState"
    )
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument(
        "--chunk",
        type=int,
        default=10,
        help="steps fused per jit call (datagen compiled into the loop); "
        "1 = legacy unfused path",
    )
    args = ap.parse_args()

    from perspectivefields_tpu.config import (
        BackboneConfig,
        GravityHeadConfig,
        LatitudeHeadConfig,
        ModelConfig,
        ParamNetConfig,
    )
    from perspectivefields_tpu.data import data_iterator, make_step_batch_fn
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.parallel import make_mesh
    from perspectivefields_tpu.train import (
        create_train_state,
        make_train_loop,
        make_train_step,
    )

    backbone = (
        BackboneConfig(dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4))
        if args.tiny
        else BackboneConfig()
    )
    head_kw = dict(embed_dim=16, fusion_dim=16) if args.tiny else {}
    cfg = ModelConfig(
        backbone=backbone,
        gravity=GravityHeadConfig(loss_type="regression", **head_kw),
        latitude=LatitudeHeadConfig(loss_type="regression", **head_kw),
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "vfov"),
            input_size=64 if args.size >= 128 else 32,
        ),
        recover_rpf=True,
        resize=(args.size, args.size),
    )
    # remat: full mit_b3 at 320^2 OOMs the 16 GB chip in the backward
    # without per-block rematerialization (even at batch 16)
    model = PersNet(
        cfg,
        dtype=jnp.bfloat16 if not args.tiny else jnp.float32,
        remat=not args.tiny,
    )

    mesh = make_mesh() if jax.device_count() > 1 else None
    state, tx = create_train_state(
        model,
        jax.random.PRNGKey(0),
        sample_batchless_shape=(args.size, args.size, 3),
        learning_rate=args.lr,
        mesh=mesh,
    )

    start = 0
    if args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        from perspectivefields_tpu.checkpoint import restore_train_state

        try:
            state = restore_train_state(args.ckpt_dir, state)
            start = int(state.step)
            print(f"resumed from {args.ckpt_dir} at step {start}")
        except FileNotFoundError as exc:
            has_steps = any(
                d.startswith("step_") for d in os.listdir(args.ckpt_dir)
            )
            if has_steps:
                # checkpoints exist but none restored (config mismatch?) —
                # silently restarting from step 0 would clobber the run
                raise SystemExit(
                    f"checkpoints exist under {args.ckpt_dir} but none "
                    f"restored ({exc.__cause__!r}); refusing to start fresh. "
                    "Point --ckpt-dir elsewhere to begin a new run."
                )
            print(f"no restorable checkpoint under {args.ckpt_dir}; starting fresh")

    # normalize images like inference does
    mean = jnp.asarray(cfg.pixel_mean)

    def maybe_ckpt(prev_step, now_step):
        # checkpoint whenever a multiple of --ckpt-every falls in
        # (prev_step, now_step] — correct for any --chunk, not only
        # divisors of --ckpt-every
        if args.ckpt_dir and now_step // args.ckpt_every > prev_step // args.ckpt_every:
            from perspectivefields_tpu.checkpoint import save_train_state

            save_train_state(state, args.ckpt_dir)
            print(f"checkpointed step {now_step} -> {args.ckpt_dir}", flush=True)

    t0 = time.time()
    if args.chunk > 1:
        # fused path: data generation + `chunk` train steps in one XLA
        # program (lax.scan) — datagen overlaps compute, dispatch amortized.
        # Same seekable stream as the legacy path (batch i = f(key, i)).
        batch_fn = make_step_batch_fn(
            jax.random.PRNGKey(1), batch_size=args.batch, im_hw=cfg.resize
        )

        def prepare(batch):
            batch = dict(batch, image=(batch["image"] - mean))
            batch.pop("cams")
            return batch

        # one compiled loop per chunk length; a final short chunk (when
        # steps - start is not a multiple of --chunk) compiles a second
        # program rather than silently training past --steps
        loops = {}

        def loop_for(n):
            if n not in loops:
                loops[n] = make_train_loop(
                    model, tx, cfg, batch_fn, n, mesh=mesh, prepare=prepare
                )
            return loops[n]

        i = start
        warm = None  # (time, step) after the first (compile-bearing) call
        while i < args.steps:
            n = min(args.chunk, args.steps - i)
            state, metrics = loop_for(n)(state)
            i += n
            loss = float(metrics["loss"][-1])
            if warm is None:
                # first call pays the XLA compile — report it separately and
                # start the steady-state throughput clock after it
                print(
                    f"step {i:5d}  loss {loss:.4f}  "
                    f"(first call incl. compile: {time.time() - t0:.1f}s)",
                    flush=True,
                )
                warm = (time.time(), i)
            else:
                rate = args.batch * (i - warm[1]) / (time.time() - warm[0])
                print(
                    f"step {i:5d}  loss {loss:.4f}  ({rate:.1f} img/s steady-state)",
                    flush=True,
                )
            maybe_ckpt(i - n, i)
    else:
        step_fn = make_train_step(model, tx, cfg, mesh=mesh)
        # start_step=start: batch i is a pure function of (key, i), so a
        # resumed run continues the same data stream it would have seen
        it = data_iterator(
            jax.random.PRNGKey(1),
            batch_size=args.batch,
            im_hw=cfg.resize,
            start_step=start,
        )
        for i in range(start, args.steps):
            batch = next(it)
            batch = dict(batch, image=(batch["image"] - mean))
            batch.pop("cams")
            state, metrics = step_fn(state, batch)
            if (i + 1) % args.log_every == 0 or i == start:
                loss = float(metrics["loss"])
                rate = args.batch * (i + 1 - start) / (time.time() - t0)
                print(f"step {i + 1:5d}  loss {loss:.4f}  ({rate:.1f} img/s)", flush=True)
            maybe_ckpt(i, i + 1)

    if args.out:
        from perspectivefields_tpu.checkpoint.io import save_params

        save_params(jax.tree.map(lambda a: a, state.params), args.out)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
