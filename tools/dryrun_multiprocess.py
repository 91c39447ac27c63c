"""Multi-process (multi-host DCN scale-out) dryrun — VERDICT r4 missing-#3.

Certifies parallel.mesh.init_distributed and the cross-process global-mesh
path end to end: 2 processes x 4 virtual CPU devices each join a JAX
distributed service on localhost, build ONE global (data=4, model=2) mesh,
run one pjit train step (toy config) and one sharded_forward inference
batch, and checksum the allgathered outputs. A single-process control with
the identical global mesh/batch/params runs first; the artifact records
both checksums and their agreement — the multi-process global mesh must
produce the single-process result.

Usage:
    timeout 1800 python tools/dryrun_multiprocess.py
Writes docs/artifacts/multiprocess_r5.json.
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "docs", "artifacts", "multiprocess_r5.json")
_ROLE = "_PF_MP_ROLE"

N_PROC, LOCAL_DEV = 2, 4
GLOBAL_DEV = N_PROC * LOCAL_DEV


def _toy_setup():
    """Toy model config + deterministic global batch (mirrors
    __graft_entry__.dryrun_multichip's wiring check)."""
    import jax.numpy as jnp
    import numpy as np

    from perspectivefields_tpu.config import (
        BackboneConfig,
        GravityHeadConfig,
        LatitudeHeadConfig,
        ModelConfig,
        ParamNetConfig,
    )

    cfg = ModelConfig(
        backbone=BackboneConfig(
            dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)
        ),
        gravity=GravityHeadConfig(
            loss_type="regression", embed_dim=16, fusion_dim=16
        ),
        latitude=LatitudeHeadConfig(
            loss_type="regression", embed_dim=16, fusion_dim=16
        ),
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "general_vfov", "rel_cx", "rel_cy"),
            input_size=32,
        ),
        recover_rpf=True,
        recover_pp=True,
    )
    b = 8
    rng = np.random.default_rng(0)
    batch_np = {
        "image": np.asarray(rng.normal(size=(b, 64, 64, 3)), np.float32),
        "gt_gravity": np.asarray(rng.normal(size=(b, 64, 64, 2)), np.float32),
        "gt_latitude": np.asarray(
            rng.uniform(-1, 1, size=(b, 64, 64, 1)), np.float32
        ),
        "gt_params": np.asarray(rng.normal(size=(b, 5)) * 0.3, np.float32),
    }
    del jnp
    return cfg, batch_np


def run(role: str, coordinator: str, process_id: int):
    """Body for both the single-process control ('solo') and each member of
    the 2-process run ('mp')."""
    import jax

    if role == "mp":
        from perspectivefields_tpu.parallel import init_distributed

        init_distributed(
            coordinator_address=coordinator,
            num_processes=N_PROC,
            process_id=process_id,
        )
        assert jax.process_count() == N_PROC, jax.process_count()
        assert jax.local_device_count() == LOCAL_DEV
    assert jax.device_count() == GLOBAL_DEV, jax.device_count()

    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.parallel import make_mesh, sharded_forward
    from perspectivefields_tpu.train import create_train_state, make_train_step

    cfg, batch_np = _toy_setup()
    model = PersNet(cfg, remat=True)
    mesh = make_mesh(n_data=GLOBAL_DEV // 2, n_model=2)

    def globalize(tree):
        """Host-replicated numpy -> global jax.Arrays sharded on 'data'.
        make_array_from_callback lets each process hand over exactly its
        addressable shards by global index — the multi-controller input
        contract (api.py:333-344's per-process-DP rationale)."""
        def one(x):
            sh = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            return jax.make_array_from_callback(x.shape, sh, lambda i: x[i])

        return jax.tree.map(one, tree)

    with mesh:
        state, tx = create_train_state(
            model,
            jax.random.PRNGKey(0),
            sample_batchless_shape=(64, 64, 3),
            mesh=mesh,
        )
        step = make_train_step(model, tx, cfg, mesh=mesh)
        batch = globalize(batch_np)
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), loss

        fwd, sharded_params = sharded_forward(model, mesh, state.params)
        out = fwd(sharded_params, batch["image"])
        jax.block_until_ready(out)
        if role == "mp":
            from jax.experimental import multihost_utils

            out_np = jax.tree.map(
                lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=True)),
                out,
            )
        else:
            out_np = jax.tree.map(np.asarray, out)
        checksum = float(
            sum(np.abs(v).sum() for v in jax.tree.leaves(out_np))
        )
    result = {
        "role": role,
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh": dict(mesh.shape),
        "train_loss": loss,
        "inference_abs_checksum": checksum,
    }
    print("RESULT " + json.dumps(result), flush=True)


def _spawn(role, coordinator, pid):
    # CPU-mesh child env recipe shared with __graft_entry__ (axon pinning
    # disabled, platform forced, device count injected)
    import __graft_entry__ as g

    n_local = LOCAL_DEV if role == "mp" else GLOBAL_DEV
    env = g.cpu_mesh_child_env(n_local)
    env[_ROLE] = f"{role}:{coordinator}:{pid}"
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _collect(proc, tag):
    out, _ = proc.communicate(timeout=1500)
    lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(f"--- {tag} output ---\n{out}\n")
        raise RuntimeError(f"{tag} failed rc={proc.returncode}")
    return json.loads(lines[-1][len("RESULT "):])


def main():
    role_env = os.environ.get(_ROLE)
    if role_env:
        role, host, port, pid = role_env.split(":")
        run(role, f"{host}:{port}", int(pid))
        return

    # single-process control: same global mesh shape on 8 local devices
    t0 = time.perf_counter()
    print("# running single-process control…", file=sys.stderr, flush=True)
    solo = _collect(_spawn("solo", "127.0.0.1:0", 0), "solo")
    print(f"# control done in {time.perf_counter() - t0:.0f}s; "
          "starting 2-process run…", file=sys.stderr, flush=True)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = [_spawn("mp", coord, i) for i in range(N_PROC)]
    results = [_collect(p, f"mp[{i}]") for i, p in enumerate(procs)]

    agree = all(
        abs(r["inference_abs_checksum"] - solo["inference_abs_checksum"])
        <= 1e-4 * max(1.0, abs(solo["inference_abs_checksum"]))
        and abs(r["train_loss"] - solo["train_loss"]) <= 1e-5
        for r in results
    )
    artifact = {
        "what": "2-process x 4-device CPU global mesh vs 1-process control "
        "(init_distributed + pjit train step + sharded_forward)",
        "solo": solo,
        "multiprocess": results,
        "agree": agree,
        "wall_seconds": round(time.perf_counter() - t0, 1),
    }
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
