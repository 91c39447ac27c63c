"""Host-fed serving throughput: the REAL inference_batch user journey.

Unlike bench.py (which pre-stages uint8 batches on device and measures the
device-side pipeline), this measures the path a serving deployment actually
runs (VERDICT r3 ask #2; reference journey: perspectivefields.py:207-221):

    host numpy uint8 640px frames
      -> native preprocess (OpenMP, PIL-exact resize; u8 or fused-f32 wire)
      -> host->device transfer
      -> jit forward (fused-attention kernel path, bf16)
      -> device->host readback (selectable outputs)

via serving.BatchPredictor, reporting img/s and the StageTimer breakdown.
Wall time covers full consumption of the stream — every image's selected
outputs land back in host numpy.

Modes measured (each an honest serving product):
  params:u8       camera-parameter service (roll/pitch/vfov/cx/cy readback),
                  uint8 wire — the throughput-optimal deployment
  fields:u8       dense-field service (gravity+latitude at net res readback),
                  float32 readback — isolates the output-wire cost
  fields:u8:f16o  same service, f16 output wire (2x less readback)
  fields:u8:u8o   same service, u8 fixed-point output wire (4x less readback)
  params:f32      params readback but float32 input wire (fused host
                  normalize) — isolates the input-wire-format cost

Writes docs/artifacts/serving_r5.json (override: SERVE_OUT) and prints one
JSON line per mode. The header records a wall-clock timestamp and a
device<->host link microbenchmark (MB/s both directions) so snapshots taken
under different relay/link health are distinguishable in-repo, and a
"partial" flag that stays true until every requested mode has completed
(the file is rewritten after each mode so a killed run keeps its finished
modes — but is then marked partial).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# SERVE_CPU=1: plumbing smoke on an 8-device virtual CPU mesh (the box pins
# jax to the TPU via sitecustomize; flags must be set before any jax op)
if os.environ.get("SERVE_CPU"):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

if os.environ.get("SERVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench  # noqa: E402  (compilation cache config + make_params)
from perspectivefields_tpu import PerspectiveFields, native
from perspectivefields_tpu.serving import BatchPredictor

PARAM_KEYS = (
    "pred_roll", "pred_pitch", "pred_general_vfov", "pred_rel_cx",
    "pred_rel_cy",
)
FIELD_KEYS = ("pred_gravity", "pred_latitude")


def run_mode(model, images, batch_size, wire, select, warm_images, depth,
             out_wire=None):
    pred = BatchPredictor(
        model, batch_size=batch_size, use_mesh=jax.device_count() > 1,
        wire=wire, select=select, depth=depth, out_wire=out_wire,
    )
    # compile + relay warmup outside the timed region
    for _ in pred.predict_iter(warm_images):
        pass
    pred.timer = type(pred.timer)()  # fresh stage counters
    n = 0
    t0 = time.perf_counter()
    for out in pred.predict_iter(images):
        n += 1
    dt = time.perf_counter() - t0
    return {
        "images": n,
        "seconds": round(dt, 3),
        "images_per_sec": round(n / dt, 2),
        "stages": pred.timer.summary(),
    }


def link_microbench(mb: int = 32, reps: int = 3):
    """Measured host->device and device->host bandwidth (MB/s, best of
    reps) — a cheap link-health stamp for the artifact header."""
    import jax.numpy as jnp

    n = mb * 2**20 // 4
    host = np.ones((n,), np.float32)
    jax.device_put(host).block_until_ready()  # warmup
    up, down = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        dev.block_until_ready()
        up.append(time.perf_counter() - t0)
        # read back the array just put THIS rep: jax caches an array's
        # host copy after its first transfer, so re-reading one array
        # measures the cache (hundreds of GB/s), not the link
        t0 = time.perf_counter()
        np.asarray(dev)
        down.append(time.perf_counter() - t0)
        del dev
    return {
        "h2d_MBps": round(mb / min(up), 1),
        "d2h_MBps": round(mb / min(down), 1),
    }


def main():
    on_tpu = jax.default_backend() == "tpu"
    # non-TPU smoke: batch 8 = the virtual mesh's data-axis size
    batch = int(os.environ.get("SERVE_BATCH", "128" if on_tpu else "8"))
    nbatches = int(os.environ.get("SERVE_NBATCHES", "8" if on_tpu else "2"))

    version = "Paramnet-360Cities-edina-centered"
    # Build the param tree with the cheap eval_shape fill BEFORE constructing
    # the API object: the constructor's random-init fallback is
    # jit(model.init), which compiles the whole forward a second time
    # (~12 min via the relay). Throughput does not depend on weight values.
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    import jax.numpy as jnp

    cfg = model_zoo[version]["config"]
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = bench.make_params(PersNet(cfg, dtype=dtype), cfg.resize)
    model = PerspectiveFields(
        version,
        params=params,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )

    rng = np.random.default_rng(0)
    images = list(
        rng.integers(
            0, 256, size=(nbatches * batch, 640, 640, 3), dtype=np.uint8
        )
    )
    warm = images[:batch]

    results = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "link": link_microbench(),
        "partial": True,
        "batch": batch,
        "n_images": len(images),
        "native_available": native.available(),
        "host_threads": native.num_threads(),
        "backend": jax.default_backend(),
        "devices": jax.device_count(),
        "modes": {},
    }
    modes = [
        ("params:u8", "u8", PARAM_KEYS, None),
        ("fields:u8", "u8", FIELD_KEYS, None),
        ("fields:u8:f16o", "u8", FIELD_KEYS, "f16"),
        ("fields:u8:u8o", "u8", FIELD_KEYS, "u8"),
        ("params:f32", "f32", PARAM_KEYS, None),
    ]
    if os.environ.get("SERVE_MODES"):
        wanted = os.environ["SERVE_MODES"].split(",")
        modes = [m for m in modes if m[0] in wanted]
    depth = int(os.environ.get("SERVE_DEPTH", "4" if on_tpu else "2"))
    results["depth"] = depth
    out_path = os.environ.get("SERVE_OUT") or os.path.join(
        os.path.dirname(__file__), "..", "docs", "artifacts", "serving_r5.json"
    )
    for name, wire, select, out_wire in modes:
        r = run_mode(model, images, batch, wire, select, warm, depth,
                     out_wire=out_wire)
        results["modes"][name] = r
        print(json.dumps({"mode": name, **r}), flush=True)
        # write after every mode: the cold-cache XLA compile through the
        # relay can exceed any sane timeout, and a killed run must not
        # lose the modes that did complete (header keeps partial=true)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    results["partial"] = False
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
