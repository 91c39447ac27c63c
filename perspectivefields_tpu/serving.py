"""High-throughput batched serving: pipelined host preprocess + device compute.

The reference's batched path is a Python loop + torch.stack on one device
(reference: perspectivefields.py:207-221). This serving loop is designed for
TPU slices:

  host thread:  native PIL-exact resize (OpenMP)        -> pinned numpy batch
  device:       async dispatch of the jit forward       (JAX is async by
                default; we only block on the *previous* batch's results)
  mesh:         batch dim sharded over the 'data' axis of a device mesh

Because JAX dispatch is asynchronous, keeping up to `depth` batches in
flight (with device->host copies started at dispatch time) overlaps host
preprocess, device compute, and result readback; `depth` bounds the
device/host memory the pipeline may hold.

Wire format: ``wire="u8"`` (default) resizes on the host but keeps uint8 and
normalizes on device — the reference's own split (PIL resize on host,
mean-subtract in forward, perspectivefields.py:38-46 + :234) and 4x less
host->device traffic than shipping float32. ``wire="f32"`` runs the fused
native resize+normalize and ships float32 (useful when the device is local
PCIe and host FLOPs, not the wire, bound the pipeline).

Output wire: dense-field services are readback-bound when the device sits
behind a narrow link (at 320x320 the up+lat fields are ~1.2 MB/image in
float32 — measured 17-19 img/s through a ~27-38 MB/s relay downlink,
docs/artifacts/serving_r4.json / serving_r5.json). ``out_wire``
compresses the device->host leg: "u8" quarters the [-1,1]-bounded field
channels (pred_gravity unit vectors and the clamped sin-latitude,
fixed-point x -> round((x+1)*127.5), max dequant error 1/255 ~= 0.23 deg
of up-vector angle; measured 2.6x: 43.6 vs 17.0 img/s, serving_r5.json)
and falls back to f16 for unbounded outputs such as camera parameters.
"f16" halves the bytes (casts float outputs on device, exact to ~5e-4)
but through THIS relay measures ~5% SLOWER than raw f32 readback on two
independent runs (16.0 vs 17.0 img/s r5; 11.2 vs 13.2 on the degraded r4
link) — the relay's d2h path handles f16 arrays worse per byte than f32
or u8, so prefer "u8" for dense fields behind a relay and reserve "f16"
for PCIe-local devices. Decode back to float32 happens transparently on
the host in ``_drain``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import native
from .api import PerspectiveFields
from .parallel import make_mesh, shard_batch
from .utils.profiling import StageTimer

# Outputs bounded in [-1, 1] by construction: pred_gravity is a per-pixel
# unit up-vector (reference F.normalize, gravity_head.py:196) and
# pred_latitude is sin(latitude) hard-clamped to [-1, 1]
# (latitude_head.py:192) — eligible for fixed-point u8 on the output wire.
_UNIT_RANGE_KEYS = frozenset({"pred_gravity", "pred_latitude"})
_U8_SCALE = 127.5


class BatchPredictor:
    """Streaming predictor over same-sized uint8 BGR images.

    Args:
        model: a PerspectiveFields instance.
        batch_size: device batch (padded on the tail). Should be a multiple
            of the data-axis size when a mesh is used.
        mesh: optional jax mesh; defaults to all devices on 'data'.
        wire: "u8" (host resize, uint8 on the wire, normalize on device) or
            "f32" (fused host resize+normalize, float32 on the wire).
        select: optional subset of output keys to read back per image (e.g.
            ("pred_roll", "pred_pitch", "pred_general_vfov") for a
            camera-parameter service). Unselected outputs are never copied
            device->host — at 320x320 the dense fields are ~0.6 MB/image,
            so this is the serving lever when results cross a network.
        out_wire: device->host result encoding. None/"f32" reads back the
            model's native dtypes; "f16" casts float outputs to float16 on
            device (2x less readback, ~5e-4 absolute error); "u8" packs the
            [-1,1]-bounded dense fields (pred_gravity, pred_latitude) into
            fixed-point uint8 (4x less readback, max error 1/255 per
            channel ~= 0.23 deg up-vector angle) and uses f16 for other
            float outputs. Arrays are decoded back to float32 on the host
            before they are yielded, so callers see plain float results
            either way. This is the lever when the accelerator sits behind
            a narrow link and the service returns dense fields.
        depth: max batches in flight before blocking on the oldest one.
            Device->host copies are started asynchronously at dispatch time
            (jax copy_to_host_async), so with depth > 1 the readback latency
            of batch k overlaps the preprocess/compute of batches k+1..k+depth
            — measured to matter a lot when the accelerator sits behind a
            high-latency link (docs/artifacts/serving_r4.json).
    """

    def __init__(
        self,
        model: PerspectiveFields,
        batch_size: int = 64,
        mesh=None,
        use_mesh: bool = True,
        wire: str = "u8",
        select: Optional[Sequence[str]] = None,
        depth: int = 2,
        out_wire: Optional[str] = None,
    ):
        if wire not in ("u8", "f32"):
            raise ValueError(f"wire must be 'u8' or 'f32', got {wire!r}")
        if out_wire not in (None, "f32", "f16", "u8"):
            raise ValueError(
                f"out_wire must be None, 'f32', 'f16' or 'u8', got {out_wire!r}"
            )
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh or (make_mesh() if use_mesh and jax.device_count() > 1 else None)
        self.timer = StageTimer()
        self.wire = wire
        self.select = tuple(select) if select is not None else None
        self.depth = depth
        self.out_wire = None if out_wire == "f32" else out_wire
        self._pack = None  # jitted output encoder, built on first batch
        self._pack_modes: Dict[str, str] = {}  # key -> "u8" | "f16" | "raw"
        # u8 wire: the plain forward normalizes on device ((x-mean)/std fuses
        # into the stem conv); f32 wire: normalization already happened on
        # the host inside the fused native preprocess.
        self._fwd = (
            model._forward_fn if wire == "u8" else model._forward_prenormalized_fn
        )

    def _preprocess(self, frames: List[np.ndarray]) -> np.ndarray:
        """Frame list -> device-ready batch, padded to batch_size.

        Gather-resize straight from the callers' frame buffers (native
        pointer-array API): stacking the raw frames first would cost a full
        extra memcpy per frame (1.2 MB at 640px), which measurably dominates
        on memory-bandwidth-poor hosts. Tail padding duplicates the last
        frame's POINTER — no copy."""
        h, w = self.model.cfg.resize
        flip = self.model.input_format == "RGB"
        if self.wire == "u8":
            return native.resize_list_u8(
                frames, h, w, bgr_flip=flip, pad_to=self.batch_size
            )
        return native.preprocess_list(
            frames, h, w, self.model._pixel_mean, self.model._pixel_std,
            bgr_flip=flip, pad_to=self.batch_size,
        )

    def _build_pack(self, out: Dict[str, jnp.ndarray]) -> None:
        """Build the jitted output encoder for this output structure.

        A small separate device program (casts/quantize only) rather than a
        re-jit of the whole forward: it fuses into a handful of elementwise
        kernels and its dispatch hides behind the pipeline depth."""
        modes = {}
        for k, v in out.items():
            if not jnp.issubdtype(v.dtype, jnp.floating):
                modes[k] = "raw"
            elif self.out_wire == "u8" and k in _UNIT_RANGE_KEYS:
                modes[k] = "u8"
            else:
                modes[k] = "f16"
        self._pack_modes = modes

        def pack(d):
            packed = {}
            for k, v in d.items():
                mode = modes[k]
                if mode == "u8":
                    x = jnp.clip(v.astype(jnp.float32), -1.0, 1.0)
                    packed[k] = jnp.round((x + 1.0) * _U8_SCALE).astype(
                        jnp.uint8
                    )
                elif mode == "f16":
                    packed[k] = v.astype(jnp.float16)
                else:
                    packed[k] = v
            return packed

        self._pack = jax.jit(pack)

    def _decode_host(self, key: str, v: np.ndarray) -> np.ndarray:
        mode = self._pack_modes.get(key, "raw")
        if mode == "u8":
            return v.astype(np.float32) / _U8_SCALE - 1.0
        if mode == "f16":
            return v.astype(np.float32)
        return v

    def predict_iter(
        self, images: Iterable[np.ndarray]
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields one raw-prediction dict per image (network resolution),
        keeping up to `depth` batches in flight: while batch k's results
        travel device->host (copy started at dispatch), the host
        preprocesses and dispatches batches k+1..k+depth."""
        images = iter(images)
        inflight: List = []  # [(device outputs, count), ...] oldest first

        def batches():
            buf: List[np.ndarray] = []
            for img in images:
                buf.append(img)
                if len(buf) == self.batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        for frames in batches():
            count = len(frames)
            with self.timer.stage("preprocess", count):
                host_batch = self._preprocess(frames)
            with self.timer.stage("dispatch", count):
                x = jnp.asarray(host_batch)
                if self.mesh is not None:
                    x = shard_batch(self.mesh, x)
                out = self._fwd(self.model.params, x)  # async
                if self.select is not None:
                    missing = [k for k in self.select if k not in out]
                    if missing:
                        raise ValueError(
                            f"select keys {missing} not in the model's "
                            f"outputs {sorted(out)} — e.g. pred_roll/pitch "
                            "need a ParamNet-enabled version"
                        )
                    out = {k: out[k] for k in self.select}
                if self.out_wire is not None:
                    if self._pack is None or set(self._pack_modes) != set(out):
                        self._build_pack(out)
                    out = self._pack(out)
                # start the device->host copy NOW; _drain's np.asarray later
                # finds the data already (or still) in flight instead of
                # starting the round trip when we block
                for v in out.values():
                    try:
                        v.copy_to_host_async()
                    except AttributeError:  # non-jax leaf (defensive)
                        pass
            inflight.append((out, count))
            if len(inflight) > self.depth:
                yield from self._drain(*inflight.pop(0))
        while inflight:
            yield from self._drain(*inflight.pop(0))

    def _drain(self, out, count: int) -> Iterator[Dict[str, np.ndarray]]:
        with self.timer.stage("device_wait", count):
            host = jax.tree.map(np.asarray, out)  # blocks on this batch only
            if self.out_wire is not None:
                host = {k: self._decode_host(k, v) for k, v in host.items()}
        for i in range(count):
            yield {k: v[i] for k, v in host.items()}

    def predict(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        return list(self.predict_iter(images))
