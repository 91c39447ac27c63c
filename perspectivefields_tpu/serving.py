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
    ):
        if wire not in ("u8", "f32"):
            raise ValueError(f"wire must be 'u8' or 'f32', got {wire!r}")
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh or (make_mesh() if use_mesh and jax.device_count() > 1 else None)
        self.timer = StageTimer()
        self.wire = wire
        self.select = tuple(select) if select is not None else None
        self.depth = depth
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
        for i in range(count):
            yield {k: v[i] for k, v in host.items()}

    def predict(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        return list(self.predict_iter(images))
