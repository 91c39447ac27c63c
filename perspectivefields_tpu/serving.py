"""High-throughput batched serving: pipelined host preprocess + device compute.

The reference's batched path is a Python loop + torch.stack on one device
(reference: perspectivefields.py:207-221). This serving loop is designed for
TPU slices:

  host thread:  native fused resize+normalize (OpenMP)  -> pinned numpy batch
  device:       async dispatch of the jit forward       (JAX is async by
                default; we only block on the *previous* batch's results)
  mesh:         batch dim sharded over the 'data' axis of a device mesh

Because JAX dispatch is asynchronous, simply *not* synchronizing between
batches double-buffers host and device work; the explicit prefetch depth
bounds host memory.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional

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
    """

    def __init__(
        self,
        model: PerspectiveFields,
        batch_size: int = 64,
        mesh=None,
        use_mesh: bool = True,
    ):
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh or (make_mesh() if use_mesh and jax.device_count() > 1 else None)
        self.timer = StageTimer()
        self._fwd = model._forward_prenormalized_fn

    def _preprocess(self, imgs: np.ndarray) -> np.ndarray:
        h, w = self.model.cfg.resize
        return native.preprocess_batch(
            imgs, h, w, self.model._pixel_mean, self.model._pixel_std,
            bgr_flip=self.model.input_format == "RGB",
        )

    def predict_iter(
        self, images: Iterable[np.ndarray]
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields one raw-prediction dict per image (network resolution),
        pipelining preprocess of batch k+1 with device compute of batch k."""
        images = iter(images)
        pending = None  # (device outputs, count)

        def batches():
            buf: List[np.ndarray] = []
            for img in images:
                buf.append(img)
                if len(buf) == self.batch_size:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)

        for raw_batch in batches():
            count = raw_batch.shape[0]
            if count < self.batch_size:  # pad tail to keep one compiled shape
                pad = np.repeat(raw_batch[-1:], self.batch_size - count, axis=0)
                raw_batch = np.concatenate([raw_batch, pad], axis=0)
            with self.timer.stage("preprocess", count):
                host_batch = self._preprocess(raw_batch)
            with self.timer.stage("dispatch", count):
                x = jnp.asarray(host_batch)
                if self.mesh is not None:
                    x = shard_batch(self.mesh, x)
                out = self._fwd(self.model.params, x)  # async
            if pending is not None:
                yield from self._drain(*pending)
            pending = (out, count)
        if pending is not None:
            yield from self._drain(*pending)

    def _drain(self, out, count: int) -> Iterator[Dict[str, np.ndarray]]:
        with self.timer.stage("device_wait", count):
            host = jax.tree.map(np.asarray, out)  # blocks on this batch only
        for i in range(count):
            yield {k: v[i] for k, v in host.items()}

    def predict(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        return list(self.predict_iter(images))
