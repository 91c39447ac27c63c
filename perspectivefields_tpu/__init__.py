"""PerspectiveFields-TPU: a TPU-native (JAX/XLA/Pallas) single-image camera
calibration framework.

Re-implements the full capability surface of jinlinyi/PerspectiveFields
(CVPR 2023) — dense per-pixel up-vector ("gravity") and latitude fields plus
global camera parameter regression (roll / pitch / vfov / principal point) —
as an idiomatic JAX framework: pure-functional ops, flax modules, jit-compiled
inference, pjit/shard_map data-parallel batch serving over TPU meshes, and
Pallas kernels for the hot attention path.

Public API mirrors the reference's surface (reference:
/root/reference/perspective2d/__init__.py:1 exports `PerspectiveFields`).
"""

__version__ = "0.1.0"

__all__ = ["PerspectiveFields", "ResizeTransform", "PanoCam", "model_zoo"]


def __getattr__(name):
    # Lazy import keeps `perspectivefields_tpu.ops` usable without pulling in
    # flax/model code (and keeps import time low for ops-only users).
    if name in ("PerspectiveFields", "ResizeTransform"):
        from . import api

        return getattr(api, name)
    if name == "model_zoo":
        from .config import model_zoo

        return model_zoo
    if name == "PanoCam":
        from .pano_camera import PanoCam

        return PanoCam
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
