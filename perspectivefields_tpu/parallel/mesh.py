"""Device mesh construction.

The reference has no distributed code at all (SURVEY.md section 2.3); this
framework's parallelism is new, idiomatic JAX capability: a (data, model) mesh
over ICI, GSPMD/pjit partitioning from sharding annotations, XLA collectives.
Multi-host scale-out composes via jax.distributed + the same mesh API.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX (DCN scale-out).

    Thin wrapper over jax.distributed.initialize — on Cloud TPU pods the
    arguments are auto-detected from the metadata server; pass them
    explicitly elsewhere. Call once per process before building meshes;
    afterwards jax.devices() spans every host and make_mesh() lays the data
    axis across DCN+ICI.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a 2-D (data, model) mesh.

    Defaults to all devices on the data axis — the right layout for this
    workload: a ~45M-param inference model is far below single-chip HBM, so
    batch data-parallelism over ICI is the throughput-optimal strategy
    (SURVEY.md section 2.3); the model axis exists for tensor-parallel
    experiments and for the multi-chip dry-run harness.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} > {len(devices)} devices")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names)
