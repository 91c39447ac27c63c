"""Sharding rules + sharded forward/serving.

Strategy (designed for this workload, not translated — the reference is
single-device):

* **Data parallel (primary):** batch dim sharded over the 'data' mesh axis,
  parameters replicated. Inference is embarrassingly parallel; XLA inserts no
  collectives in the forward program, so throughput scales linearly over ICI.
* **Tensor parallel (optional 'model' axis):** the big Dense kernels are
  sharded Megatron-style — attention q/kv/proj over heads, MixFFN fc1
  column-wise / fc2 row-wise, decoder embed Dense column-wise. With GSPMD,
  annotating the parameter shardings is sufficient; XLA propagates and places
  the psum/all-gathers on ICI.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, array, axis: str = "data"):
    """Shard the leading (batch) dim over a mesh axis."""
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# Tensor-parallel sharding rules (path-regex -> PartitionSpec)
# ---------------------------------------------------------------------------

_TP_RULES = [
    # MixFFN: fc1 column-parallel, fc2 row-parallel
    (r".*mlp/fc1/kernel$", P(None, "model")),
    (r".*mlp/fc1/bias$", P("model")),
    (r".*mlp/fc2/kernel$", P("model", None)),
    # attention: heads (output features) column-parallel, proj row-parallel
    (r".*attn/(q|kv)/kernel$", P(None, "model")),
    (r".*attn/(q|kv)/bias$", P("model")),
    (r".*attn/proj/kernel$", P("model", None)),
    # decoder per-scale embeds (768-wide Dense): column-parallel
    (r".*linear_c[1-4]/kernel$", P(None, "model")),
    (r".*linear_c[1-4]/bias$", P("model")),
    # ConvNeXt pointwise MLPs
    (r".*pwconv1/kernel$", P(None, "model")),
    (r".*pwconv1/bias$", P("model")),
    (r".*pwconv2/kernel$", P("model", None)),
]


def _spec_for(path: str, shape, mesh: Mesh) -> P:
    n_model = mesh.shape.get("model", 1)
    if n_model > 1:
        for pattern, spec in _TP_RULES:
            if re.fullmatch(pattern, path):
                # only shard if the dim divides evenly
                dims = spec
                ok = all(
                    d is None or shape[i] % n_model == 0
                    for i, d in enumerate(dims)
                )
                if ok:
                    return spec
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for a params pytree: TP rules on the 'model' axis,
    replicated otherwise."""

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        path_str = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        specs.append(NamedSharding(mesh, _spec_for(path_str, np.shape(leaf), mesh)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def sharded_forward(model, mesh: Mesh, params, batch_axis: str = "data"):
    """Build a pjit forward fn: params sharded per TP rules (replicated on the
    data axis), inputs/outputs sharded on the batch dim.

    Returns (fn, sharded_params). Batch size must be divisible by the data
    axis size (pad at the serving layer).
    """
    p_shardings = param_shardings(mesh, params)
    sharded_params = jax.device_put(params, p_shardings)
    in_sharding = NamedSharding(mesh, P(batch_axis))

    @jax.jit
    def fn(p, images):
        images = jax.lax.with_sharding_constraint(images, in_sharding)
        return model.apply(p, images, deterministic=True)

    return fn, sharded_params
