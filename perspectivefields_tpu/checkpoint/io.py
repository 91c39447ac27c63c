"""Native parameter persistence: msgpack-free flat-npz + optional orbax.

The converted checkpoints are saved as a flat .npz (path components joined
with '/'), loadable without torch. Orbax is used when a directory path is
given (standard JAX production checkpointing; supports sharded async save).
"""

from __future__ import annotations

import os

import numpy as np


def _flatten(tree: dict, prefix=""):
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, np.asarray(v)


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: dict, path: str):
    """Save a params pytree. '.npz' suffix -> flat npz; else orbax dir."""
    if path.endswith(".npz"):
        flat = dict(_flatten(params))
        np.savez_compressed(path, **flat)
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str) -> dict:
    """Load a params pytree saved by save_params."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return _unflatten({k: z[k] for k in z.files})
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def save_train_state(state, path: str):
    """Persist a full TrainState (params + optimizer state + step) to an
    orbax directory, for training resume. Synchronous (returns when durable).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template_state):
    """Restore a TrainState saved by save_train_state.

    template_state: a freshly-initialized TrainState with the same model /
    optimizer config — provides the pytree structure (optax states are
    namedtuple trees) and shardings for the restored arrays.
    """
    import jax
    import orbax.checkpoint as ocp

    from ..train.train_step import TrainState

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": template_state.params,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    tree = ckptr.restore(os.path.abspath(path), abstract)
    return TrainState(tree["params"], tree["opt_state"], tree["step"])
