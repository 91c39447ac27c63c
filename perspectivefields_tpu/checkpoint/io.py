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


def save_train_state(state, path: str, keep: int = 2):
    """Persist a full TrainState (params + optimizer state + step) under
    ``path/step_<n>/``, keeping the last ``keep`` steps. Synchronous
    (returns when durable).

    Step-numbered subdirectories mean a crash mid-save can never destroy
    the previous good checkpoint (an in-place force-overwrite of a single
    directory deletes the old one before committing the new one).
    """
    import orbax.checkpoint as ocp

    base = os.path.abspath(path)
    step = int(state.step)
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    ckptr.save(os.path.join(base, f"step_{step:08d}"), tree, force=True)
    ckptr.wait_until_finished()
    if keep and os.path.isdir(base):
        steps = sorted(d for d in os.listdir(base) if d.startswith("step_"))
        for stale in steps[:-keep]:
            import shutil

            shutil.rmtree(os.path.join(base, stale), ignore_errors=True)


def restore_train_state(path: str, template_state):
    """Restore the newest usable TrainState under ``path``.

    Tries ``path/step_<n>/`` newest-first (skipping any partial/corrupt
    save with a warning), then ``path`` itself (the legacy single-dir
    layout). Raises FileNotFoundError when nothing restores.

    template_state: a freshly-initialized TrainState with the same model /
    optimizer config — provides the pytree structure (optax states are
    namedtuple trees) and shardings for the restored arrays.
    """
    import warnings

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
    base = os.path.abspath(path)
    candidates = []
    if os.path.isdir(base):
        candidates = [
            os.path.join(base, d)
            for d in sorted(
                (d for d in os.listdir(base) if d.startswith("step_")),
                reverse=True,
            )
        ]
    candidates.append(base)  # legacy layout
    last_exc = None
    for cand in candidates:
        try:
            tree = ckptr.restore(cand, abstract)
        except Exception as exc:
            last_exc = exc
            # a fresh/empty directory failing the legacy-layout probe is the
            # normal no-checkpoint-yet case — not worth a warning
            fresh = cand == base and not (
                os.path.isdir(base) and os.listdir(base)
            )
            if not fresh:
                warnings.warn(
                    f"checkpoint {cand} unusable ({exc!r})"
                    + ("; trying older" if cand != base else ""),
                    stacklevel=2,
                )
            continue
        return TrainState(tree["params"], tree["opt_state"], tree["step"])
    # chain the real failure (e.g. a structural mismatch against the current
    # model/optimizer config) so callers don't mistake it for "no file"
    raise FileNotFoundError(
        f"no restorable checkpoint under {base}"
    ) from last_exc
