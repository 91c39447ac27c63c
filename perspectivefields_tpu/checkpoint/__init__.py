"""Checkpoint I/O: PyTorch .pth conversion + orbax/npz save/load."""

from .torch_convert import (
    convert_torch_state_dict,
    flax_to_torch_names,
    load_torch_checkpoint,
)
from .io import load_params, restore_train_state, save_params, save_train_state

__all__ = [
    "convert_torch_state_dict",
    "flax_to_torch_names",
    "load_torch_checkpoint",
    "save_params",
    "load_params",
    "save_train_state",
    "restore_train_state",
]
