"""Checkpoint I/O: PyTorch .pth conversion + orbax/npz save/load."""

from .torch_convert import (
    convert_torch_state_dict,
    flax_to_torch_names,
    load_torch_checkpoint,
)
from .io import load_params, save_params

__all__ = [
    "convert_torch_state_dict",
    "flax_to_torch_names",
    "load_torch_checkpoint",
    "save_params",
    "load_params",
]
