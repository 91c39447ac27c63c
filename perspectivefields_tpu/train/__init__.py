"""Training: loss functions, optimizer wiring, pjit train step.

The mounted reference branch is inference-only (its training lives on the
un-mounted train_eval branch; README.md:40), but its loss functions ship in
modeling/persformer_heads/loss_fns.py and the heads' .losses() methods — this
module provides the same objectives as pure-jnp functions plus an optax/pjit
training loop, making the framework trainable end to end on TPU meshes.
"""

from .losses import (
    cross_entropy_loss,
    gravity_regression_loss,
    latitude_regression_loss,
    meanstd_tanh_norm_loss,
    msgil_norm_loss,
    param_loss,
    total_loss,
)
from .train_step import (
    TrainState,
    create_train_state,
    make_train_loop,
    make_train_step,
)

__all__ = [
    "msgil_norm_loss",
    "meanstd_tanh_norm_loss",
    "gravity_regression_loss",
    "latitude_regression_loss",
    "cross_entropy_loss",
    "param_loss",
    "total_loss",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_train_loop",
]
