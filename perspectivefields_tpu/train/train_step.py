"""pjit training step over a (data, model) mesh.

New capability relative to the mounted reference branch (inference-only):
optax AdamW, jit/pjit value-and-grad step with batch sharded over the 'data'
axis and parameters sharded per the tensor-parallel rules in
parallel/sharding.py. Gradient reduction happens implicitly via GSPMD (the
batch-sharded loss mean inserts a psum over ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.sharding import param_shardings
from .losses import total_loss


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, children: TrainState(*children),
)


def create_train_state(
    model,
    rng,
    sample_batchless_shape=(320, 320, 3),
    learning_rate=1e-4,  # float or optax schedule
    weight_decay: float = 1e-2,
    mesh: Optional[Mesh] = None,
    grad_clip: Optional[float] = 1.0,
):
    """Initialize params (+optimizer) — optionally laid out over a mesh.

    grad_clip: global-norm gradient clipping (None disables). On by
    default: the masked field losses spike on batches whose random cameras
    produce mostly-invalid fields, and an unclipped spike was measured to
    NaN an otherwise-healthy run (learning_proof_r4, lr 3e-4, step ~1200).
    """
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    sample = jnp.zeros((1, *sample_batchless_shape), jnp.float32)
    params = jax.jit(model.init)(rng, sample)
    if mesh is not None:
        params = jax.device_put(params, param_shardings(mesh, params))
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def _make_step_body(model, tx, cfg, mesh, loss_fn):
    def step(state: TrainState, batch):
        images = batch["image"]
        if mesh is not None:
            spec = P("data", *([None] * (images.ndim - 1)))
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, spec)
            )

        def objective(params):
            # dropout key varies per step (fold_in keeps the step jittable
            # and the run reproducible); a fixed key would apply the SAME
            # stochastic-depth mask every step, biasing which blocks train
            out = model.apply(
                params, images, deterministic=False,
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0), state.step)},
            )
            loss, parts = loss_fn(out, batch, cfg)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **parts}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return step


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg,
    mesh: Optional[Mesh] = None,
    loss_fn: Callable = total_loss,
):
    """Build the jit train step: (state, batch) -> (state, metrics).

    batch: dict with 'image' (B, H, W, 3) normalized NHWC + gt_* targets (see
    losses.total_loss). With a mesh, inputs are constrained to the 'data' axis
    and the optimizer update runs in the same XLA program (no host sync).
    """
    step = _make_step_body(model, tx, cfg, mesh, loss_fn)
    return jax.jit(step, donate_argnums=(0,))


def make_train_loop(
    model,
    tx: optax.GradientTransformation,
    cfg,
    batch_fn: Callable,
    chunk: int,
    mesh: Optional[Mesh] = None,
    loss_fn: Callable = total_loss,
    prepare: Optional[Callable] = None,
):
    """Build a fused jit loop: (state) -> (state, stacked metrics).

    Runs `chunk` iterations of (generate batch -> train step) inside ONE
    XLA program via lax.scan — data generation is compiled into the same
    program as the step, so it overlaps with compute instead of serializing
    as a separate dispatch, and the per-call dispatch overhead (~30 ms via
    the axon relay, PERF_NOTES.md) is amortized chunk-fold.

    batch_fn: traceable (step: int32 scalar) -> batch dict keyed by the
    absolute step index (data.make_step_batch_fn) — the stream stays
    seekable across restarts exactly like data_iterator's.
    prepare: optional traceable batch transform (e.g. mean-subtraction).
    """
    step_body = _make_step_body(model, tx, cfg, mesh, loss_fn)

    def loop(state: TrainState):
        def body(st, _):
            batch = batch_fn(st.step)
            if prepare is not None:
                batch = prepare(batch)
            return step_body(st, batch)

        state2, metrics = jax.lax.scan(body, state, None, length=chunk)
        return state2, metrics

    return jax.jit(loop, donate_argnums=(0,))
