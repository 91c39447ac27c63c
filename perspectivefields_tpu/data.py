"""Synthetic training-data generation: random cameras -> crops + GT fields.

The reference's training data comes from cropping 360 panoramas with random
camera parameters and computing analytic GT fields (the camera2perspective
workflow, panocam.py). Here that whole pipeline is a single jit+vmap device
program: sample cameras, crop perspective views from a pano batch, and emit
(image, gt_gravity, gt_latitude, gt_params) batches ready for train_step.

No host loop, no equilib — generation throughput scales with the chip.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.codec import encode_bin, encode_bin_latitude
from .ops.geometry import lat_field, up_field
from .ops.pano import equi2pers


@dataclasses.dataclass(frozen=True)
class CameraSampler:
    """Uniform camera-parameter ranges (degrees)."""

    vfov: tuple = (30.0, 120.0)
    elevation: tuple = (-60.0, 60.0)
    roll: tuple = (-45.0, 45.0)
    azimuth: tuple = (-180.0, 180.0)

    def sample(self, key, n: int) -> Dict[str, jnp.ndarray]:
        ks = jax.random.split(key, 4)

        def u(k, lo_hi):
            return jax.random.uniform(
                k, (n,), minval=jnp.radians(lo_hi[0]), maxval=jnp.radians(lo_hi[1])
            )

        return {
            "vfov": u(ks[0], self.vfov),
            "elevation": u(ks[1], self.elevation),
            "roll": u(ks[2], self.roll),
            "azimuth": u(ks[3], self.azimuth),
        }


def make_batch_generator(
    im_h: int = 320,
    im_w: int = 320,
    sampler: CameraSampler = CameraSampler(),
    gravity_classes: Optional[int] = None,
    latitude_classes: Optional[int] = None,
):
    """Build a jit fn: (key, pano (Hp, Wp, 3)) -> training batch.

    Regression targets by default; pass gravity_classes / latitude_classes for
    bin-encoded classification targets (e.g. 73 / 180).
    """

    def gen(key, pano, n: int):
        cams = sampler.sample(key, n)
        crop = jax.vmap(
            lambda v, a, e, r: equi2pers(pano, v, im_w, im_h, a, e, r)
        )(cams["vfov"], cams["azimuth"], cams["elevation"], cams["roll"])
        up = jax.vmap(lambda v, e, r: up_field(v, im_w, im_h, e, r))(
            cams["vfov"], cams["elevation"], cams["roll"]
        )
        lat_deg = jax.vmap(lambda v, e, r: lat_field(v, im_w, im_h, e, r))(
            cams["vfov"], cams["elevation"], cams["roll"]
        )
        batch = {"image": crop, "cams": cams}
        if gravity_classes:
            batch["gt_gravity"] = encode_bin(up, gravity_classes)
        else:
            batch["gt_gravity"] = up
        if latitude_classes:
            batch["gt_latitude"] = encode_bin_latitude(lat_deg, latitude_classes)
        else:
            batch["gt_latitude"] = jnp.sin(jnp.radians(lat_deg))[..., None]
        # normalized params in predict_params order (roll, pitch, vfov)
        batch["gt_params"] = jnp.stack(
            [
                jnp.degrees(cams["roll"]) / 90.0,
                jnp.degrees(cams["elevation"]) / 90.0,
                jnp.degrees(cams["vfov"]) / 90.0,
            ],
            axis=-1,
        )
        return batch

    return jax.jit(gen, static_argnames=("n",))


def synthetic_pano(key, ph: int = 512, pw: int = 1024) -> jnp.ndarray:
    """Procedural pano (sky/ground gradient + random blobs) for smoke
    training without real data."""
    phi = jnp.linspace(1.0, 0.0, ph)[:, None, None]
    base = jnp.concatenate(
        [phi * 180 + 40, phi * 140 + 70, 130 - phi * 50], axis=-1
    )
    base = jnp.broadcast_to(base, (ph, pw, 3))
    noise = jax.random.uniform(key, (ph // 8, pw // 8, 3)) * 60
    noise = jax.image.resize(noise, (ph, pw, 3), "linear")
    return jnp.clip(base + noise, 0, 255)


def make_step_batch_fn(
    key,
    batch_size: int = 16,
    im_hw=(320, 320),
    pano: Optional[jnp.ndarray] = None,
    **gen_kwargs,
):
    """Traceable (step: int32 scalar) -> batch, for fusing data generation
    INTO the jit train loop (train.make_train_loop).

    Uses the identical key-split / fold_in convention as `data_iterator`, so
    the fused loop consumes the exact same seekable stream: batch i is a
    pure function of (key, i) either way.
    """
    gen = make_batch_generator(im_hw[0], im_hw[1], **gen_kwargs)
    pano_key, batch_key = jax.random.split(key)
    if pano is None:
        pano = synthetic_pano(pano_key)

    def batch_fn(step):
        return gen(jax.random.fold_in(batch_key, step), pano, batch_size)

    return batch_fn


def data_iterator(
    key,
    batch_size: int = 16,
    im_hw=(320, 320),
    pano: Optional[jnp.ndarray] = None,
    start_step: int = 0,
    **gen_kwargs,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Infinite stream of synthetic training batches (device-resident).

    Batch i is a pure function of (key, i) via fold_in — seekable, so a
    resumed run (``start_step = restored step``) continues the exact data
    stream instead of re-consuming it from batch 0."""
    gen = make_batch_generator(im_hw[0], im_hw[1], **gen_kwargs)
    pano_key, batch_key = jax.random.split(key)
    if pano is None:
        pano = synthetic_pano(pano_key)
    step = start_step
    while True:
        yield gen(jax.random.fold_in(batch_key, step), pano, batch_size)
        step += 1
