"""Field <-> classification-bin codecs.

Behavioral contract from the reference implementation
(reference: perspective2d/utils/utils.py:94-162):

* Up-vector fields are encoded as angle bins over [0, 360) with
  ``num_bin - 1`` real bins and the last bin reserved for "invalid"
  (zero-vector) pixels.
* Latitude maps in degrees [-90, 90] are bucketized into ``num_classes``
  uniform bins; decoding returns bin centers.

All functions are pure jnp, shape-polymorphic over leading/spatial dims, and
therefore jit/vmap friendly. Channel layout is trailing (HW2 / HWC), the
TPU-native layout, rather than the reference's leading-channel (2HW).
"""

from __future__ import annotations

import jax.numpy as jnp


def encode_bin(vector_field: jnp.ndarray, num_bin: int) -> jnp.ndarray:
    """Encode an up-vector field into angle-class bins.

    Args:
        vector_field: (..., 2) array; channel 0 = cos(theta), 1 = sin(theta).
        num_bin: total number of bins; bin ``num_bin - 1`` marks invalid pixels.

    Returns:
        (...) int32 bin indices.

    Reference: perspective2d/utils/utils.py:94-111 (same rounding & wrap
    semantics: bin ``num_bin - 1`` from rounding wraps to 0, all-zero vectors
    map to the invalid bin).
    """
    cos_t = vector_field[..., 0]
    sin_t = vector_field[..., 1]
    angle = (jnp.arctan2(sin_t, cos_t) / jnp.pi * 180.0 + 180.0) % 360.0
    angle_bin = jnp.round(angle / (360.0 / (num_bin - 1))).astype(jnp.int32)
    angle_bin = jnp.where(angle_bin == num_bin - 1, 0, angle_bin)
    invalid = jnp.all(vector_field == 0, axis=-1)
    return jnp.where(invalid, num_bin - 1, angle_bin)


def decode_bin(angle_bin: jnp.ndarray, num_bin: int) -> jnp.ndarray:
    """Decode angle-class bins back into a unit up-vector field.

    Args:
        angle_bin: (...) integer bin indices.
        num_bin: total number of bins (last = invalid).

    Returns:
        (..., 2) float32 field; invalid bins decode to the zero vector.

    Reference: perspective2d/utils/utils.py:114-130.
    """
    angle = (angle_bin.astype(jnp.float32) * (360.0 / (num_bin - 1)) - 180.0)
    angle = angle / 180.0 * jnp.pi
    vec = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)
    invalid = (angle_bin == num_bin - 1)[..., None]
    return jnp.where(invalid, 0.0, vec)


def encode_bin_latitude(latimap: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Encode a latitude map (degrees in [-90, 90]) into class bins.

    Matches torch.bucketize(..., right=False), i.e. searchsorted side='left'
    over interior boundaries. Reference: perspective2d/utils/utils.py:133-145.
    """
    bin_size = 180.0 / num_classes
    boundaries = jnp.arange(-90.0, 90.0, bin_size)[1:]
    return jnp.searchsorted(boundaries, latimap, side="left").astype(jnp.int32)


def decode_bin_latitude(binmap: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Decode latitude class bins to bin-center degrees.

    Reference: perspective2d/utils/utils.py:148-162.
    """
    bin_size = 180.0 / num_classes
    bin_centers = jnp.arange(-90.0, 90.0, bin_size) + bin_size / 2.0
    return bin_centers[binmap]
