"""Test harness config: force an 8-device virtual CPU mesh.

Sharding/parallelism tests run against a host-platform mesh
(xla_force_host_platform_device_count=8) so multi-chip behavior is exercised
without TPU hardware — the JAX-idiomatic substitute for fake backends
(SURVEY.md section 4).

Note: this environment's sitecustomize registers the 'axon' TPU platform and
forces it programmatically, so the JAX_PLATFORMS env var alone is not enough —
we must also override via jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
