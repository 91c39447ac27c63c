"""Test harness config: force an 8-device virtual CPU mesh.

Sharding/parallelism tests run against a host-platform mesh
(xla_force_host_platform_device_count=8) so multi-chip behavior is exercised
without TPU hardware — the JAX-idiomatic substitute for fake backends
(SURVEY.md section 4). Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
