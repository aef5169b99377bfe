"""Test environment: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding tests run on the virtual device mesh
(``--xla_force_host_platform_device_count=8``) — the "fake multi-node
backend" per SURVEY §4 (the reference has no tests or distributed backend).

This container's sitecustomize pre-imports jax and initializes the 'axon'
TPU backend before any test code runs, so env vars alone are not enough:
the backend registry must be reset after switching the platform config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
if jax.local_device_count() < 8 or jax.default_backend() != "cpu":
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.local_device_count() == 8, jax.devices()
