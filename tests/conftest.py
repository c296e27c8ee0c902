"""Test configuration: force an 8-virtual-device CPU backend so multi-chip
sharding tests run without TPU hardware.

Note: in this environment `import pytest` already imports jax (axon
sitecustomize), so env vars alone are too late; jax.config.update works
because the backend itself initializes lazily on first device access.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
