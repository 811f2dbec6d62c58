"""Test config: force an 8-device virtual CPU mesh before jax backends init.

Tests never touch the real TPU; distributed tests simulate an 8-chip slice
on host CPU (SURVEY.md §4 "distributed-without-cluster").

This machine's sitecustomize registers the axon TPU plugin and IMPORTS jax
at interpreter startup, so env vars set here (XLA_FLAGS / JAX_PLATFORMS)
can be too late. ``jax.config.update`` works until the first backend
initialization, which hasn't happened at conftest time.
"""

import os

# harmless when jax not yet imported; the config updates below are the
# authoritative path when it is
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, (
    f"tests need the 8-device virtual CPU mesh, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
