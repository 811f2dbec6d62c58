"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Tests never touch the real TPU; distributed tests simulate an 8-chip slice on
host CPU (SURVEY.md §4 "distributed-without-cluster").
"""

import os

# Force-set (not setdefault): this machine exports JAX_PLATFORMS=axon for
# the real-TPU tunnel, which tests must never touch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp32 test parity: disable TF32-style matmul downcasts on CPU backends.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
