"""Test configuration: force an 8-device virtual CPU mesh so tests (including
sharding tests) run fast and without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
forces jax.config jax_platforms='axon,cpu' at interpreter boot; env vars are
not enough -- we must update the config back before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
