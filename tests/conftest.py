"""Test configuration: force the CPU JAX backend with 8 virtual devices.

Tests must run anywhere (CI, dev boxes) without TPU hardware; sharding tests
use an 8-device virtual CPU mesh, standing in for an 8-chip TPU slice.
This must run before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; jax.config wins over both.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
