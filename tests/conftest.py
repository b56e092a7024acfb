"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so sharding/pjit paths are exercised without TPU hardware
(SURVEY §4 test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup (to
# register the TPU plugin), which freezes env-var-derived config before this
# file runs — so also override through jax.config.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
