"""Test harness: force an 8-device virtual CPU platform before jax imports.

This is the TPU-native substitute for a fake distributed backend
(SURVEY.md §4): every sharding/mesh test runs against 8 virtual CPU
devices, so multi-chip code paths are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the env presets 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter boot, which
# outranks the env var — undo it before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
