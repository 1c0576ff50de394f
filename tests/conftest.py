"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA exposes N host devices, so sharding/collective paths
compile and execute exactly as they would across real chips.
"""

import os

_platform = os.environ.get("RUMPY_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook forces JAX_PLATFORMS=axon at interpreter startup, which
# routes every jit through the remote-TPU compile tunnel (~100x slower for
# tiny test graphs). config.update wins over the env var.
jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def jkey():
    return jax.random.PRNGKey(0)
