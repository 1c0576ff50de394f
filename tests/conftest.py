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

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 item 7): module-level auto-marking so
# `pytest -m "not slow"` is a <5-minute smoke path while the full suite
# stays the default. Durations measured on this 1-core box — modules
# whose wall share pushes the suite past the smoke budget are `slow`.
# ---------------------------------------------------------------------------

TORCH_MODULES = {
    # import torch and/or load /root/reference code as a golden oracle
    "test_arch_parity", "test_face_attribute_gans", "test_face_segmentation",
    "test_gan_models", "test_pipeline", "test_reference_parity",
    "test_set5_parity", "test_trajectory_parity", "test_wavelet_dic_fssr",
}
PARITY_MODULES = {
    # golden-parity comparisons vs the torch reference
    "test_arch_parity", "test_reference_parity", "test_set5_parity",
    "test_trajectory_parity", "test_pipeline",
}
SLOW_MODULES = {
    # measured >60 s/module on the 1-core CI box (full nets, multi-step
    # trajectories, CLI E2E epochs, the H.264 codec, 8-device mesh jits)
    "test_trajectory_parity", "test_set5_parity", "test_cli_e2e",
    "test_examples", "test_native", "test_sharding",
    "test_arch_parity", "test_reference_parity",
    "test_graft_entry_hermetic",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in TORCH_MODULES:
            item.add_marker(pytest.mark.torch)
        if mod in PARITY_MODULES:
            item.add_marker(pytest.mark.parity)
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def jkey():
    return jax.random.PRNGKey(0)
