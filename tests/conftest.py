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
# Test tiers (VERDICT r3 item 7, re-measured r5): `pytest -m "not slow"`
# is the smoke tier — measured 15:57 wall on this 1-core box WHILE a
# chip training run shared the core (2026-08; ~10 min sum of solo
# durations). The full suite is the default.
# Marking is module-level for wholesale-slow modules plus per-TEST for
# individual >=12 s tests inside otherwise-fast modules, so every module
# keeps smoke-tier representation. tests/test_smoke_budget.py guards the
# SLOW_TESTS names against rename drift.
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
# Individual tests measured >=12 s on the 1-core box (pytest --durations,
# r5). Sum ~29 min of the former 39-min "fast" tier.
SLOW_TESTS = {
    "test_aux_subsystems": {"test_gui_server_routes"},
    "test_blind_sr": {"test_frozen_encoder_pipeline",
                      "test_joint_moco_pipeline",
                      "test_joint_supmoco_pipeline"},
    "test_degradation_ops": {"test_noise_image_pca_metadata"},
    "test_eval_bucket": {"test_bucket_eval_bounds_compiles"},
    "test_face_attribute_gans": {
        "test_agagan_generator_parity", "test_attribute_gan_handler_smoke",
        "test_facesr_attributes_discriminator_parity",
        "test_facesr_attributes_generator_parity", "test_fmf_block_parity",
        "test_fmf_discriminators_parity", "test_fmf_residual_dense_net_parity"},
    "test_face_legacy": {
        "test_dic_train_with_landmarks", "test_esrganfs_step",
        "test_facegan_training_and_generation",
        "test_interface_forwards_set_epoch", "test_sparnet",
        "test_waveletsrnet[2]", "test_waveletsrnet[4]"},
    "test_gan_models": {
        "test_gan_checkpoint_roundtrip", "test_gan_phase_updates_both_networks",
        "test_gan_reference_optimizer_vocabulary",
        "test_gan_step_vgg_loss_nonzero_with_weights",
        "test_gan_step_vgg_loss_zero_without_weights",
        "test_qrealesrgan_metadata", "test_realesrgan_unet_discriminator",
        "test_rrdbnet_shapes"},
    "test_metabed": {
        "test_metabed_autoencoder_phases", "test_metabed_esrgan_phases",
        "test_metabed_meta_block_types[res-pipe-q-layer]",
        "test_metabed_meta_block_types[res-pipe-split-q-layer]"},
    "test_pipeline": {"test_host_pipeline_csv_contract"},
    "test_regression_training": {
        "test_cli_routes_regression",
        "test_positives_default_derived_from_handler",
        "test_supmoco_online_degradation_training",
        "test_supmoco_regression_training",
        "test_weakcon_regression_training"},
    "test_regressors": {
        "test_basicnn", "test_densenet_tiny", "test_efficientnet_tiny",
        "test_manet_kernel_map", "test_resnet18_batchnorm_updates"},
    "test_san_dasr": {"test_dasr_phases"},
    "test_sftmd_ikc": {"test_ikc_pretrain_and_loop"},
    "test_training": {
        "test_epoch_cutoff_and_relative_num_epochs",
        "test_resume_truncates_orphan_stats_rows",
        "test_loss_masking_semantics", "test_online_degradation_training",
        "test_profile_steps_writes_trace", "test_reference_training_kwargs",
        "test_use_masks_trains_masked_end_to_end"},
    "test_wavelet_dic_fssr": {"test_dic_forward_parity",
                              "test_waveletsrnet_forward_parity"},
    "test_zoo_extended": {"test_dan", "test_danv1qrealesrgan",
                          "test_danv2", "test_elan", "test_qelan"},
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in TORCH_MODULES:
            item.add_marker(pytest.mark.torch)
        if mod in PARITY_MODULES:
            item.add_marker(pytest.mark.parity)
        if mod in SLOW_MODULES or item.name in SLOW_TESTS.get(mod, ()):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def jkey():
    return jax.random.PRNGKey(0)
