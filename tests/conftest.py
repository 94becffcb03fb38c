"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU-world "fake backend" (SURVEY.md §4): sharding/pjit tests run
against 8 virtual CPU devices so multi-chip code paths are exercised without
TPU hardware.

Note: the environment may pre-import jax with a TPU plugin platform already
configured (JAX_PLATFORMS is latched at import time), so we override the
*config* value, not just the env var — backends are created lazily, so this
works as long as no test touched a device before conftest ran.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --------------------------- smoke tier --------------------------- #
# `pytest -m smoke` runs a <5-minute one-test-per-subsystem subset (the full
# suite is ~45 min on a single-core box). Curated here in ONE place instead
# of decorating files; names are validated at collection time so a renamed
# test fails loudly instead of silently shrinking the tier.
SMOKE = {
    "test_ops.py::test_upfirdn2d_adjoint",          # ops: FIR resampling
    "test_ops.py::test_bias_act_clamp_and_gain",    # ops: fused bias_act
    "test_ops.py::test_modulated_conv2d_demodulation",
    "test_stylegan.py::test_generator_adapted_end_to_end",
    "test_losses.py",                               # all golden loss formulas
    "test_train_step.py::test_single_device_step",
    "test_train_step.py::test_data_parallel_step_matches_mesh",  # sharding
    "test_train_loop.py::test_train_viscoin_loop",  # outer loop + ckpt/logs
    "test_gan_training.py::test_gan_train_step",
    "test_eval.py::test_amplify_concepts",
    "test_data.py::test_loader_thread_and_resume_determinism",
    "test_data.py::test_host_test_transform_matches_torchvision",
    "test_cli.py::test_cli_registers_all_reference_commands",
    "test_cli.py::test_cli_logs_roundtrip",
    "test_checkpoints.py::test_train_state_resume",
    "test_serving.py::test_engine_classify_shapes_and_consistency",
    "test_native.py",                               # C++ loader extension
    "test_resnet_parity.py::test_classifier_parity",  # torch parity anchor
    "test_dataset_tool.py::test_zip_roundtrip_dataset",
    "test_utils_misc.py",                           # jsonl/maths/images utils
    "test_dp_scaling.py::test_scaling_arithmetic_clears_north_star",  # DP math
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        file = os.path.basename(item.fspath)
        base = item.nodeid.split("::", 1)
        test = f"{file}::{item.originalname}" if len(base) > 1 else file
        if file in SMOKE or test in SMOKE:
            item.add_marker(pytest.mark.smoke)
            matched.add(file if file in SMOKE else test)
    missing = SMOKE - matched
    # Only enforce completeness on whole-directory runs; selecting single
    # files/nodes legitimately collects a subset.
    full_run = all(os.path.isdir(a) for a in config.args) if config.args \
        else True
    if missing and items and full_run:
        raise pytest.UsageError(
            f"smoke tier references unknown tests: {sorted(missing)}")
