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
