"""Test env: force an 8-device virtual CPU mesh before jax initializes.

The reference has no test suite at all (SURVEY §4); multi-device paths were only
exercisable on a SLURM cluster.  Here every test runs on
XLA_FLAGS=--xla_force_host_platform_device_count=8 so sharding/collective code is
CI-testable on one host.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the box presets axon/TPU and a
# sitecustomize overrides the env var); jax.config.update below is what actually
# bites.  Set TAN_TEST_PLATFORM=axon to run the suite on real hardware instead.
_PLATFORM = os.environ.get("TAN_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", _PLATFORM)

# Persistent compile cache: the suite re-jits many tiny programs; this cuts repeat
# runs from minutes to seconds on the 1-core CI host.
jax.config.update("jax_compilation_cache_dir", "/tmp/tan_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if _PLATFORM != "cpu":
    # hardware runs: f32 matmuls otherwise lower to multi-pass bf16 whose
    # accumulation order breaks the 1e-5-level torch-parity tolerances
    jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
