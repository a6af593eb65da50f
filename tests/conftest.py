"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's multi-process-on-one-host distributed test
pattern (reference apex/tests/distributed/DDP/run_race_test.sh) the
TPU-native way: XLA host-platform device virtualization."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote TPU platform
# regardless of JAX_PLATFORMS; pin the backend explicitly so tests
# compile locally on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
