"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): XLA's host platform exposes N fake devices, so pjit/sharding
paths compile and execute exactly as they would across chips.
"""

import os
import sys

# Force the CPU backend for the whole suite (the environment may preset
# JAX_PLATFORMS to a TPU plugin); override with VCD_TEST_PLATFORM to run
# the suite against real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("VCD_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_configs_dir():
    """The read-only reference configs, used to verify the compatibility
    contract. Skip the dependent tests when unavailable."""
    path = "/root/reference/configs"
    if not os.path.isdir(path):
        pytest.skip("reference configs not available")
    return path
