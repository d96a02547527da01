"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): XLA's host platform exposes N fake devices, so pjit/sharding
paths compile and execute exactly as they would across chips.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_configs_dir():
    """The read-only reference configs, used to verify the compatibility
    contract. Skip the dependent tests when unavailable."""
    path = "/root/reference/configs"
    if not os.path.isdir(path):
        pytest.skip("reference configs not available")
    return path
