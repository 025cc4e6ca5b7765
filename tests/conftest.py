"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip hardware is not available in CI; sharding tests use the standard
mesh-on-CPU trick (XLA_FLAGS=--xla_force_host_platform_device_count=8).
Must be set before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_eval_dir():
    """Path to the reference repo's committed eval artifacts (golden data)."""
    path = os.path.join(REFERENCE_DIR, "eval")
    if not os.path.isdir(path):
        pytest.skip("reference eval artifacts not available")
    return path
